from .stable import stable_avg, stable_sum, stable_sum_expr

__all__ = ["stable_avg", "stable_sum", "stable_sum_expr"]
