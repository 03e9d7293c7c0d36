from .inspect import (
    assert_no_shuffle,
    assert_pushed_filters,
    count_joins,
    plan_string,
    plan_summary,
)

__all__ = [
    "assert_no_shuffle",
    "assert_pushed_filters",
    "count_joins",
    "plan_string",
    "plan_summary",
]
