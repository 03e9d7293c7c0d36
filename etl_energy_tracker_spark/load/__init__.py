from .loader import DataLakeLoader

__all__ = ["DataLakeLoader"]
