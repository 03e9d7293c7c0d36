from . import curtailments, esios, i3, i90, omie  # noqa: F401

__all__ = ["curtailments", "esios", "i3", "i90", "omie"]
