from . import esios_source, i90_source, omie_source  # noqa: F401

__all__ = ["esios_source", "i90_source", "omie_source"]
