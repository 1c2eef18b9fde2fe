from . import analysis, observability

__all__ = ["analysis", "observability"]
