from . import particle1d

__all__ = ["particle1d"]
