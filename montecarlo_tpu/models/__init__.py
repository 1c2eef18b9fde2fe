from . import lennard_jones, particle1d

__all__ = ["lennard_jones", "particle1d"]
