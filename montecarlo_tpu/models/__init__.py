from . import ising, lennard_jones, particle1d

__all__ = ["ising", "lennard_jones", "particle1d"]
