from . import ising, ising2d, lennard_jones, particle1d, potts, xy

__all__ = ["ising", "ising2d", "lennard_jones", "particle1d", "potts", "xy"]
