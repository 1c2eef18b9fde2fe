from . import ising, ising2d, lennard_jones, particle1d, potts

__all__ = ["ising", "ising2d", "lennard_jones", "particle1d", "potts"]
