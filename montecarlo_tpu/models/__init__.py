from . import (heisenberg, ising, ising2d, lennard_jones, particle1d, potts,
               xy)

__all__ = ["heisenberg", "ising", "ising2d", "lennard_jones", "particle1d",
           "potts", "xy"]
