from . import (hard_disks, heisenberg, ising, ising2d, lennard_jones,
               particle1d, polydisperse, potts, tfim, xy)

__all__ = ["hard_disks", "heisenberg", "ising", "ising2d", "lennard_jones",
           "particle1d", "polydisperse", "potts", "tfim", "xy"]
