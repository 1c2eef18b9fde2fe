"""2-D Ising sweep across the phase transition with checkerboard Metropolis.

Runs a temperature scan around the critical point (beta_c = ln(1+sqrt(2))/2
~ 0.4407) on a 64x64 periodic lattice, printing energy per spin and |m| —
the magnetisation curve shows the order-disorder transition.  Each simulation
step is a whole-lattice bipartite sweep: 4096 Metropolis attempts fused into
a few (chains, 64, 64) vector ops.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc  # noqa: E402
from montecarlo_tpu.models import ising2d  # noqa: E402

L, CHAINS, STEPS, BURN = 64, 64, 3000, 1000


def main():
    print(f"{'beta':>6} {'e/spin':>8} {'|m|':>6}   (L={L}, {CHAINS} chains)")
    for beta in (0.30, 0.38, 0.42, 0.4407, 0.46, 0.55):
        chains = ising2d.init_chains(CHAINS, L, beta=beta, seed=42)
        sched = mc.build_schedule(STEPS, BURN, 10)
        sim = mc.Simulation(
            ising2d.make_system(), chains,
            [dict(algorithm=ising2d.CheckerboardMetropolis, seed=42),
             dict(algorithm=mc.StoreCallbacks,
                  callbacks=[ising2d.callback_energy_per_spin,
                             ising2d.callback_magnetisation],
                  scheduler=sched)],
            STEPS, path=f"data/ising2d_b{beta}")
        sim.run()
        e = np.loadtxt(f"data/ising2d_b{beta}/energy_per_spin.dat")[:, 1]
        m = np.loadtxt(f"data/ising2d_b{beta}/magnetisation.dat")[:, 1]
        print(f"{beta:6.4f} {e.mean():8.4f} {m.mean():6.3f}")


if __name__ == "__main__":
    main()
