"""Large-N Lennard-Jones via checkerboard cell-list MC.

Beyond N ~ 2000 particles the O(N)-row kernels stop paying; the engine
switches to checkerboard cell-list MC (``ops/cell_mc.py``): 4-colored cells,
one uniformly-picked occupant of every same-color cell moves simultaneously
(~N/8 parallel moves per substep), each move touching only its 3x3 cell
neighbourhood.  ``Metropolis(fused='auto')`` selects this automatically for
single-displacement pools at N >= 2048; this script runs N = 4096 (a
ParticlesMC-scale system) and validates the energy cache against a full
recompute.

Run:  python examples/cell_mc_large_n.py [n_particles] [n_chains]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
M = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STEPS = 40
PARAMS = lj.LJParams()


def main():
    chains = lj.init_chains(M, N, rho=1.2, beta=1.0 / 0.45, frac_b=0.2,
                            seed=42, params=PARAMS)
    pool = (lj.lj_displacement_move(0.08, params=PARAMS),)
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=7,
              sweepstep=N // 4),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(lj.callback_energy_per_particle,),
              scheduler=np.arange(5, STEPS + 1, 5))],
        STEPS, path="data/cell_mc_large_n", verbose=True)
    met = sim.device_algos[0]
    print(f"N={N}, chains={M}: cell path selected = {met._use_cell} "
          f"(plan: {met._cell_plan!r})")
    sim.run()

    slc = sim.device_state["metropolis"]
    cnt = np.asarray(slc["counters"])
    print(f"attempts/chain: {cnt[0, 0, 1]}, acceptance: "
          f"{cnt[:, 0, 0].sum() / cnt[:, 0, 1].sum():.3f}, "
          f"capacity overflow: {bool(np.asarray(slc['cell_overflow']))}")

    st = sim.device_state["sys"]
    st4 = jax.tree_util.tree_map(lambda a: a[:4], st)
    e_true = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS, row_batch=256), st4))
    err = np.abs((np.asarray(st.energy)[:4] - e_true)
                 / e_true).max()
    print(f"energy cache vs full recompute (4 chains): rel err {err:.2e}")


if __name__ == "__main__":
    main()
