"""Swap Monte Carlo for a polydisperse glass-former.

Continuously polydisperse soft spheres at low temperature: diameter-swap
moves (Ninarello-Berthier-Coslovich) reach lower-energy equilibrated states
far faster than displacement-only dynamics.  Prints the energy relaxation
of both protocols from the same initial configuration.

Run:  python examples/swap_mc_glass.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc
from montecarlo_tpu.models import polydisperse as poly

N, CHAINS, RHO, BETA, STEPS = 64, 32, 1.0, 5.0, 400

p = poly.PolyParams()
times = mc.build_schedule(STEPS, 0, 20)
results = {}
for label, swap in (("displacement only", False), ("with swap", True)):
    chains = poly.init_chains(CHAINS, N, rho=RHO, beta=BETA, seed=5,
                              params=p)
    if swap:
        pool = (poly.displacement_move(0.08, weight=0.8, params=p),
                poly.swap_move(weight=0.2, params=p))
    else:
        pool = (poly.displacement_move(0.08, weight=1.0, params=p),)
    sim = mc.Simulation(
        poly.make_system(p), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, sweepstep=N, seed=11),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(poly.callback_energy_per_particle,),
              scheduler=times)],
        STEPS, path=f"data/swap_glass/{swap}")
    sim.run()
    e = np.loadtxt(f"data/swap_glass/{swap}/energy_per_particle.dat")
    results[label] = e

print(f"polydisperse soft spheres: N={N}, rho={RHO}, beta={BETA}")
print(f"{'t (sweeps)':>11} {'e/N (disp only)':>16} {'e/N (swap)':>11}")
a, b = results["displacement only"], results["with swap"]
for k in range(0, len(a), max(1, len(a) // 10)):
    print(f"{int(a[k, 0]):>11} {a[k, 1]:>16.4f} {b[k, 1]:>11.4f}")
print(f"\nfinal: disp-only {a[-1, 1]:.4f}  vs  swap {b[-1, 1]:.4f} "
      "(swap equilibrates to the lower plateau first)")
