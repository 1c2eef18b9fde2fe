"""Parallel tempering on the double well.

At beta = 6 a single-temperature walker with local displacement moves gets
trapped in one well of U(x) = (x^2 - 1)^2 for a long time (the barrier costs
exp(beta * h) ~ e^6 attempts).  Replica exchange against hotter replicas
restores mixing: configurations diffuse up the ladder, hop wells cheaply at
high temperature, and come back down.

This script runs the same cold ensemble with and without exchange and prints
the well-hop count per chain and both well occupancies — with exchange the
cold replicas split ~50/50 between wells; without, they stay where they
started.  (Capability beyond the reference: Arianna.jl's chains never
interact, ``src/metropolis.jl:302-309``.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc  # noqa: E402
from montecarlo_tpu.models import particle1d as p1d  # noqa: E402

BETAS = [0.5, 1.0, 2.0, 6.0]   # replica 3 (coldest) is the one we care about
N_LADDERS = 128
STEPS = 20_000


def run(with_exchange: bool, path: str):
    T = len(BETAS)
    betas = mc.tile_ladder(BETAS, N_LADDERS)
    chains = p1d.init_chains(T * N_LADDERS, beta=betas, seed=42,
                             potential=p1d.double_well)
    algos = [dict(algorithm=mc.Metropolis,
                  pool=(p1d.displacement_move(sigma=0.3),), seed=42)]
    if with_exchange:
        algos.append(dict(algorithm=mc.ReplicaExchange, n_temps=T, seed=7,
                          scheduler=mc.build_schedule(STEPS, 0, 10)))
    algos.append(dict(algorithm=mc.StoreTrajectories,
                      scheduler=mc.build_schedule(STEPS, 0, 100)))
    sim = mc.Simulation(p1d.make_system(p1d.double_well), chains, algos,
                        STEPS, path=path)
    sim.run()

    # coldest replicas are chains T-1, 2T-1, ...
    cold = range(T - 1, T * N_LADDERS, T)
    hops, frac_right = [], []
    for c in cold:
        xs = np.loadtxt(os.path.join(path, "trajectories", str(c + 1),
                                     "trajectory.dat"))[:, 1]
        side = np.sign(xs[np.abs(xs) > 0.3])
        hops.append(int(np.sum(side[1:] != side[:-1])))
        frac_right.append(float(np.mean(xs > 0)))
    return np.mean(hops), np.mean(frac_right), np.std(frac_right)


def main():
    for label, flag, path in (("without exchange", False, "data/pt_off"),
                              ("with exchange", True, "data/pt_on")):
        hops, frac, spread = run(flag, path)
        print(f"{label:>18}: well hops/chain = {hops:6.1f}, "
              f"P(x>0) = {frac:.3f} +- {spread:.3f}")


if __name__ == "__main__":
    main()
