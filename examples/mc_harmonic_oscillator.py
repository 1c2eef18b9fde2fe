"""Metropolis sampling of a 1-D harmonic oscillator.

Python analogue of the reference example
``example/particle_1d/harmonic_oscillator/MC_harmonic_oscillator.jl``:
M chains, Gaussian displacement move, energy/acceptance callbacks, trajectory
recording, backups, progress bar — then a check of the sampled moments
against the analytic target (mean 0, std 1/sqrt(2*beta)).
"""

import glob
import os

import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d


def main():
    seed = 42
    beta = 2.0
    M = 10
    steps = 10 ** 5
    burn = 1000
    sampletimes = mc.build_schedule(steps, burn, [0, 10])
    path = f"data/MC/particle_1d/Harmonic/beta{beta}/M{M}/seed{seed}"

    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(M, beta=beta, seed=seed)
    pool = (p1d.displacement_move(sigma=0.1, weight=1.0),)

    algorithm_list = [
        dict(algorithm=mc.Metropolis, pool=pool, seed=seed),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(p1d.callback_energy, mc.callback_acceptance),
             scheduler=sampletimes),
        dict(algorithm=mc.StoreTrajectories, scheduler=sampletimes),
        dict(algorithm=mc.StoreBackups,
             scheduler=mc.build_schedule(steps, burn, steps // 10),
             store_first=True, store_last=True),
        dict(algorithm=mc.StoreLastFrames, scheduler=np.asarray([steps])),
        dict(algorithm=mc.PrintTimeSteps,
             scheduler=mc.build_schedule(steps, burn, steps // 10)),
    ]
    sim = mc.Simulation(system, chains, algorithm_list, steps, path=path,
                        verbose=True)
    sim.run()

    energies = np.loadtxt(os.path.join(path, "energy.dat"))[:, 1]
    print(f"\nenergy mean={energies.mean():.4f} std={energies.std():.4f} "
          f"(expect ~{1 / (2 * beta):.4f})")
    trj = [np.loadtxt(f)[:, 1] for f in glob.glob(
        os.path.join(path, "trajectories", "*", "trajectory.dat"))]
    pos = np.concatenate(trj)
    print(f"position mean={pos.mean():.4f} std={pos.std():.4f} "
          f"(expect 0, {1 / np.sqrt(2 * beta):.4f})")


if __name__ == "__main__":
    main()
