"""2-D Lennard-Jones mixture: displacement + swap pool, sharded chains.

BASELINE.json configs 4-5: a ParticlesMC-style particle system on the same
engine — local displacement moves with O(N) incremental delta-energies, a
species-swap move for the binary mixture, optional PGMC adaptation of the
displacement width, and chains sharded across all available devices.
"""

import os

import numpy as np

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc
from montecarlo_tpu import policy_guided as pg
from montecarlo_tpu.models import lennard_jones as lj
from montecarlo_tpu.parallel import make_mesh


def main(n_chains=64, n_particles=256, rho=0.7, beta=1.0, steps=2000,
         use_mesh=False, pgmc=True):
    seed = 42
    params = lj.LJParams()
    system = lj.make_system(params)
    chains = lj.init_chains(n_chains, n_particles, rho, beta, frac_b=0.2,
                            seed=seed, params=params)
    pool = (
        lj.lj_displacement_move(sigma=0.1, weight=0.8, params=params),
        lj.lj_swap_move(weight=0.2, params=params),
    )
    burn = steps // 10
    sampletimes = mc.build_schedule(steps, burn, [0, 10])
    path = f"data/LJ2D/N{n_particles}/rho{rho}/beta{beta}/M{n_chains}"

    algorithm_list = [
        # sweepstep=N: one "sweep" attempts N moves, like particle MC usage
        dict(algorithm=mc.Metropolis, pool=pool, seed=seed,
             sweepstep=n_particles),
    ]
    if pgmc:
        algorithm_list += [
            dict(algorithm=pg.PolicyGradientEstimator,
                 dependencies=(mc.Metropolis,),
                 optimisers=(pg.VPG(1e-4), pg.Static()), q_batch_size=4),
            dict(algorithm=pg.PolicyGradientUpdate,
                 dependencies=(pg.PolicyGradientEstimator,),
                 scheduler=mc.build_schedule(steps, burn, 2)),
            dict(algorithm=mc.StoreParameters,
                 dependencies=(mc.Metropolis,), scheduler=sampletimes),
        ]
    algorithm_list += [
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(lj.callback_energy_per_particle,
                        mc.callback_acceptance),
             scheduler=sampletimes),
        dict(algorithm=mc.StoreLastFrames, scheduler=np.asarray([steps])),
    ]
    mesh = make_mesh() if use_mesh else None
    sim = mc.Simulation(system, chains, algorithm_list, steps, path=path,
                        verbose=True, mesh=mesh)
    sim.run()

    E = np.loadtxt(os.path.join(path, "energy_per_particle.dat"))
    print(f"\nenergy/particle: start {E[0, 1]:.4f} -> end {E[-1, 1]:.4f}")
    A = np.loadtxt(os.path.join(path, "acceptance.dat"))
    print(f"acceptance: {A[-1, 1]:.3f}")


if __name__ == "__main__":
    main()
