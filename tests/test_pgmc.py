"""PGMC convergence test — tier 2 of the reference strategy
(``test/pgmc_test.jl``): seven displacement moves sharing sigma0=0.2, one
optimiser of each type; every non-Static optimiser must drive sigma toward the
optimal ~1.2 (at beta=2) while Static stays exactly sigma0, and the mean
energy must satisfy equipartition 0.25 +- 5e-2.

Default config is scaled down for CI; ``MCTPU_FULL=1`` runs the reference
scale (10^5 sweeps).
"""

import os

import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu import policy_guided as pg
from montecarlo_tpu.models import particle1d as p1d

FULL = os.environ.get("MCTPU_FULL", "0") == "1"


def test_displacement_optimisation(tmp_path):
    seed = 42
    beta = 2.0
    M = 10
    sigma0 = 0.2
    steps = 10 ** 5 if FULL else 4 * 10 ** 4
    burn = 1000
    sampletimes = mc.build_schedule(steps, burn, [0, 10])
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(M, beta=beta, seed=seed)
    weights = [0.4] + [0.1] * 6
    pool = tuple(p1d.displacement_move(sigma=sigma0, weight=w)
                 for w in weights)
    optimisers = (pg.Static(), pg.VPG(0.001), pg.BLPG(0.001),
                  pg.BLAPG(1e-6, 1e-6), pg.NPG(1e-2, 1e-6),
                  pg.ANPG(1e-6, 1e-6), pg.BLANPG(1e-6, 1e-6))
    path = str(tmp_path / "pgmc")
    algorithm_list = [
        dict(algorithm=mc.Metropolis, pool=pool, seed=seed),
        dict(algorithm=pg.PolicyGradientEstimator,
             dependencies=(mc.Metropolis,), optimisers=optimisers,
             q_batch_size=10),
        dict(algorithm=pg.PolicyGradientUpdate,
             dependencies=(pg.PolicyGradientEstimator,),
             scheduler=mc.build_schedule(steps, burn, 2)),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(p1d.callback_energy, mc.callback_acceptance),
             scheduler=sampletimes),
        dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
             scheduler=sampletimes),
        dict(algorithm=mc.StoreLastFrames, scheduler=np.asarray([steps])),
    ]
    sim = mc.Simulation(system, chains, algorithm_list, steps, path=path)
    sim.run()

    energies = np.loadtxt(os.path.join(path, "energy.dat"))[:, 1]
    assert abs(energies.mean() - 0.25) < 5e-2

    sigma_tol = 2e-1 if FULL else 3e-1
    for k, opt in enumerate(optimisers):
        lines = open(os.path.join(path, "parameters", str(k + 1),
                                  "parameters.dat")).read().strip().split("\n")
        sigma_last = float(lines[-1].split(" ", 1)[1].strip("[]"))
        if isinstance(opt, pg.Static):
            assert sigma_last == np.float32(sigma0)
        else:
            assert abs(sigma_last - 1.2) < sigma_tol, (
                f"optimiser {type(opt).__name__}: sigma={sigma_last}")
