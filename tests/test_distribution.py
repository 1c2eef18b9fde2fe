"""Statistical end-to-end test of the sampler — tier 1 of the reference test
strategy (``test/distribution_test.jl``): run the full stack (Metropolis +
recorders), read the trajectory files back from disk, and match posterior
moments against the analytic target (mean 0, std 1/sqrt(2*beta)).

The default config is scaled for CI speed (larger proposal sigma for faster
mixing, fewer sweeps, wider-but-still-strict tolerances).  Set
``MCTPU_FULL=1`` to run the exact reference config (M=100, 10^6 sweeps,
sigma=0.1, atol 1e-3).
"""

import glob
import os

import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d

FULL = os.environ.get("MCTPU_FULL", "0") == "1"


@pytest.mark.parametrize("beta", [2.0, 2.5, 3.0])
def test_harmonic_distribution(tmp_path, beta):
    seed = 42
    M = 100
    if FULL:
        steps, burn, sigma, atol = 10 ** 6, 1000, 0.1, 1e-3
    else:
        steps, burn, sigma, atol = 3 * 10 ** 4, 1000, 0.5, 5e-3
    sampletimes = mc.build_schedule(steps, burn, [0, 10])
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(M, beta=beta, seed=seed)
    pool = (p1d.displacement_move(sigma=sigma, weight=1.0),)
    path = str(tmp_path / f"beta{beta}")
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
    ]
    sim = mc.Simulation(system, chains, algorithm_list, steps, path=path)
    sim.run()

    trj_files = sorted(glob.glob(os.path.join(path, "trajectories", "*",
                                              "trajectory.dat")))
    assert len(trj_files) == M
    positions = np.concatenate(
        [np.loadtxt(f)[1:, 1] for f in trj_files])  # drop t=0 row
    mu, sig = positions.mean(), positions.std()
    assert abs(mu - 0.0) < 4 * atol
    assert abs(sig - 1.0 / np.sqrt(2.0 * beta)) < 4 * atol

    # energy callback consistent with equipartition <E> = 1/(2 beta)
    E = np.loadtxt(os.path.join(path, "energy.dat"))
    tail = E[E[:, 0] >= burn, 1]
    assert abs(tail.mean() - 1.0 / (2.0 * beta)) < 2e-2

    # acceptance rate recorded and sane
    A = np.loadtxt(os.path.join(path, "acceptance.dat"))
    assert 0.05 < A[-1, 1] < 0.99

    # last frames written and parse back
    lf = sorted(glob.glob(os.path.join(path, "trajectories", "*",
                                       "lastframe.dat")))
    assert len(lf) == M
    t, x = system.parse_frame(open(lf[0]).read().strip())
    assert t == steps


def test_double_well_distribution_shape(tmp_path):
    """Beyond moments: the sampled histogram must match the exact
    (numerically normalised) double-well density in total variation."""
    beta = 1.5
    M, steps, burn = 200, 2 * 10 ** 4, 2000
    system = p1d.make_system(p1d.double_well)
    chains = p1d.init_chains(M, beta=beta, seed=7, potential=p1d.double_well)
    pool = (p1d.displacement_move(sigma=0.8, potential=p1d.double_well),)
    times = mc.build_schedule(steps, burn, 10)
    path = str(tmp_path / "dw")
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=7),
        dict(algorithm=mc.StoreTrajectories, scheduler=times),
    ], steps, path=path)
    sim.run()
    pos = np.concatenate([
        np.loadtxt(f)[1:, 1] for f in glob.glob(
            os.path.join(path, "trajectories", "*", "trajectory.dat"))])

    edges = np.linspace(-3.0, 3.0, 61)
    hist, _ = np.histogram(pos, bins=edges, density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    target = np.exp(-beta * np.asarray(
        [p1d.double_well(x) for x in centers]))
    target /= np.trapezoid(target, centers)
    width = edges[1] - edges[0]
    tv = 0.5 * np.sum(np.abs(hist - target)) * width
    assert tv < 0.03, f"total variation {tv}"
    # both wells populated symmetrically-ish
    frac_right = (pos > 0).mean()
    assert 0.4 < frac_right < 0.6
