"""Recorder/IO layout tests: the on-disk tree must match the reference
(``energy.dat``, ``trajectories/<c>/trajectory.dat``, ``parameters/<k>/...``,
``summary.log`` — SURVEY §5 "Metrics / logging")."""

import os

import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d


def _sim(tmp_path, **kw):
    system = p1d.make_system()
    chains = p1d.init_chains(3, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 50
    times = mc.build_schedule(steps, 10, 10)
    algos = [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(p1d.callback_energy, mc.callback_acceptance),
             scheduler=times, **kw.get("cb", {})),
        dict(algorithm=mc.StoreTrajectories, scheduler=times),
        dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
             scheduler=times),
        dict(algorithm=mc.StoreLastFrames, scheduler=np.asarray([steps])),
        dict(algorithm=mc.PrintTimeSteps,
             scheduler=mc.build_schedule(steps, 0, 25)),
    ]
    sim = mc.Simulation(system, chains, algos, steps,
                        path=str(tmp_path / "run"))
    sim.run()
    return sim, str(tmp_path / "run")


def test_layout_matches_reference(tmp_path):
    sim, path = _sim(tmp_path)
    assert os.path.exists(os.path.join(path, "energy.dat"))
    assert os.path.exists(os.path.join(path, "acceptance.dat"))
    for c in (1, 2, 3):
        assert os.path.exists(
            os.path.join(path, "trajectories", str(c), "trajectory.dat"))
        assert os.path.exists(
            os.path.join(path, "trajectories", str(c), "lastframe.dat"))
    assert os.path.exists(
        os.path.join(path, "parameters", "1", "parameters.dat"))
    log = open(os.path.join(path, "summary.log")).read()
    assert "SIMULATION SUMMARY" in log
    assert "Number of chains: 3" in log
    assert "Metropolis" in log
    assert "Status: Completed" in log


def test_store_first_flag(tmp_path):
    _, path = _sim(tmp_path)
    E = np.loadtxt(os.path.join(path, "energy.dat"))
    assert E[0, 0] == 0  # store_first default True -> t=0 row
    times = mc.build_schedule(50, 10, 10)
    assert E.shape[0] == len(times) + 1


def test_trajectory_format_roundtrip(tmp_path):
    sim, path = _sim(tmp_path)
    system = sim.system
    lines = open(os.path.join(
        path, "trajectories", "1", "trajectory.dat")).read().strip().split("\n")
    ts = []
    for ln in lines:
        t, x = system.parse_frame(ln)
        ts.append(t)
        assert np.isfinite(x)
    assert ts == [0] + list(mc.build_schedule(50, 10, 10))


def test_acceptance_callback_value(tmp_path):
    _, path = _sim(tmp_path)
    A = np.loadtxt(os.path.join(path, "acceptance.dat"))
    # t=0 row is 0/0 -> nan (matches reference Julia NaN); later rows finite
    assert np.isnan(A[0, 1])
    assert np.all(np.isfinite(A[1:, 1]))
    assert np.all((A[1:, 1] > 0) & (A[1:, 1] <= 1))


def test_observable_buffering_consistency(tmp_path):
    """Dense uniform schedule (buffered scan path) and sparse irregular
    schedule (per-event path) must record identical values at shared times."""
    system = p1d.make_system()
    chains = p1d.init_chains(4, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 200

    dense = mc.build_schedule(steps, 0, 1)  # every step -> buffered
    sparse = np.asarray([7, 30, 100, 150, 177])  # irregular -> per-event

    outs = {}
    for name, sched in (("dense", dense), ("sparse", sparse)):
        p = str(tmp_path / name)
        sim = mc.Simulation(system, chains, [
            dict(algorithm=mc.Metropolis, pool=pool, seed=42),
            dict(algorithm=mc.StoreCallbacks,
                 callbacks=(p1d.callback_energy,), scheduler=sched),
        ], steps, path=p)
        sim.run()
        E = np.loadtxt(os.path.join(p, "energy.dat"))
        outs[name] = dict(zip(E[:, 0].astype(int), E[:, 1]))
    for t in sparse:
        np.testing.assert_allclose(outs["dense"][t], outs["sparse"][t],
                                   rtol=1e-6)


def test_txt_format(tmp_path):
    system = p1d.make_system()
    chains = p1d.init_chains(2, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool),
        dict(algorithm=mc.StoreTrajectories, fmt=mc.TXT(),
             scheduler=np.asarray([5, 10])),
    ], 10, path=str(tmp_path / "txt"))
    sim.run()
    assert os.path.exists(
        str(tmp_path / "txt" / "trajectories" / "1" / "trajectory.txt"))
