"""2-process multi-host test over CPU gloo collectives — SURVEY §4's
"multi-host tests the reference lacks".

Spawns two worker processes forming a 4-device global mesh (2 local devices
each), runs the full recorder stack with chains sharded across processes,
and checks the files written by process 0 against a single-process run of
the identical configuration.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_run_matches_single(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, "-u", worker, str(pid), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        if p.returncode != 0 and any(
                s in out for s in ("jax_cpu_collectives",
                                   "collectives_implementation",
                                   "distributed.initialize")):
            if os.environ.get("MCTPU_REQUIRE_MULTIHOST"):
                # CI sets this: where gloo collectives are EXPECTED to
                # exist, unavailability is a failure, not a skip
                # (VERDICT r4 item 9: the 2-process tier must provably run)
                pytest.fail(f"multi-process CPU collectives unavailable "
                            f"but MCTPU_REQUIRE_MULTIHOST is set: "
                            f"{out[-300:]}")
            pytest.skip(f"multi-process CPU collectives unavailable: "
                        f"{out[-300:]}")
        assert p.returncode == 0, out[-3000:]

    # single-process reference run with the exact same config (no mesh)
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(8, beta=2.0, seed=42)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 60
    times = mc.build_schedule(steps, 10, 10)
    ref_path = str(tmp_path / "single")
    mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(p1d.callback_energy, mc.callback_acceptance),
             scheduler=times),
        dict(algorithm=mc.StoreTrajectories, scheduler=times),
        dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
             scheduler=times),
    ], steps, path=ref_path).run()

    e_multi = np.loadtxt(str(tmp_path / "multi" / "energy.dat"))
    e_single = np.loadtxt(os.path.join(ref_path, "energy.dat"))
    np.testing.assert_allclose(e_multi, e_single, rtol=1e-5)

    # trajectories identical chain by chain (counter-based RNG)
    for c in range(1, 9):
        tm = np.loadtxt(str(tmp_path / "multi" / "trajectories" / str(c)
                            / "trajectory.dat"))
        ts = np.loadtxt(os.path.join(ref_path, "trajectories", str(c),
                                     "trajectory.dat"))
        np.testing.assert_allclose(tm, ts, rtol=1e-6)

    # checkpoint written once by process 0
    assert os.path.exists(str(tmp_path / "multi" / "checkpoints"
                              / "ckpt_t30.npz"))

    # StoreParameters: single writer — file contents match the
    # single-process run exactly (two racing writers would duplicate lines)
    pm = (tmp_path / "multi" / "parameters" / "1"
          / "parameters.dat").read_text()
    ps = open(os.path.join(ref_path, "parameters", "1",
                           "parameters.dat")).read()
    assert pm == ps
    n_events = len(times) + 1  # store_first
    assert len(pm.strip().splitlines()) == n_events

    # Throughput: written once, one line per firing interval (minus warmup)
    th = np.loadtxt(str(tmp_path / "multi" / "throughput.dat"), ndmin=2)
    assert 1 <= th.shape[0] <= len(times)
    assert np.all(th[:, 1] > 0)
