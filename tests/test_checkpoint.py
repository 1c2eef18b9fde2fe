"""Checkpoint/resume tests — the upgrade over the reference's write-only
backups (SURVEY §5: "there is no loader").

The counter-based PRNG (fold_in t) makes resume *bitwise exact*: a run
interrupted at t=k and resumed from the checkpoint must produce the same
final state as the uninterrupted run.
"""

import glob
import os

import jax
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d


def _algos(pool, steps, times, backup_times=None):
    algos = [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=mc.StoreCallbacks, callbacks=(p1d.callback_energy,),
             scheduler=times),
    ]
    if backup_times is not None:
        algos.append(dict(algorithm=mc.StoreBackups, scheduler=backup_times))
    return algos


def test_roundtrip_save_restore(tmp_path):
    system = p1d.make_system()
    chains = p1d.init_chains(8, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    sim = mc.Simulation(system, chains,
                        [dict(algorithm=mc.Metropolis, pool=pool, seed=42)],
                        10, path=str(tmp_path / "rt"))
    ds = sim.init_device_state()
    path = str(tmp_path / "state.npz")
    mc.checkpoint.save(path, ds)
    restored = mc.checkpoint.restore(path, sim.init_device_state())
    for a, b in zip(jax.tree_util.tree_leaves(ds),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(jax.random.key_data(a))
                                      if "key" in str(a.dtype)
                                      else np.asarray(a),
                                      np.asarray(jax.random.key_data(b))
                                      if "key" in str(b.dtype)
                                      else np.asarray(b))


def test_resume_bitwise_equals_uninterrupted(tmp_path):
    system = p1d.make_system()
    chains = p1d.init_chains(16, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 100
    times = mc.build_schedule(steps, 10, 10)

    # uninterrupted reference run
    p_ref = str(tmp_path / "ref")
    sim_ref = mc.Simulation(system, chains,
                            _algos(pool, steps, times), steps, path=p_ref)
    sim_ref.run()
    x_ref = np.asarray(sim_ref.device_state["sys"].x)

    # interrupted run: backup at t=50, then a fresh Simulation resumes
    p_a = str(tmp_path / "a")
    sim_a = mc.Simulation(
        system, chains,
        _algos(pool, steps, times, backup_times=np.asarray([50])),
        steps, path=p_a)
    # stop at 50 by only scheduling up to there: emulate interruption by
    # running the full thing but resuming from the t=50 checkpoint anyway
    sim_a.run()
    ckpt = os.path.join(p_a, "checkpoints", "ckpt_t50.npz")
    assert os.path.exists(ckpt)

    p_b = str(tmp_path / "b")
    sim_b = mc.Simulation(system, chains, _algos(pool, steps, times),
                          steps, path=p_b)
    mc.checkpoint.resume_state(sim_b, ckpt)
    assert sim_b.t == 50
    sim_b.run()
    x_res = np.asarray(sim_b.device_state["sys"].x)
    np.testing.assert_array_equal(x_ref, x_res)

    # resumed energy file contains exactly the post-resume schedule rows
    E = np.loadtxt(os.path.join(p_b, "energy.dat"))
    assert E[0, 0] > 50
    E_ref = np.loadtxt(os.path.join(p_ref, "energy.dat"))
    tail_ref = E_ref[E_ref[:, 0] > 50]
    np.testing.assert_allclose(tail_ref, E, rtol=1e-6)


def test_restart_text_files_written(tmp_path):
    system = p1d.make_system()
    chains = p1d.init_chains(4, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 40
    path = str(tmp_path / "bk")
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=mc.StoreBackups, scheduler=np.asarray([20, 40]),
             store_first=True),
    ], steps, path=path)
    sim.run()
    for c in range(1, 5):
        d = os.path.join(path, "trajectories", str(c))
        for t in (0, 20, 40):
            f = os.path.join(d, f"restart_t{t}.dat")
            assert os.path.exists(f), f
            tt, x = system.parse_frame(open(f).read().strip())
            assert tt == t
    assert len(glob.glob(os.path.join(path, "checkpoints", "*.npz"))) == 3
