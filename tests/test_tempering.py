"""Replica exchange: detailed balance + ladder connectivity.

A swap move that violated detailed balance would skew every replica's
marginal, so the sharpest statistical check is that each temperature's
posterior moments stay exactly at their analytic values *while swaps are
accepted at a healthy rate* (harmonic oscillator: Var x = 1/(2 beta),
matching the reference's moment criterion, ``test/distribution_test.jl:31-37``).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d

BETAS = [0.5, 1.0, 2.0, 4.0]
N_LADDERS = 64


def _make_var_callback(k, n_temps):
    def cb(view):
        return jnp.mean(view.sys.x[k::n_temps] ** 2)
    cb.__name__ = f"callback_var{k}"
    return cb


def test_replica_exchange_preserves_marginals(tmp_path):
    T = len(BETAS)
    betas = mc.tile_ladder(BETAS, N_LADDERS)
    chains = p1d.init_chains(T * N_LADDERS, beta=betas, seed=42)
    steps, burn = 4000, 1000
    sim = mc.Simulation(
        p1d.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(p1d.displacement_move(sigma=1.0),), seed=42),
         dict(algorithm=mc.ReplicaExchange, n_temps=T, seed=5,
              scheduler=mc.build_schedule(steps, 0, 2)),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[_make_var_callback(k, T) for k in range(T)]
              + [mc.callback_swap_rate],
              scheduler=mc.build_schedule(steps, burn, 1))],
        steps, path=str(tmp_path))
    sim.run()

    for k, beta in enumerate(BETAS):
        var = np.loadtxt(tmp_path / f"var{k}.dat")[:, 1].mean()
        assert abs(var - 1 / (2 * beta)) < 0.08 / (2 * beta), (k, beta, var)

    # ladder connectivity: every neighbouring pair attempted and accepted
    counters = np.asarray(
        sim.device_state["replica_exchange"]["counters"])
    assert counters.shape == (T - 1, 2)
    # 2000 swap calls alternate parity, so each of the 3 ladder links is
    # attempted on exactly 1000 calls, once per ladder
    np.testing.assert_array_equal(counters[:, 1], 1000 * N_LADDERS)
    rate = counters[:, 0] / counters[:, 1]
    assert np.all(rate > 0.05) and np.all(rate < 0.999), rate
    # swap rate callback wrote sane values
    sw = np.loadtxt(tmp_path / "swap_rate.dat")[:, 1]
    assert 0.05 < sw[-1] < 0.999


def test_swap_moves_configurations_not_ensembles():
    """After swaps, each chain keeps its own beta; configurations (x and the
    cached energy) travel together."""
    T = 2
    betas = mc.tile_ladder([1.0, 3.0], 8)
    chains = p1d.init_chains(16, beta=betas, seed=1)
    sim = mc.Simulation(
        p1d.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(p1d.displacement_move(sigma=0.8),), seed=1),
         dict(algorithm=mc.ReplicaExchange, n_temps=T, seed=2)],
        50, path="/tmp/re_fields")
    sim.run()
    out = sim.device_state["sys"]
    np.testing.assert_array_equal(np.asarray(out.beta), np.asarray(betas))
    np.testing.assert_allclose(np.asarray(out.e),
                               np.asarray(out.x) ** 2, rtol=1e-5)
    counters = np.asarray(sim.device_state["replica_exchange"]["counters"])
    assert counters[:, 1].sum() > 0 and counters[:, 0].sum() > 0


def test_validation():
    chains = p1d.init_chains(10, beta=2.0, seed=1)
    import pytest
    with pytest.raises(ValueError, match="multiple"):
        mc.Simulation(p1d.make_system(), chains,
                      [dict(algorithm=mc.ReplicaExchange, n_temps=4)],
                      10, path="/tmp/re_bad")
    with pytest.raises(ValueError, match="log_target"):
        sysdef = dataclasses.replace(p1d.make_system(), log_target=None)
        mc.Simulation(sysdef, p1d.init_chains(8, beta=2.0),
                      [dict(algorithm=mc.ReplicaExchange, n_temps=4)],
                      10, path="/tmp/re_bad2")


def test_replica_exchange_sharded_matches_single_device():
    """Swaps gather across shard boundaries: ladder-major layout with 8
    devices means the partner of a boundary chain lives on another device.
    Bitwise agreement with the unsharded run checks the collective path."""
    import jax
    import pytest
    from montecarlo_tpu.parallel import make_mesh

    try:
        devices = jax.devices("cpu")
    except RuntimeError:
        pytest.skip("no CPU backend available")
    if len(devices) < 8:
        pytest.skip("need 8 virtual CPU devices")

    T = 4
    betas = mc.tile_ladder([0.5, 1.0, 2.0, 4.0], 16)

    def build(mesh):
        chains = p1d.init_chains(64, beta=betas, seed=3)
        sim = mc.Simulation(
            p1d.make_system(), chains,
            [dict(algorithm=mc.Metropolis,
                  pool=(p1d.displacement_move(sigma=1.0),), seed=3),
             dict(algorithm=mc.ReplicaExchange, n_temps=T, seed=4)],
            40, path="/tmp/re_shard", mesh=mesh)
        sim.run()
        return (np.asarray(sim.device_state["sys"].x),
                np.asarray(sim.device_state["replica_exchange"]["counters"]))

    x1, c1 = build(None)
    x8, c8 = build(make_mesh(devices=devices))
    np.testing.assert_array_equal(x1, x8)
    np.testing.assert_array_equal(c1, c8)


def test_replica_exchange_composes_with_fused_path(tmp_path):
    """Hybrid advance generality: the sparse device algorithm between fused
    segments can be ANY device algorithm, not just PGMC — here replica
    exchange rides the fused Pallas (interpret) Gaussian sweep and the
    per-beta marginals still come out right."""
    from montecarlo_tpu.core.simulation import _select_advance

    T = len(BETAS)
    betas = mc.tile_ladder(BETAS, N_LADDERS)
    chains = p1d.init_chains(T * N_LADDERS, beta=betas, seed=42)
    steps, burn = 3000, 1000
    sim = mc.Simulation(
        p1d.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(p1d.displacement_move(sigma=1.0),), seed=42,
              fused="interpret"),
         dict(algorithm=mc.ReplicaExchange, n_temps=T, seed=5,
              scheduler=mc.build_schedule(steps, 0, 4)),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[_make_var_callback(k, T) for k in range(T)],
              scheduler=mc.build_schedule(steps, burn, 10))],
        steps, path=str(tmp_path))
    advance = _select_advance(sim)
    assert "hybrid" in advance.__qualname__
    sim.run()
    for k, beta in enumerate(BETAS):
        var = np.loadtxt(tmp_path / f"var{k}.dat")[:, 1].mean()
        assert abs(var - 1 / (2 * beta)) < 0.12 / (2 * beta), (k, beta, var)
    counters = np.asarray(
        sim.device_state["replica_exchange"]["counters"])
    rate = counters[:, 0] / counters[:, 1]
    assert np.all(rate > 0.05), rate
