"""Heisenberg O(3) model vs the exact 4-ring transfer-operator solution.

The 2x2 periodic lattice (doubled edges under the roll(+1) bond convention)
is a 4-ring with coupling 2J; the classical Heisenberg ring is exactly
solvable via the spherical-Bessel expansion, giving a non-statistical ground
truth for both sampling paths — same style as the XY quadrature tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import heisenberg as hb

BETA = 0.7


def _run_and_read(tmp_path, algo_spec, size, n_chains, steps, burn, seed,
                  beta=BETA):
    chains = hb.init_chains(n_chains, size, beta=beta, seed=seed)
    sched = mc.build_schedule(steps, burn, 1)
    sim = mc.Simulation(
        hb.make_system(), chains,
        [algo_spec,
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[hb.callback_energy_per_spin,
                         hb.callback_magnetisation],
              scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1]
    return e.mean(), sim


def test_exact_solution_truncation_converged():
    e60 = hb.exact_energy_2x2(BETA, l_max=60)
    e30 = hb.exact_energy_2x2(BETA, l_max=30)
    assert abs(e60 - e30) < 1e-12
    # beta -> 0 limit: free spins, zero energy
    assert abs(hb.exact_energy_2x2(1e-6)) < 1e-4


def test_checkerboard_matches_exact_ring(tmp_path):
    e_exact = hb.exact_energy_2x2(BETA)
    e, _ = _run_and_read(
        tmp_path,
        dict(algorithm=hb.CheckerboardHeisenberg, seed=3, delta=1.5,
             overrelax=1),
        size=2, n_chains=256, steps=1200, burn=200, seed=7)
    assert abs(e - e_exact) < 0.03


def test_single_rotation_matches_exact_ring(tmp_path):
    e_exact = hb.exact_energy_2x2(BETA)
    e, _ = _run_and_read(
        tmp_path,
        dict(algorithm=mc.Metropolis, pool=(hb.rotation_move(1.5),),
             sweepstep=4, seed=3),
        size=2, n_chains=256, steps=2000, burn=400, seed=11)
    assert abs(e - e_exact) < 0.04


def test_overrelaxation_preserves_energy_exactly():
    chains = hb.init_chains(16, 8, beta=1.1, seed=5)

    def advance(st):
        for _ in range(10):
            st = hb.overrelax_sweep(st)
        return st

    out = jax.jit(jax.vmap(advance))(chains)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(chains.energy), rtol=0, atol=1e-3)
    sp = np.asarray(out.spins, np.float64)
    fresh = -(sp * (np.roll(sp, 1, 1) + np.roll(sp, 1, 2))).sum((1, 2, 3))
    np.testing.assert_allclose(np.asarray(out.energy), fresh, atol=1e-2)
    # it moved the spins and kept them unit-norm
    assert np.abs(sp - np.asarray(chains.spins)).max() > 0.1
    np.testing.assert_allclose(np.linalg.norm(sp, axis=-1), 1.0, atol=1e-4)


def test_energy_cache_consistent_checkerboard():
    chains = hb.init_chains(8, 6, beta=0.9, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 40)

        def body(carry, k):
            st, _ = hb.checkerboard_sweep(carry, jnp.float32(1.0), k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 8))
    sp = np.asarray(out.spins, np.float64)
    fresh = -(sp * (np.roll(sp, 1, 1) + np.roll(sp, 1, 2))).sum((1, 2, 3))
    np.testing.assert_allclose(np.asarray(out.energy), fresh, atol=1e-2)
    np.testing.assert_allclose(np.linalg.norm(sp, axis=-1), 1.0, atol=1e-4)


def test_checkerboard_rejects_odd_lattice(tmp_path):
    chains = hb.init_chains(4, 3, beta=0.5, seed=1)
    with pytest.raises(ValueError, match="even lattice"):
        mc.Simulation(
            hb.make_system(), chains,
            [dict(algorithm=hb.CheckerboardHeisenberg, seed=2)],
            10, path=str(tmp_path))


def test_low_temperature_orders(tmp_path):
    chains = hb.init_chains(8, 8, beta=8.0, seed=5)
    steps, burn = 600, 300
    sim = mc.Simulation(
        hb.make_system(), chains,
        [dict(algorithm=hb.CheckerboardHeisenberg, seed=2, delta=0.5,
              overrelax=2),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[hb.callback_energy_per_spin,
                         hb.callback_magnetisation],
              scheduler=mc.build_schedule(steps, burn, 1))],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1].mean()
    m = np.loadtxt(tmp_path / "magnetisation.dat")[:, 1].mean()
    assert m > 0.85         # deep in the ordered phase (finite lattice)
    assert e < -1.75        # near the ground state e = -2
