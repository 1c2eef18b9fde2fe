"""Unit tests for the MH kernel (``core/metropolis.py``) mirroring the
semantics of the reference hot loop ``src/metropolis.jl:176-212``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.core.metropolis import mc_step, mc_sweep
from montecarlo_tpu.core.moves import tree_select
from montecarlo_tpu.models import particle1d as p1d


def _setup(sigma=0.5, beta=2.0, n=64):
    move = p1d.displacement_move(sigma=sigma)
    chains = p1d.init_chains(n, beta=beta, seed=1)
    return move, chains


def test_tree_select():
    a = {"x": jnp.ones((3,)), "y": jnp.ones((3, 2))}
    b = {"x": jnp.zeros((3,)), "y": jnp.zeros((3, 2))}
    pred = jnp.asarray([True, False, True])
    out = tree_select(pred, a, b)
    assert list(out["x"]) == [1, 0, 1]
    assert out["y"].tolist() == [[1, 1], [0, 0], [1, 1]]


def test_mc_step_counters_and_state():
    move, chains = _setup()
    movedefs, params = (move.move,), (move.params,)
    logw = jnp.zeros((1,))
    counters = jnp.zeros((64, 1, 2), jnp.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(64, dtype=jnp.uint32))
    st, cnt = jax.vmap(
        lambda s, c, k: mc_step(movedefs, params, logw, s, c, k))(
        chains, counters, keys)
    # total counter incremented exactly once per chain
    assert np.all(np.asarray(cnt[:, 0, 1]) == 1)
    acc = np.asarray(cnt[:, 0, 0])
    assert set(np.unique(acc)).issubset({0, 1})
    # accepted chains moved, rejected chains unchanged
    moved = np.asarray(st.x) != np.asarray(chains.x)
    assert np.array_equal(moved, acc.astype(bool))
    # cached energy stays consistent with position
    np.testing.assert_allclose(np.asarray(st.e),
                               np.asarray(st.x) ** 2, rtol=1e-6)


def test_downhill_always_accepted():
    """A proposal that strictly lowers the energy must always be accepted
    (alpha = 1), per the acceptance rule src/metropolis.jl:183."""
    beta = 2.0
    state = p1d.Particle1DState(x=jnp.asarray(3.0), beta=jnp.asarray(beta),
                                e=jnp.asarray(9.0))

    class ToZero(mc.Policy):
        def sample(self, params, key, state):
            return -state.x  # deterministic: jump to the minimum

        def log_density(self, params, action, state):
            return jnp.asarray(0.0)  # symmetric dummy

    def apply(s, a):
        xn = s.x + a
        en = xn * xn
        import dataclasses
        return dataclasses.replace(s, x=xn, e=en), -(en - s.e) * s.beta

    md = mc.MoveDef(name="tozero", policy=ToZero(), apply=apply,
                    invert=lambda a, s: -a)
    counters = jnp.zeros((1, 2), jnp.int32)
    for seed in range(5):
        st, cnt = mc_step((md,), ((),), jnp.zeros((1,)), state, counters,
                          jax.random.key(seed))
        assert float(st.x) == 0.0
        assert int(cnt[0, 0]) == 1


def test_multi_move_switch():
    """Pool of two moves with different sigmas: both get selected with the
    configured weights and counters track per-move stats (mc_sweep!
    categorical selection, src/metropolis.jl:206-207)."""
    m1 = p1d.displacement_move(sigma=0.1, weight=0.75)
    m2 = p1d.displacement_move(sigma=1.0, weight=0.25)
    movedefs = (m1.move, m2.move)
    params = (m1.params, m2.params)
    w = np.asarray([0.75, 0.25])
    logw = jnp.asarray(np.log(w / w.sum()))
    chains = p1d.init_chains(512, beta=2.0, seed=3)
    counters = jnp.zeros((512, 2, 2), jnp.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(7), jnp.arange(512, dtype=jnp.uint32))
    st, cnt = jax.vmap(
        lambda s, c, k: mc_sweep(movedefs, params, logw, s, c, k,
                                 mc_steps=16))(chains, counters, keys)
    totals = np.asarray(cnt[..., 1]).sum(axis=0)
    assert totals.sum() == 512 * 16
    frac = totals / totals.sum()
    np.testing.assert_allclose(frac, [0.75, 0.25], atol=0.03)
    # small-sigma move should have higher acceptance
    acc = np.asarray(cnt[..., 0]).sum(axis=0) / totals
    assert acc[0] > acc[1]


def test_reproducible_and_chain_independent():
    """Same seed => identical trajectories; chains use independent streams
    (SURVEY §7 RNG recipe: fold_in(chain_id) + fold_in(t))."""
    move, chains = _setup(n=8)
    movedefs, params = (move.move,), (move.params,)
    logw = jnp.zeros((1,))

    def sweep(chains, seed):
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.key(seed), jnp.arange(8, dtype=jnp.uint32))
        counters = jnp.zeros((8, 1, 2), jnp.int32)
        st, _ = jax.vmap(
            lambda s, c, k: mc_sweep(movedefs, params, logw, s, c, k,
                                     mc_steps=4))(chains, counters, keys)
        return np.asarray(st.x)

    x1 = sweep(chains, 0)
    x2 = sweep(chains, 0)
    x3 = sweep(chains, 1)
    np.testing.assert_array_equal(x1, x2)
    assert not np.array_equal(x1, x3)
    # different chains (same start) should diverge
    uniform = p1d.Particle1DState(
        x=jnp.zeros((8,)), beta=jnp.full((8,), 2.0), e=jnp.zeros((8,)))
    xs = sweep(uniform, 0)
    assert len(np.unique(xs)) > 1
