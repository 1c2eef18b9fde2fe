"""Wolff cluster algorithm vs exact enumeration + invariants.

Same ground-truth style as ``tests/test_ising2d.py``: the 4×4 periodic
lattice is exactly enumerable, so the rejection-free cluster sampler is
checked against non-statistical Boltzmann expectations (stricter than the
reference's analytic-moment tests, ``test/distribution_test.jl:31-37``).
"""

import jax
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import ising2d

L = 4


def _run(tmp_path, beta, n_chains, steps, burn, seed, clusters=1):
    chains = ising2d.init_chains(n_chains, L, beta=beta, seed=seed)
    sched = mc.build_schedule(steps, burn, 1)
    sim = mc.Simulation(
        ising2d.make_system(), chains,
        [dict(algorithm=ising2d.WolffCluster, seed=seed + 1,
              clusters=clusters),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[ising2d.callback_energy_per_spin,
                         ising2d.callback_magnetisation,
                         ising2d.callback_mean_cluster_size],
              scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1]
    m = np.loadtxt(tmp_path / "magnetisation.dat")[:, 1]
    return e.mean(), m.mean(), sim


def test_wolff_matches_exact_enumeration(tmp_path):
    e_exact, m_exact = ising2d.exact_moments(L, 0.3)
    e, m, sim = _run(tmp_path, beta=0.3, n_chains=128, steps=1200,
                     burn=200, seed=13)
    assert abs(e - e_exact) < 0.02
    assert abs(m - m_exact) < 0.02
    counters = np.asarray(sim.device_state["wolff"]["counters"])
    sizes = counters[..., 0] / counters[..., 1]
    assert np.all(sizes >= 1.0) and np.all(sizes <= L * L)


def test_wolff_near_critical(tmp_path):
    """At beta_c ≈ 0.4407 single-flip dynamics slow down; Wolff should still
    reproduce exact moments with modest statistics (its selling point)."""
    beta = 0.44
    e_exact, m_exact = ising2d.exact_moments(L, beta)
    e, m, _ = _run(tmp_path, beta=beta, n_chains=128, steps=1200,
                   burn=200, seed=29, clusters=2)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_wolff_energy_cache_consistent():
    chains = ising2d.init_chains(8, 8, beta=0.5, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 30)

        def body(carry, k):
            st, _ = ising2d.wolff_step(carry, k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 8))
    cached = np.asarray(out.energy)
    s = np.asarray(out.spins, np.float32)
    full = -np.sum(s * (np.roll(s, 1, axis=1) + np.roll(s, 1, axis=2)),
                   axis=(1, 2))
    np.testing.assert_allclose(cached, full, atol=1e-3)


def test_wolff_cluster_spans_at_low_temperature():
    """Deep in the ordered phase the activated-bond component of an ordered
    lattice is (almost surely) the whole lattice, so a single Wolff step flips
    every spin — the global-update behaviour local moves cannot reach."""
    chains = ising2d.init_chains(4, 6, beta=3.0, seed=1)
    # order the lattice first so all bonds are aligned
    import dataclasses
    import jax.numpy as jnp
    chains = dataclasses.replace(
        chains, spins=jnp.ones_like(chains.spins),
        energy=jnp.full_like(chains.energy, -2.0 * 36))
    st, size = jax.jit(jax.vmap(ising2d.wolff_step))(
        chains, jax.random.split(jax.random.key(7), 4))
    assert np.all(np.asarray(size) == 36)
    assert np.all(np.asarray(st.spins) == -1)


def test_wolff_rejects_antiferromagnetic_coupling(tmp_path):
    """p = 1 - exp(-2 beta J) is only a valid cluster rule for J > 0; the
    driver must refuse J <= 0 instead of silently violating detailed
    balance."""
    import pytest
    chains = ising2d.init_chains(4, L, beta=0.5, j=-1.0, seed=1)
    with pytest.raises(ValueError, match="J > 0"):
        mc.Simulation(
            ising2d.make_system(), chains,
            [dict(algorithm=ising2d.WolffCluster, seed=2)],
            10, path=str(tmp_path))
