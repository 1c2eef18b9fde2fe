"""Cluster ops + Swendsen–Wang / Potts-Wolff vs exact enumeration.

Capability beyond the reference engine (single-proposal MH only,
``src/metropolis.jl:176-190``): rejection-free cluster samplers, checked
against non-statistical exact Boltzmann expectations on tiny lattices —
including ODD lattices, where the checkerboard path is invalid (the periodic
odd lattice is not bipartite) but FK cluster moves remain exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import ising2d, potts
from montecarlo_tpu.ops.cluster import component_labels, seed_component_mask


# ---------------------------------------------------------------------------
# unit: labelling primitives
# ---------------------------------------------------------------------------

def _labels_np(act_right, act_down):
    """Reference labelling by union-find on the host."""
    lx, ly = act_right.shape
    parent = list(range(lx * ly))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i in range(lx):
        for j in range(ly):
            if act_right[i, j]:
                union(i * ly + j, i * ly + (j + 1) % ly)
            if act_down[i, j]:
                union(i * ly + j, ((i + 1) % lx) * ly + j)
    return np.array([find(a) for a in range(lx * ly)]).reshape(lx, ly)


def test_component_labels_matches_union_find():
    rng = np.random.default_rng(0)
    for lx, ly in [(4, 4), (5, 7), (8, 3), (6, 6)]:
        for dens in (0.2, 0.5, 0.8):
            ar = rng.random((lx, ly)) < dens
            ad = rng.random((lx, ly)) < dens
            got = np.asarray(component_labels(jnp.asarray(ar),
                                              jnp.asarray(ad)))
            want = _labels_np(ar, ad)
            np.testing.assert_array_equal(got, want)


def test_seed_component_mask_matches_labels():
    rng = np.random.default_rng(1)
    ar = rng.random((6, 6)) < 0.5
    ad = rng.random((6, 6)) < 0.5
    labels = np.asarray(component_labels(jnp.asarray(ar), jnp.asarray(ad)))
    for site in (0, 7, 35):
        mask = np.asarray(seed_component_mask(
            jnp.asarray(ar), jnp.asarray(ad), site))
        want = labels == labels.reshape(-1)[site]
        np.testing.assert_array_equal(mask, want)


# ---------------------------------------------------------------------------
# Swendsen–Wang Ising vs exact enumeration
# ---------------------------------------------------------------------------

def _run_ising(tmp_path, algo_spec, size, beta, n_chains, steps, burn, seed):
    chains = ising2d.init_chains(n_chains, size, beta=beta, seed=seed)
    sched = mc.build_schedule(steps, burn, 1)
    sim = mc.Simulation(
        ising2d.make_system(), chains,
        [algo_spec,
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[ising2d.callback_energy_per_spin,
                         ising2d.callback_magnetisation],
              scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1]
    m = np.loadtxt(tmp_path / "magnetisation.dat")[:, 1]
    return e.mean(), m.mean()


def test_swendsen_wang_matches_exact_enumeration(tmp_path):
    e_exact, m_exact = ising2d.exact_moments(4, 0.35)
    e, m = _run_ising(
        tmp_path, dict(algorithm=ising2d.SwendsenWang, seed=3),
        size=4, beta=0.35, n_chains=128, steps=900, burn=150, seed=17)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_swendsen_wang_valid_on_odd_lattice(tmp_path):
    # the capability the checkerboard path cannot provide: whole-lattice
    # updates on a periodic odd (non-bipartite) lattice
    e_exact, m_exact = ising2d.exact_moments(3, 0.4)
    e, m = _run_ising(
        tmp_path, dict(algorithm=ising2d.SwendsenWang, seed=5),
        size=3, beta=0.4, n_chains=128, steps=900, burn=150, seed=19)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_swendsen_wang_rejects_antiferromagnetic(tmp_path):
    import pytest
    chains = ising2d.init_chains(4, 4, beta=0.5, j=-1.0, seed=1)
    with pytest.raises(ValueError, match="J > 0"):
        mc.Simulation(
            ising2d.make_system(), chains,
            [dict(algorithm=ising2d.SwendsenWang, seed=2)],
            10, path=str(tmp_path))


def test_swendsen_wang_energy_cache_consistent():
    chains = ising2d.init_chains(8, 6, beta=0.45, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 30)

        def body(carry, k):
            st, _ = ising2d.swendsen_wang_step(carry, k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 8))
    s = np.asarray(out.spins, np.float64)
    full = -(s * (np.roll(s, 1, axis=1) + np.roll(s, 1, axis=2))
             ).sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out.energy), full, atol=1e-3)


# ---------------------------------------------------------------------------
# Potts cluster moves vs exact enumeration (odd lattice, q = 3)
# ---------------------------------------------------------------------------

def _run_potts(tmp_path, algo_spec, q, size, beta, n_chains, steps, burn,
               seed):
    chains = potts.init_chains(n_chains, size, q=q, beta=beta, seed=seed)
    sched = mc.build_schedule(steps, burn, 1)
    sim = mc.Simulation(
        potts.make_system(q), chains,
        [algo_spec,
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[potts.callback_energy_per_spin,
                         potts.callback_order_parameter(q)],
              scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1]
    m = np.loadtxt(tmp_path / "order_parameter.dat")[:, 1]
    return e.mean(), m.mean()


def test_potts_swendsen_wang_matches_exact(tmp_path):
    q, size, beta = 3, 3, 0.6
    e_exact, m_exact = potts.exact_moments(size, q, beta)
    e, m = _run_potts(
        tmp_path, dict(algorithm=potts.SwendsenWangPotts(q), seed=3),
        q=q, size=size, beta=beta, n_chains=128, steps=900, burn=150, seed=23)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_potts_wolff_matches_exact(tmp_path):
    q, size, beta = 3, 3, 0.6
    e_exact, m_exact = potts.exact_moments(size, q, beta)
    e, m = _run_potts(
        tmp_path,
        dict(algorithm=potts.WolffPotts(q), seed=3, clusters=4),
        q=q, size=size, beta=beta, n_chains=128, steps=1200, burn=200,
        seed=29)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_potts_cluster_energy_cache_consistent():
    chains = potts.init_chains(8, 5, q=4, beta=0.7, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 20)

        def body(carry, k):
            st, _ = potts.swendsen_wang_step(carry, 4, k)
            st, _ = potts.wolff_step(st, 4, k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 8))
    s = np.asarray(out.spins)
    full = -((s == np.roll(s, 1, axis=1)).astype(np.float64)
             + (s == np.roll(s, 1, axis=2)).astype(np.float64)
             ).sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out.energy), full, atol=1e-3)
