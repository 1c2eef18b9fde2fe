"""2-D Lennard-Jones system tests (BASELINE.json configs 4-5).

The key correctness property of the incremental O(N) delta-energy scheme is
cache consistency: after thousands of accepted/rejected moves the carried
``state.energy`` must match a fresh O(N^2) recomputation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj


def _run(pool, n_chains=4, n=48, rho=0.6, beta=1.0, steps=300, frac_b=0.2,
         seed=7, params=lj.LJParams()):
    system = lj.make_system(params)
    chains = lj.init_chains(n_chains, n, rho, beta, frac_b=frac_b, seed=seed,
                            params=params)
    sim = mc.Simulation(system, chains,
                        [dict(algorithm=mc.Metropolis, pool=pool, seed=seed,
                              sweepstep=n)],
                        steps, path="/tmp/lj_test")
    sim.device_state = sim.init_device_state()
    from montecarlo_tpu.core.simulation import _make_advance
    adv = jax.jit(_make_advance(sim.device_algos))
    masks = tuple(jnp.ones(steps + 1, bool) for _ in sim.device_algos)
    ds = adv(sim.device_state, masks, steps)
    float(ds["sys"].energy.sum())  # force execution
    return chains, ds


def test_displacement_energy_cache_consistent():
    params = lj.LJParams()
    pool = (lj.lj_displacement_move(sigma=0.12, params=params),)
    chains, ds = _run(pool, params=params)
    cached = np.asarray(ds["sys"].energy)
    full = np.asarray(jax.vmap(
        lambda s: lj.total_energy(s, params))(ds["sys"]))
    np.testing.assert_allclose(cached, full, rtol=2e-4, atol=2e-3)
    # chains actually moved
    assert not np.allclose(np.asarray(ds["sys"].pos),
                           np.asarray(chains.pos))
    # positions stayed inside the box
    box = float(chains.box[0])
    assert np.all(np.asarray(ds["sys"].pos) >= 0)
    assert np.all(np.asarray(ds["sys"].pos) < box)


def test_swap_energy_cache_and_species_conservation():
    params = lj.LJParams()
    pool = (lj.lj_displacement_move(sigma=0.12, weight=0.8, params=params),
            lj.lj_swap_move(weight=0.2, params=params))
    chains, ds = _run(pool, params=params)
    cached = np.asarray(ds["sys"].energy)
    full = np.asarray(jax.vmap(
        lambda s: lj.total_energy(s, params))(ds["sys"]))
    np.testing.assert_allclose(cached, full, rtol=2e-4, atol=2e-3)
    # swap conserves composition per chain
    n_b0 = np.asarray(jnp.sum(chains.species, axis=1))
    n_b1 = np.asarray(jnp.sum(ds["sys"].species, axis=1))
    np.testing.assert_array_equal(n_b0, n_b1)
    # swaps actually happened in at least one chain
    assert np.any(np.asarray(ds["sys"].species) != np.asarray(chains.species))
    counters = np.asarray(ds["metropolis"]["counters"])
    assert counters[..., 1].sum() > 0
    # both moves were exercised
    assert (counters[:, 0, 1] > 0).all() and (counters[:, 1, 1] > 0).all()


def test_ideal_gas_limit_accepts_everything():
    """eps=0: every displacement has ΔE=0, acceptance must be 1."""
    params = lj.LJParams(eps=((0.0, 0.0), (0.0, 0.0)))
    pool = (lj.lj_displacement_move(sigma=0.3, params=params),)
    chains, ds = _run(pool, steps=50, params=params)
    counters = np.asarray(ds["metropolis"]["counters"])
    assert (counters[..., 0] == counters[..., 1]).all()
    assert np.allclose(np.asarray(ds["sys"].energy), 0.0, atol=1e-5)


def test_repulsion_pushes_energy_down():
    """From a jittered lattice at moderate density, MC should relax the
    configuration: energy after equilibration <= initial energy."""
    params = lj.LJParams()
    pool = (lj.lj_displacement_move(sigma=0.1, params=params),)
    chains, ds = _run(pool, n=64, rho=0.8, beta=2.0, steps=400,
                      params=params)
    e0 = np.asarray(chains.energy)
    e1 = np.asarray(ds["sys"].energy)
    assert np.mean(e1) < np.mean(e0)


def test_total_energy_two_particles_analytic():
    """N=2 at a known separation matches the analytic truncated-shifted LJ."""
    params = lj.LJParams()
    r = 1.2
    box = 20.0
    state = lj.LJState(
        pos=jnp.asarray([[1.0, 1.0], [1.0 + r, 1.0]], jnp.float32),
        species=jnp.zeros((2,), jnp.int32),
        beta=jnp.asarray(1.0), energy=jnp.asarray(0.0),
        box=jnp.asarray(box, jnp.float32))
    e = float(lj.total_energy(state, params))
    u = 4 * (r ** -12 - r ** -6)
    ushift = 4 * (2.5 ** -12 - 2.5 ** -6)
    np.testing.assert_allclose(e, u - ushift, rtol=1e-5)
