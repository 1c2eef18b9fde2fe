"""Ising model: discrete-move protocol + exact transfer-matrix check."""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.core.simulation import _make_advance
from montecarlo_tpu.models import ising


def _advance(sim, ds, n):
    adv = jax.jit(_make_advance(sim.device_algos, always_on=(True,)))
    out = adv(ds, (jnp.ones(sim.steps + 1, bool),), n)
    float(out["sys"].energy.sum())
    return out


def test_energy_cache_consistent():
    chains = ising.init_chains(8, 64, beta=0.5, seed=3)
    sim = mc.Simulation(ising.make_system(), chains,
                        [dict(algorithm=mc.Metropolis,
                              pool=(ising.spin_flip_move(),), seed=3,
                              sweepstep=64)],
                        200, path="/tmp/ising_t")
    ds = _advance(sim, sim.init_device_state(), 200)
    cached = np.asarray(ds["sys"].energy)
    spins = np.asarray(ds["sys"].spins, np.float32)
    full = -np.sum(spins * np.roll(spins, 1, axis=1), axis=1)
    np.testing.assert_allclose(cached, full, atol=1e-3)
    assert set(np.unique(np.asarray(ds["sys"].spins))) <= {-1, 1}


def test_matches_exact_transfer_matrix():
    beta, n = 0.6, 64
    m_chains = 256
    chains = ising.init_chains(m_chains, n, beta=beta, seed=11)
    steps = 3000
    sim = mc.Simulation(ising.make_system(), chains,
                        [dict(algorithm=mc.Metropolis,
                              pool=(ising.spin_flip_move(),), seed=11,
                              sweepstep=n)],
                        steps, path="/tmp/ising_e")
    ds = _advance(sim, sim.init_device_state(), steps)
    e_per_spin = float(np.mean(np.asarray(ds["sys"].energy))) / n
    exact = ising.exact_energy_per_spin(beta, n)
    # single-time-slice average over 256 chains after equilibration
    assert abs(e_per_spin - exact) < 0.03, (e_per_spin, exact)
