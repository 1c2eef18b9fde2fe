"""2-D Ising: checkerboard + single-flip paths vs exact enumeration.

The 4×4 periodic lattice is small enough to enumerate all 2^16 states, so the
sampled energy/|m| are checked against exact Boltzmann expectations — a
non-statistical ground truth (tighter than the reference's moment tests,
``test/distribution_test.jl:31-37``, which compare against analytic moments).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import ising2d

L, BETA = 4, 0.3


def _run_and_read(tmp_path, algo_spec, n_chains, steps, burn, seed):
    chains = ising2d.init_chains(n_chains, L, beta=BETA, seed=seed)
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
    return e.mean(), m.mean(), sim


def test_checkerboard_matches_exact_enumeration(tmp_path):
    e_exact, m_exact = ising2d.exact_moments(L, BETA)
    e, m, sim = _run_and_read(
        tmp_path, dict(algorithm=ising2d.CheckerboardMetropolis, seed=11),
        n_chains=128, steps=1500, burn=200, seed=7)
    assert abs(e - e_exact) < 0.02
    assert abs(m - m_exact) < 0.02
    # counters: attempts = sweeps * L^2 per scheduled step, acceptance in (0,1)
    counters = np.asarray(sim.device_state["checkerboard"]["counters"])
    assert counters[..., 1].min() == 1500 * L * L
    rate = counters[..., 0].sum() / counters[..., 1].sum()
    assert 0.05 < rate < 0.95


def test_single_flip_matches_exact_enumeration(tmp_path):
    e_exact, m_exact = ising2d.exact_moments(L, BETA)
    e, m, _ = _run_and_read(
        tmp_path,
        dict(algorithm=mc.Metropolis, pool=(ising2d.spin_flip_move(),),
             sweepstep=L * L, seed=11),
        n_chains=128, steps=2000, burn=500, seed=9)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_energy_cache_consistent_checkerboard():
    chains = ising2d.init_chains(16, 8, beta=0.6, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 50)

        def body(carry, k):
            st, _ = ising2d.checkerboard_sweep(carry, k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 16))
    cached = np.asarray(out.energy)
    s = np.asarray(out.spins, np.float32)
    full = -np.sum(s * (np.roll(s, 1, axis=1) + np.roll(s, 1, axis=2)),
                   axis=(1, 2))
    np.testing.assert_allclose(cached, full, atol=1e-3)


def test_low_temperature_orders():
    """Deep in the ordered phase (beta >> beta_c ~ 0.4407) the checkerboard
    sampler should drive |m| near 1 from a random start."""
    chains = ising2d.init_chains(8, 8, beta=1.0, seed=5)
    sim = mc.Simulation(
        ising2d.make_system(), chains,
        [dict(algorithm=ising2d.CheckerboardMetropolis, seed=2)],
        400, path="/tmp/ising2d_order")
    sim.run()
    m = np.abs(np.asarray(sim.device_state["sys"].spins, np.float32)
               .mean(axis=(1, 2)))
    assert m.mean() > 0.9


def test_exact_moments_sanity():
    # beta -> 0: independent spins, e/spin -> 0, E|m| -> ~ sqrt(2/(pi n))
    e0, m0 = ising2d.exact_moments(4, 1e-8)
    assert abs(e0) < 1e-6
    assert abs(m0 - np.sqrt(2 / (np.pi * 16))) < 0.02
    # beta -> inf: ground state, e/spin -> -2, |m| -> 1
    e1, m1 = ising2d.exact_moments(3, 6.0)
    assert abs(e1 + 2.0) < 1e-2
    assert abs(m1 - 1.0) < 1e-2
