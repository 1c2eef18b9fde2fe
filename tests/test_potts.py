"""q-state Potts: generic-move and checkerboard paths vs exact enumeration.

Same non-statistical ground truth as the Ising tests: tiny lattices are
exactly enumerable (q^(L²) states), so sampled moments are compared against
exact Boltzmann expectations rather than analytic approximations.
"""

import jax
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import potts

Q, L, BETA = 3, 3, 0.5


def _run_and_read(tmp_path, algo_spec, n_chains, steps, burn, seed,
                  q=Q, size=L, beta=BETA):
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


def test_checkerboard_matches_exact_enumeration(tmp_path):
    # Checkerboard sweeps need an even lattice (the periodic odd lattice is
    # not bipartite), so this path is checked at q=2, L=4 — still exactly
    # enumerable (2^16 states).  The q=3/L=3 case stays with the single-site
    # recolour path below.
    q, size = 2, 4
    e_exact, m_exact = potts.exact_moments(size, q, BETA)
    e, m = _run_and_read(
        tmp_path, dict(algorithm=potts.CheckerboardPotts(q), seed=11),
        n_chains=128, steps=1500, burn=300, seed=7, q=q, size=size)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_checkerboard_rejects_odd_lattice(tmp_path):
    chains = potts.init_chains(8, 3, q=3, beta=BETA, seed=1)
    import pytest
    with pytest.raises(ValueError, match="even lattice"):
        mc.Simulation(
            potts.make_system(3), chains,
            [dict(algorithm=potts.CheckerboardPotts(3), seed=2)],
            10, path=str(tmp_path))


def test_single_recolor_matches_exact_enumeration(tmp_path):
    e_exact, m_exact = potts.exact_moments(L, Q, BETA)
    e, m = _run_and_read(
        tmp_path,
        dict(algorithm=mc.Metropolis, pool=(potts.color_flip_move(Q),),
             sweepstep=L * L, seed=11),
        n_chains=128, steps=2000, burn=500, seed=9)
    assert abs(e - e_exact) < 0.04
    assert abs(m - m_exact) < 0.04


def test_energy_cache_consistent_checkerboard():
    chains = potts.init_chains(16, 8, q=4, beta=0.8, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 50)

        def body(carry, k):
            st, _ = potts.checkerboard_sweep(carry, 4, k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 16))
    cached = np.asarray(out.energy)
    s = np.asarray(out.spins)
    full = -((s == np.roll(s, 1, axis=1)).astype(np.float64)
             + (s == np.roll(s, 1, axis=2)).astype(np.float64)
             ).sum(axis=(1, 2))
    np.testing.assert_allclose(cached, full, atol=1e-3)


def test_q2_reduces_to_ising():
    """At q=2 the Potts model is the Ising model in disguise:
    delta(s_i, s_j) = (1 + s_i s_j)/2, so E_potts = -J n_bonds/2 + E_ising/2
    and the Boltzmann weights at beta match Ising at beta/2.  Per spin
    (2 bonds/site, J=1): e_p(beta) = -1 + e_i(beta/2)/2.  Checked through
    the exact enumerators of the two modules on a 3x3 lattice."""
    from montecarlo_tpu.models import ising2d
    beta = 0.4
    e_p, _ = potts.exact_moments(3, 2, beta, j=1.0)
    e_i, _ = ising2d.exact_moments(3, beta / 2, j=1.0)
    np.testing.assert_allclose(e_p, -1.0 + e_i / 2.0, atol=1e-6)


def test_low_temperature_orders():
    chains = potts.init_chains(8, 6, q=3, beta=3.0, seed=5)
    sim = mc.Simulation(
        potts.make_system(3), chains,
        [dict(algorithm=potts.CheckerboardPotts(3), seed=2)],
        500, path="/tmp/potts_order")
    sim.run()
    s = np.asarray(sim.device_state["sys"].spins)
    n = s.shape[-1] * s.shape[-2]
    counts = np.stack([(s == c).sum(axis=(1, 2)) for c in range(3)], axis=-1)
    m = (3 * counts.max(axis=-1) / n - 1.0) / 2.0
    assert m.mean() > 0.9
