"""XY model: continuous-spin lattice family vs exact quadrature.

Ground truth is non-statistical: the 2x2 periodic lattice is integrated by
the tensor-product periodic rectangle rule (spectrally convergent), so both
sampling paths are checked against exact Boltzmann expectations, same style
as the discrete-model enumeration tests.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import xy

BETA = 0.8


def _run_and_read(tmp_path, algo_spec, size, n_chains, steps, burn, seed,
                  beta=BETA):
    chains = xy.init_chains(n_chains, size, beta=beta, seed=seed)
    sched = mc.build_schedule(steps, burn, 1)
    sim = mc.Simulation(
        xy.make_system(), chains,
        [algo_spec,
         dict(algorithm=mc.StoreCallbacks,
              callbacks=[xy.callback_energy_per_spin,
                         xy.callback_magnetisation],
              scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    e = np.loadtxt(tmp_path / "energy_per_spin.dat")[:, 1]
    m = np.loadtxt(tmp_path / "magnetisation.dat")[:, 1]
    return e.mean(), m.mean()


def test_quadrature_converged():
    # energy is spectrally convergent; the magnetisation integrand has a
    # |.| kink (sqrt of the squared field) so it converges polynomially —
    # ~1e-6 at n=32 is far below the 0.03 statistical tolerances used here
    e48, m48 = xy.exact_moments(BETA, n_quad=48)
    e32, m32 = xy.exact_moments(BETA, n_quad=32)
    assert abs(e48 - e32) < 1e-10 and abs(m48 - m32) < 1e-5


def test_checkerboard_matches_quadrature(tmp_path):
    e_exact, m_exact = xy.exact_moments(BETA)
    e, m = _run_and_read(
        tmp_path,
        dict(algorithm=xy.CheckerboardXY, seed=3, delta=1.5, overrelax=1),
        size=2, n_chains=256, steps=1200, burn=200, seed=7)
    assert abs(e - e_exact) < 0.03
    assert abs(m - m_exact) < 0.03


def test_single_rotation_matches_quadrature(tmp_path):
    e_exact, m_exact = xy.exact_moments(BETA)
    e, m = _run_and_read(
        tmp_path,
        dict(algorithm=mc.Metropolis, pool=(xy.rotation_move(1.5),),
             sweepstep=4, seed=3),
        size=2, n_chains=256, steps=2000, burn=400, seed=11)
    assert abs(e - e_exact) < 0.04
    assert abs(m - m_exact) < 0.04


def test_overrelaxation_preserves_energy_exactly():
    chains = xy.init_chains(16, 8, beta=1.1, seed=5)

    def advance(st):
        for _ in range(10):
            st = xy.overrelax_sweep(st)
        return st

    out = jax.jit(jax.vmap(advance))(chains)
    # cached energy unchanged AND consistent with a fresh recompute
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(chains.energy), rtol=0, atol=1e-3)
    th = np.asarray(out.theta, np.float64)
    fresh = -(np.cos(th - np.roll(th, 1, 1))
              + np.cos(th - np.roll(th, 1, 2))).sum((1, 2))
    np.testing.assert_allclose(np.asarray(out.energy), fresh, atol=1e-2)
    # and it actually moved the angles
    assert np.abs(np.asarray(out.theta) - np.asarray(chains.theta)).max() > 0.1


def test_energy_cache_consistent_checkerboard():
    chains = xy.init_chains(8, 6, beta=0.9, seed=3)
    key = jax.random.key(0)

    def advance(st, key):
        keys = jax.random.split(key, 40)

        def body(carry, k):
            st, _ = xy.checkerboard_sweep(carry, jnp.float32(1.0), k)
            return st, None

        st, _ = jax.lax.scan(body, st, keys)
        return st

    out = jax.jit(jax.vmap(advance))(chains, jax.random.split(key, 8))
    th = np.asarray(out.theta, np.float64)
    fresh = -(np.cos(th - np.roll(th, 1, 1))
              + np.cos(th - np.roll(th, 1, 2))).sum((1, 2))
    np.testing.assert_allclose(np.asarray(out.energy), fresh, atol=1e-2)


def test_checkerboard_rejects_odd_lattice(tmp_path):
    import pytest
    chains = xy.init_chains(4, 3, beta=0.5, seed=1)
    with pytest.raises(ValueError, match="even lattice"):
        mc.Simulation(
            xy.make_system(), chains,
            [dict(algorithm=xy.CheckerboardXY, seed=2)],
            10, path=str(tmp_path))


def test_low_temperature_orders(tmp_path):
    e, m = _run_and_read(
        tmp_path,
        dict(algorithm=xy.CheckerboardXY, seed=2, delta=0.6, overrelax=2),
        size=8, n_chains=8, steps=600, burn=300, seed=5, beta=5.0)
    assert m > 0.9          # deep in the ordered phase (finite lattice)
    assert e < -1.8         # near the ground state e = -2


def test_rotation_sigma_learnable_by_pgmc(tmp_path):
    """PGMC drives the Gaussian rotation width up from a deliberately tiny
    value — continuous lattice model through the full adaptive stack.  (The
    uniform-box policy is NOT learnable this way: its score function is
    action-independent, so REINFORCE cannot see the support boundary — hence
    the gaussian policy option.)"""
    from montecarlo_tpu import policy_guided as pg
    chains = xy.init_chains(64, 4, beta=0.6, seed=3)
    steps = 1500
    sim = mc.Simulation(
        xy.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(xy.rotation_move(0.05, policy="gaussian"),),
              sweepstep=4, seed=4),
         dict(algorithm=pg.PolicyGradientEstimator,
              dependencies=(mc.Metropolis,),
              optimisers=(pg.VPG(5e-4),), q_batch_size=8),
         dict(algorithm=pg.PolicyGradientUpdate,
              dependencies=(pg.PolicyGradientEstimator,)),
         dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
              scheduler=mc.build_schedule(steps, 0, 100))],
        steps, path=str(tmp_path))
    sim.run()
    lines = (tmp_path / "parameters" / "1" /
             "parameters.dat").read_text().strip().splitlines()
    final_delta = float(lines[-1].split()[1].strip("[],"))
    assert final_delta > 0.12  # grew from 0.05
