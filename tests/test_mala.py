"""MALA (gradient-informed, asymmetric proposals) through the generic kernel.

Exercises the asymmetric-proposal path of ``mc_step`` — forward logq at the
old state, backward logq of the inverted action at the NEW state — which the
reference recipe defines (``src/metropolis.jl:176-190``) but its shipped
example (symmetric Gaussian) never distinguishes.  If either density were
evaluated at the wrong state, the harmonic moments below would be biased.
"""

import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d

BETA = 2.0


def _run(tmp_path, pool, steps=6000, burn=1000, n_chains=256, seed=42):
    chains = p1d.init_chains(n_chains, beta=BETA, seed=seed)
    sched = mc.build_schedule(steps, burn, 5)
    sim = mc.Simulation(
        p1d.make_system(p1d.harmonic), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=seed + 1),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(p1d.callback_energy, mc.callback_acceptance),
              scheduler=sched),
         dict(algorithm=mc.StoreTrajectories, scheduler=sched)],
        steps, path=str(tmp_path))
    sim.run()
    xs = np.concatenate([
        np.loadtxt(tmp_path / "trajectories" / str(c + 1) / "trajectory.dat")
        [:, 1] for c in range(n_chains)])
    acc = np.loadtxt(tmp_path / "acceptance.dat")[-1, 1]
    return xs, acc


def test_mala_matches_harmonic_moments(tmp_path):
    xs, acc = _run(tmp_path, (p1d.mala_move(step=0.15),))
    assert abs(xs.mean()) < 0.01
    assert abs(xs.std() - 1.0 / np.sqrt(2 * BETA)) < 0.01
    assert acc > 0.8      # gradient drift keeps acceptance high


def test_mala_small_step_acceptance_near_one(tmp_path):
    _, acc = _run(tmp_path, (p1d.mala_move(step=0.005),), steps=500, burn=100)
    assert acc > 0.97     # proposal approaches the exact Langevin diffusion


def test_mala_mixes_with_random_walk(tmp_path):
    # heterogeneous pool: gradient-informed + plain random walk through the
    # same categorical selection / lax.switch machinery
    xs, acc = _run(tmp_path, (p1d.mala_move(step=0.15, weight=1.0),
                              p1d.displacement_move(sigma=0.5, weight=1.0)))
    assert abs(xs.mean()) < 0.01
    assert abs(xs.std() - 1.0 / np.sqrt(2 * BETA)) < 0.01


def test_mala_rejects_nonpositive_step():
    import pytest
    with pytest.raises(ValueError, match="positive"):
        p1d.mala_move(step=0.0)


def test_mala_backward_density_uses_new_state():
    """Analytic spot check of the asymmetry: logq(delta|x) != logq(-delta|x')
    unless the drift vanishes."""
    import jax.numpy as jnp
    import dataclasses
    pol = p1d.LangevinGaussian(p1d.harmonic)
    params = {"step": jnp.asarray(0.2, jnp.float32)}
    st = p1d.Particle1DState(x=jnp.asarray(1.0), beta=jnp.asarray(BETA),
                             e=jnp.asarray(1.0))
    delta = jnp.asarray(0.3)
    new = dataclasses.replace(st, x=st.x + delta, e=p1d.harmonic(st.x + delta))
    f = float(pol.log_density(params, delta, st))
    b = float(pol.log_density(params, -delta, new))
    # forward: N(0.3; -0.8, 0.4); backward: N(-0.3; -1.04, 0.4)
    import math
    mu_f = -0.2 * BETA * 2 * 1.0
    mu_b = -0.2 * BETA * 2 * 1.3
    want_f = -((0.3 - mu_f) ** 2) / 0.8 - 0.5 * math.log(0.8 * math.pi)
    want_b = -((-0.3 - mu_b) ** 2) / 0.8 - 0.5 * math.log(0.8 * math.pi)
    assert abs(f - want_f) < 1e-5
    assert abs(b - want_b) < 1e-5
    assert abs(f - b) > 0.1


def test_mala_step_learnable_by_pgmc(tmp_path):
    """PGMC differentiates through the drift: a deliberately tiny step grows."""
    from montecarlo_tpu import policy_guided as pg
    chains = p1d.init_chains(128, beta=BETA, seed=3)
    steps = 3000
    pool = (p1d.mala_move(step=0.02),)
    sim = mc.Simulation(
        p1d.make_system(p1d.harmonic), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=4),
         dict(algorithm=pg.PolicyGradientEstimator,
              dependencies=(mc.Metropolis,),
              optimisers=(pg.VPG(1e-3),), q_batch_size=10),
         dict(algorithm=pg.PolicyGradientUpdate,
              dependencies=(pg.PolicyGradientEstimator,)),
         dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
              scheduler=mc.build_schedule(steps, 0, 100))],
        steps, path=str(tmp_path))
    sim.run()
    lines = (tmp_path / "parameters" / "1" /
             "parameters.dat").read_text().strip().splitlines()
    final_step = float(lines[-1].split()[1].strip("[],"))
    assert final_step > 0.05  # grew from 0.02
