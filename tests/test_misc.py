"""Analytic-gradient escape hatch, double-well PGMC, observability
recorders, and Throughput/summary plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu import policy_guided as pg
from montecarlo_tpu.models import particle1d as p1d
from montecarlo_tpu.utils.observability import Throughput
from jax.flatten_util import ravel_pytree


class _AnalyticGaussian(p1d.StandardGaussian):
    """StandardGaussian with the analytic ∇σ logq supplied explicitly —
    exercises the AD-backend escape hatch (ref AD plugin layer,
    src/PolicyGuided/gradients.jl:6-33)."""

    def grad_log_density(self, params, action, state):
        s = params["sigma"]
        return {"sigma": action * action / (s ** 3) - 1.0 / s}


def test_analytic_grad_hook_dispatch():
    move = p1d.displacement_move(sigma=0.3)
    import dataclasses as dc
    md_analytic = dc.replace(move.move, policy=_AnalyticGaussian())
    state = p1d.Particle1DState(x=jnp.asarray(0.7), beta=jnp.asarray(2.0),
                                e=jnp.asarray(0.49))
    flat, unravel = ravel_pytree(move.params)
    action = jnp.asarray(0.4, jnp.float32)
    gd_ad = pg.pgmc_estimate(move.move, flat, unravel, state, action)
    gd_an = pg.pgmc_estimate(md_analytic, flat, unravel, state, action)
    np.testing.assert_allclose(np.asarray(gd_ad.grad_j),
                               np.asarray(gd_an.grad_j), rtol=1e-5)
    np.testing.assert_allclose(float(gd_ad.j), float(gd_an.j), rtol=1e-6)


def test_double_well_pgmc(tmp_path):
    """BASELINE config 3: double-well particle_1d with PGMC sigma adaptation.
    The optimal displacement width for a double well must exceed the barrier
    width, so sigma should grow from a small start."""
    potential = p1d.double_well
    system = p1d.make_system(potential)
    chains = p1d.init_chains(10, beta=2.0, seed=42, potential=potential)
    pool = (p1d.displacement_move(sigma=0.2, potential=potential),)
    steps = 5000
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=pg.PolicyGradientEstimator,
             dependencies=(mc.Metropolis,), optimisers=(pg.VPG(0.001),),
             q_batch_size=10),
        dict(algorithm=pg.PolicyGradientUpdate,
             dependencies=(pg.PolicyGradientEstimator,),
             scheduler=mc.build_schedule(steps, 100, 2)),
        dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
             scheduler=mc.build_schedule(steps, 100, 100)),
        dict(algorithm=mc.StoreCallbacks, callbacks=(p1d.callback_energy,),
             scheduler=mc.build_schedule(steps, 100, 100)),
    ], steps, path=str(tmp_path / "dw"))
    sim.run()
    lines = open(str(tmp_path / "dw" / "parameters" / "1" /
                     "parameters.dat")).read().strip().split("\n")
    s0 = float(lines[0].split(" ", 1)[1].strip("[]"))
    s1 = float(lines[-1].split(" ", 1)[1].strip("[]"))
    assert s1 > s0 + 0.1, f"sigma did not adapt: {s0} -> {s1}"
    # sampler visits both wells across chains
    x = np.asarray(sim.device_state["sys"].x)
    assert (x > 0).any() and (x < 0).any()


def test_throughput_recorder(tmp_path):
    system = p1d.make_system()
    chains = p1d.init_chains(8, beta=2.0, seed=1)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 400
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=Throughput,
             scheduler=mc.build_schedule(steps, 100, 100)),
    ], steps, path=str(tmp_path / "tp"))
    sim.run()
    T = np.loadtxt(str(tmp_path / "tp" / "throughput.dat"))
    T = np.atleast_2d(T)
    assert T.shape[0] >= 2
    assert (T[:, 1] > 0).all()


def test_generic_apply_helper():
    """generic_apply derives Δlogp = log_target(new) - log_target(old)
    (ref delta_log_target_density default, src/metropolis.jl:98)."""
    from montecarlo_tpu.core.moves import generic_apply
    log_target = lambda s: -2.0 * s["x"] ** 2
    perform = lambda s, a: {"x": s["x"] + a}
    apply = generic_apply(perform, log_target)
    s1, dlp = apply({"x": jnp.asarray(1.0)}, jnp.asarray(0.5))
    np.testing.assert_allclose(float(dlp), -2.0 * (1.5 ** 2 - 1.0), rtol=1e-6)
    np.testing.assert_allclose(float(s1["x"]), 1.5)
