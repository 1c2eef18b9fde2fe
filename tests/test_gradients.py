"""Gradient cross-validation — tier 3 of the reference strategy
(``test/ad_backends_test.jl``): the reference checks
ForwardDiff/Zygote/Enzyme agree to 1e-10; here the one backend is ``jax.grad``
and we cross-check it against the analytic gradient of the Gaussian policy,
plus unit-check the pgmc_estimate kernel against hand-computed values
(``src/PolicyGuided/gradients.jl:93-109``)."""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu import policy_guided as pg
from montecarlo_tpu.models import particle1d as p1d
from jax.flatten_util import ravel_pytree


def test_grad_logq_matches_analytic():
    policy = p1d.StandardGaussian()
    sigma = 0.2
    for delta in [-1.3, -0.05, 0.0, 0.4, 2.0]:
        params = {"sigma": jnp.asarray(sigma, jnp.float32)}
        flat, unravel = ravel_pytree(params)
        logq, grad = jax.value_and_grad(
            lambda fp: policy.log_density(unravel(fp),
                                          jnp.asarray(delta, jnp.float32),
                                          None))(flat)
        analytic_logq = (-delta ** 2 / (2 * sigma ** 2)
                         - 0.5 * np.log(2 * np.pi * sigma ** 2))
        analytic_grad = delta ** 2 / sigma ** 3 - 1.0 / sigma
        np.testing.assert_allclose(float(logq), analytic_logq, rtol=1e-5)
        np.testing.assert_allclose(float(grad[0]), analytic_grad, rtol=1e-4,
                                   atol=1e-6)


def test_pgmc_estimate_hand_check():
    """Fixed action, hand-computed GradientData for the harmonic system."""
    beta, sigma, x0, delta = 2.0, 0.5, 1.0, -0.6
    move = p1d.displacement_move(sigma=sigma)
    state = p1d.Particle1DState(x=jnp.asarray(x0), beta=jnp.asarray(beta),
                                e=jnp.asarray(x0 ** 2))
    flat, unravel = ravel_pytree(move.params)
    gd = pg.pgmc_estimate(move.move, flat, unravel, state,
                          jnp.asarray(delta, jnp.float32))

    xn = x0 + delta
    dlogp = -beta * (xn ** 2 - x0 ** 2)
    # symmetric Gaussian: logq_f == logq_b, so log_ratio == dlogp
    alpha = min(1.0, np.exp(dlogp))
    r = delta ** 2
    j = r * alpha
    glogq = delta ** 2 / sigma ** 3 - 1.0 / sigma   # same fwd and bwd
    np.testing.assert_allclose(float(gd.j), j, rtol=1e-5)
    np.testing.assert_allclose(float(gd.grad_j[0]), j * glogq, rtol=1e-4)
    np.testing.assert_allclose(float(gd.grad_logq_forward[0]), glogq,
                               rtol=1e-4)
    np.testing.assert_allclose(float(gd.g[0, 0]), glogq ** 2, rtol=1e-4)
    assert int(gd.n) == 1


def test_gradient_data_monoid():
    gd1 = pg.init_gradient_data(2)
    gd2 = pg.GradientData(j=jnp.asarray(1.0),
                          grad_j=jnp.asarray([1.0, 2.0]),
                          grad_logq_forward=jnp.asarray([0.5, 0.5]),
                          g=jnp.eye(2), n=jnp.asarray(1, jnp.int32))
    s = pg.add(gd1, pg.add(gd2, gd2))
    assert float(s.j) == 2.0
    assert int(s.n) == 2
    avg = pg.average(s)
    assert float(avg.j) == 1.0
    np.testing.assert_allclose(np.asarray(avg.grad_j), [1.0, 2.0])


def test_optimiser_formulas():
    """One-step hand-check of each update rule vs learning.jl formulas."""
    p = jnp.asarray([0.2])
    gd = pg.GradientData(j=jnp.asarray(0.1),
                         grad_j=jnp.asarray([0.3]),
                         grad_logq_forward=jnp.asarray([0.7]),
                         g=jnp.asarray([[4.0]]),
                         n=jnp.asarray(1, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.Static(), p, gd)), [0.2])
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.VPG(0.1), p, gd)), [0.2 + 0.03],
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.BLPG(0.1), p, gd)),
        [0.2 + 0.1 * (0.3 - 0.1 * 0.7)], rtol=1e-6)
    eta = np.sqrt(2 * 1e-4 / (0.3 ** 2 + 1e-6))
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.BLAPG(1e-4, 1e-6), p, gd)),
        [0.2 + eta * (0.3 - 0.07)], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.NPG(0.1, 1.0), p, gd)),
        [0.2 + 0.1 * 0.3 / 5.0], rtol=1e-6)
    f_inv = 1.0 / 5.0
    eta = np.sqrt(2 * 1e-4 / (0.3 * f_inv * 0.3))
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.ANPG(1e-4, 1.0), p, gd)),
        [0.2 + eta * f_inv * 0.3], rtol=1e-5)
    d = 0.3 - 0.1 * 0.7
    eta = np.sqrt(2 * 1e-4 / (d * f_inv * d))
    np.testing.assert_allclose(
        np.asarray(pg.learning_step(pg.BLANPG(1e-4, 1.0), p, gd)),
        [0.2 + eta * f_inv * d], rtol=1e-5)
