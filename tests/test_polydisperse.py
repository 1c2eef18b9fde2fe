"""Polydisperse soft spheres + swap MC.

Gates: smoothing coefficients make the potential C2 at the cut; diameter
sampling follows the P(d) ~ d^-3 law; incremental energies stay consistent
through displacement and diameter-swap moves; and — the ensemble gate —
displacement-only and displacement+swap runs sample the SAME canonical
ensemble, so their equilibrium energies agree while diameters demonstrably
migrate under swap.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.models import polydisperse as poly


def test_smoothing_is_c2_at_cut():
    p = poly.PolyParams()
    c0, c2, c4 = p.coeffs()
    xc = p.xc
    u = lambda x: x ** -12 + c0 + c2 * x ** 2 + c4 * x ** 4
    du = lambda x: -12 * x ** -13 + 2 * c2 * x + 4 * c4 * x ** 3
    d2u = lambda x: 156 * x ** -14 + 2 * c2 + 12 * c4 * x ** 2
    assert abs(u(xc)) < 1e-12
    assert abs(du(xc)) < 1e-12
    assert abs(d2u(xc)) < 1e-10
    # repulsive at contact
    assert u(1.0) > 0.5


def test_diameter_distribution():
    p = poly.PolyParams()
    d = poly.sample_diameters(200_000, p, seed=1)
    assert d.min() >= p.d_min and d.max() <= p.d_max
    # analytic mean of P(d) = C d^-3 on [a, b]:
    # C = 2/(a^-2 - b^-2), <d> = C (a^-1 - b^-1)
    a, b = p.d_min, p.d_max
    mean = 2 * (a ** -1 - b ** -1) / (a ** -2 - b ** -2)
    np.testing.assert_allclose(d.mean(), mean, rtol=5e-3)


def _build(n_chains, swap, steps, seed=9):
    p = poly.PolyParams()
    chains = poly.init_chains(n_chains, 32, rho=0.9, beta=1.0, seed=5,
                              params=p)
    if swap:
        pool = (poly.displacement_move(0.12, weight=0.8, params=p),
                poly.swap_move(weight=0.2, params=p))
    else:
        pool = (poly.displacement_move(0.12, weight=1.0, params=p),)
    times = mc.build_schedule(steps, steps // 2, 10)
    sim = mc.Simulation(
        poly.make_system(p), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, sweepstep=32, seed=seed),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(poly.callback_energy_per_particle,),
              scheduler=times)],
        steps, path=f"/tmp/mctpu_test_poly_{swap}")
    return sim, p


def test_cache_consistency_through_mixed_moves():
    sim, p = _build(8, swap=True, steps=60)
    sim.run()
    st = sim.device_state["sys"]
    fresh = np.asarray(jax.vmap(lambda s: poly.total_energy(s, p))(st))
    np.testing.assert_allclose(np.asarray(st.energy), fresh, rtol=2e-3,
                               atol=5e-2)
    # composition is conserved by swaps (diameter multiset unchanged)
    d0 = np.sort(np.asarray(
        poly.init_chains(8, 32, rho=0.9, beta=1.0, seed=5, params=p).diam),
        axis=1)
    d1 = np.sort(np.asarray(st.diam), axis=1)
    np.testing.assert_allclose(d1, d0, rtol=1e-6)
    # but diameters actually migrated between sites
    d_start = np.asarray(
        poly.init_chains(8, 32, rho=0.9, beta=1.0, seed=5, params=p).diam)
    assert not np.allclose(np.asarray(st.diam), d_start)


def test_swap_and_noswap_sample_same_ensemble():
    """Both pools target the same canonical distribution; equilibrium
    energy per particle must agree (swap only accelerates relaxation)."""
    steps = 300
    sim_a, _ = _build(24, swap=False, steps=steps, seed=9)
    sim_a.run()
    sim_b, _ = _build(24, swap=True, steps=steps, seed=31)
    sim_b.run()
    import os
    ea = np.loadtxt("/tmp/mctpu_test_poly_False/energy_per_particle.dat")
    eb = np.loadtxt("/tmp/mctpu_test_poly_True/energy_per_particle.dat")
    ta = ea[ea[:, 0] >= steps // 2, 1].mean()
    tb = eb[eb[:, 0] >= steps // 2, 1].mean()
    np.testing.assert_allclose(ta, tb, rtol=0.05)
    # swap acceptance is nonzero and sane
    cnt = np.asarray(sim_b.device_state["metropolis"]["counters"])
    swap_acc = cnt[:, 1, 0].sum() / cnt[:, 1, 1].sum()
    assert 0.01 < swap_acc < 0.9


def test_poly_3d_glass_protocol():
    """3-D polydisperse soft spheres (the standard 3-D swap-MC glass
    former): displacement + swap pool through the 3-D cell path, energy
    cache exact, diameters conserved."""
    import dataclasses
    par = poly.PolyParams()
    N, M, steps = 4096, 2, 10
    chains = poly.init_chains(M, N, rho=1.0, beta=1.0 / 0.4, seed=70,
                              params=par, dim=3)
    pool = (poly.displacement_move(0.06, weight=0.8, params=par),
            poly.swap_move(weight=0.2, params=par))
    sim = mc.Simulation(
        poly.make_system(par), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=5, sweepstep=256)],
        steps, path="/tmp/mctpu_poly3d")
    met = sim.device_algos[0]
    assert met._use_cell and met._cell_plan.dim == 3, met._cell_plan_error
    sim.run()
    slc = sim.device_state["metropolis"]
    assert not bool(np.asarray(slc["cell_overflow"]))
    cnt = np.asarray(slc["counters"])
    assert cnt[:, 0, 0].sum() > 0 and cnt[:, 1, 0].sum() > 0
    st = sim.device_state["sys"]
    d_new = np.sort(np.asarray(st.diam), axis=1)
    d_old = np.sort(np.asarray(chains.diam), axis=1)
    np.testing.assert_allclose(d_new, d_old, rtol=0, atol=0)
    e_true = np.asarray(jax.lax.map(
        lambda s: poly.total_energy(s, par), st))
    np.testing.assert_allclose(np.asarray(st.energy), e_true, rtol=1e-3,
                               atol=0.5)
