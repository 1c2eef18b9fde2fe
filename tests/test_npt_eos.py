"""NPT vs NVT equation-of-state cross-check (interacting ground truth).

Closes the loop the ideal-gas gate (``test_npt.py``) leaves open: measure the
virial pressure P(rho) of an interacting LJ fluid in NVT, then run NPT at
that pressure and require <rho> to come back to the NVT density within
Monte-Carlo error.  Also smoke-tests the NPT variant of the polydisperse
swap-MC glass protocol (constant-pressure swap MC).
"""

import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj
from montecarlo_tpu.models import polydisperse as poly

# single-species LJ (A-A only): supercritical at T=1, rho=0.6 — no phase
# coexistence to trap the NPT volume sampling
N, RHO, BETA = 48, 0.60, 1.0
PARAMS = lj.LJParams()


def callback_pressure(view):
    return lj.callback_pressure(view, PARAMS)


@pytest.fixture(scope="module")
def p_nvt():
    chains = lj.init_chains(64, N, rho=RHO, beta=BETA, frac_b=0.0, seed=9,
                            params=PARAMS)
    pool = (lj.lj_displacement_move(0.25, params=PARAMS),)
    steps = 800
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=3, sweepstep=8,
              fused="off"),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(callback_pressure,),
              scheduler=np.arange(10, steps + 1, 10))],
        steps, path="/tmp/mctpu_eos_nvt")
    sim.run()
    d = np.loadtxt("/tmp/mctpu_eos_nvt/pressure.dat")
    tail = d[d[:, 0] > steps // 3, 1]
    return float(tail.mean()), float(tail.std(ddof=1) / np.sqrt(len(tail)))


def test_npt_density_matches_nvt_pressure(p_nvt):
    p_target, p_se = p_nvt
    assert np.isfinite(p_target) and p_target > 0
    chains = lj.init_chains(64, N, rho=RHO, beta=BETA, frac_b=0.0, seed=21,
                            params=PARAMS)
    pool = (lj.lj_displacement_move(0.25, weight=0.95, params=PARAMS),
            lj.lj_volume_move(dlnv=0.04, pressure=p_target, weight=0.05,
                              params=PARAMS))
    steps = 1600
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=5, sweepstep=8),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(lj.callback_density,),
              scheduler=np.arange(10, steps + 1, 10))],
        steps, path="/tmp/mctpu_eos_npt")
    sim.run()
    d = np.loadtxt("/tmp/mctpu_eos_npt/density.dat")
    rho_tail = d[d[:, 0] > steps // 2, 1]
    rho_mean = rho_tail.mean()
    # NPT <rho> at P(rho_NVT) must reproduce rho_NVT.  Tolerance: MC error
    # on both sides plus compressibility amplification of the P uncertainty.
    assert rho_mean == pytest.approx(RHO, rel=0.05), (
        f"NPT <rho> = {rho_mean:.4f} at P = {p_target:.4f} ± {p_se:.4f} "
        f"vs NVT rho = {RHO}")


def test_poly_npt_swap_protocol():
    """Constant-pressure swap MC (NPT glass protocol): box responds, energy
    cache stays exact, swaps and volume moves both accepted."""
    import jax

    params = poly.PolyParams()
    chains = poly.init_chains(16, 32, rho=1.0, beta=1.0, seed=13,
                              params=params)
    pool = (poly.displacement_move(0.12, weight=0.7, params=params),
            poly.swap_move(weight=0.2, params=params),
            poly.volume_move(dlnv=0.04, pressure=4.0, weight=0.1,
                             params=params))
    steps = 400
    sim = mc.Simulation(
        poly.make_system(params), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=17),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(poly.callback_density,),
              scheduler=np.arange(20, steps + 1, 20))],
        steps, path="/tmp/mctpu_poly_npt")
    sim.run()
    st = sim.device_state["sys"]
    fresh = np.asarray(jax.vmap(
        lambda s: poly.total_energy(s, params))(st))
    np.testing.assert_allclose(np.asarray(st.energy), fresh, rtol=2e-3,
                               atol=5e-2)
    box0 = float(poly.init_chains(1, 32, rho=1.0, beta=1.0,
                                  params=params).box[0])
    assert not np.allclose(np.asarray(st.box), box0, rtol=1e-4)
    cnt = np.asarray(sim.device_state["metropolis"]["counters"])
    rates = cnt[..., 0].sum(0) / np.maximum(cnt[..., 1].sum(0), 1)
    assert np.all(rates > 0.01), rates
    d = np.loadtxt("/tmp/mctpu_poly_npt/density.dat")
    assert np.all(np.isfinite(d[:, 1]))
