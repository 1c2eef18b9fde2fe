"""3-D Lennard-Jones through the generic engine (dimension-general model).

The particle protocol is dimension-agnostic; ``init_chains(dim=3)`` builds a
cubic lattice and every move/observable reads the spatial dimension from the
state.  Gates: exact ideal-gas NPT identity in 3-D, energy-cache exactness
under displacement+swap, NVT virial pressure sane, and the 2-D-only fast
paths refusing a 3-D state.
"""

import dataclasses

import jax
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj

IDEAL = lj.LJParams(eps=((0.0, 0.0), (0.0, 0.0)))
PARAMS = lj.LJParams()


def test_3d_init_geometry():
    st = lj.init_chains(3, 100, rho=0.8, beta=1.0, dim=3, params=PARAMS)
    assert st.pos.shape == (3, 100, 3)
    box = float(st.box[0])
    assert box == pytest.approx((100 / 0.8) ** (1 / 3))
    assert np.all(np.asarray(st.pos) >= 0) and np.all(
        np.asarray(st.pos) <= box)
    # cache matches a fresh recompute at init
    e_true = np.asarray(jax.vmap(
        lambda s: lj.total_energy(s, PARAMS))(st))
    np.testing.assert_allclose(np.asarray(st.energy), e_true, rtol=1e-5)


def test_3d_ideal_gas_npt_exact():
    """<V> = (N + 1)/(beta P) holds exactly in any dimension."""
    n, beta, pressure = 16, 1.0, 0.5
    chains = lj.init_chains(128, n, rho=0.5, beta=beta, seed=3, dim=3,
                            params=IDEAL)
    pool = (lj.lj_volume_move(dlnv=0.3, pressure=pressure, params=IDEAL),)
    steps = 4000
    sim = mc.Simulation(
        lj.make_system(IDEAL), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=7)],
        steps, path="/tmp/mctpu_npt3d_ideal")
    sim.run()
    v = np.asarray(sim.device_state["sys"].box, np.float64) ** 3
    np.testing.assert_allclose(v.mean(), (n + 1) / (beta * pressure),
                               rtol=0.06)


def test_3d_nvt_mixed_pool_cache_and_pressure():
    chains = lj.init_chains(16, 64, rho=0.7, beta=1.0, frac_b=0.2, seed=5,
                            dim=3, params=PARAMS)
    pool = (lj.lj_displacement_move(0.15, weight=0.9, params=PARAMS),
            lj.lj_swap_move(weight=0.1, params=PARAMS))
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=11, sweepstep=8)],
        300, path="/tmp/mctpu_lj3d_nvt")
    met = sim.device_algos[0]
    assert not met.supports_fused          # 2-D-only fast paths refuse 3-D
    assert met._cell_plan is None
    sim.run()
    st = sim.device_state["sys"]
    fresh = np.asarray(jax.vmap(
        lambda s: lj.total_energy(s, PARAMS))(st))
    np.testing.assert_allclose(np.asarray(st.energy), fresh, rtol=2e-3,
                               atol=5e-2)
    cnt = np.asarray(sim.device_state["metropolis"]["counters"])
    rates = cnt[..., 0].sum(0) / cnt[..., 1].sum(0)
    assert 0.05 < rates[0] < 0.99
    p = float(np.mean(jax.vmap(
        lambda s: lj.virial_pressure(s, PARAMS))(st)))
    assert np.isfinite(p)


def test_3d_trajectory_format_roundtrip(tmp_path):
    chains = lj.init_chains(2, 27, rho=0.6, beta=1.0, dim=3, params=PARAMS)
    pool = (lj.lj_displacement_move(0.1, params=PARAMS),)
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=1),
         dict(algorithm=mc.StoreTrajectories, scheduler=np.asarray([5]))],
        5, path=str(tmp_path))
    sim.run()
    lines = open(tmp_path / "trajectories" / "1"
                 / "trajectory.dat").read().strip().splitlines()
    assert len(lines) == 2 * 28             # t=0 + t=5 frames, 28 lines each
    assert len(lines[1].split()) == 4       # species + 3 coordinates
