"""Checkerboard cell-list MC (``ops/cell_mc.py``) — the large-N particle
path: bind/unbind correctness, exact incremental-energy bookkeeping, engine
integration via ``Metropolis(fused='cell')``, and statistical agreement with
the O(N)-row generic path (same canonical ensemble)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.models import lennard_jones as lj
from montecarlo_tpu.ops import cell_mc
from montecarlo_tpu.parallel import make_mesh

PARAMS = lj.LJParams()


def _closures():
    pe, rc2, rcut_max = lj.cell_closures(PARAMS)
    return pe, rc2, rcut_max


def test_plan_grid_geometry():
    g = cell_mc.plan_grid(1024, 29.2, rcut=2.5, d_cap=0.45)
    assert g.nc % 2 == 0 and g.nc >= 4
    assert g.w >= 2.5 + 2 * 0.45
    assert g.nc * g.nc * g.cap >= 1024
    with pytest.raises(ValueError):
        cell_mc.plan_grid(64, 8.0, rcut=2.5, d_cap=0.45)  # box too small


def test_bind_unbind_roundtrip():
    st = lj.init_chains(1, 512, rho=1.0, beta=1.0, frac_b=0.2, seed=2,
                        params=PARAMS)
    box = float(st.box[0])
    grid = cell_mc.plan_grid(512, box, rcut=2.5, d_cap=0.45)
    cells = cell_mc.bind_cells(grid, st.pos[0],
                               st.species[0].astype(jnp.float32))
    assert not bool(cells["overflow"])
    assert int(cells["occ"].sum()) == 512
    pos, attr = cell_mc.unbind_cells(cells, 512)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(st.pos[0]))
    np.testing.assert_array_equal(np.asarray(attr),
                                  np.asarray(st.species[0]))


def test_segment_energy_bookkeeping():
    pe, rc2, _ = _closures()
    st = lj.init_chains(2, 512, rho=1.2, beta=1.0 / 0.45, frac_b=0.2,
                        seed=4, params=PARAMS)
    grid = cell_mc.plan_grid(512, float(st.box[0]), rcut=2.5, d_cap=0.45)
    pos, _, e, att, acc, ovf = cell_mc.cell_mc_segment(
        grid, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.08, jax.random.key(0), 100)
    assert not bool(np.any(np.asarray(ovf)))
    assert np.all(np.asarray(att)[:, 0] > 0)
    assert np.all(np.asarray(acc)[:, 0] > 0)
    st2 = dataclasses.replace(st, pos=pos, energy=e)
    e_true = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st2))
    np.testing.assert_allclose(np.asarray(e), e_true, rtol=2e-5, atol=1e-2)


@pytest.fixture(scope="module")
def engine_cell_run(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cellmc"))
    N, M, steps = 512, 8, 40
    chains = lj.init_chains(M, N, rho=1.0, beta=1.0, frac_b=0.2, seed=6,
                            params=PARAMS)
    pool = (lj.lj_displacement_move(0.1, params=PARAMS),)
    mesh = make_mesh(n_devices=8)
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=1, sweepstep=64,
              fused="cell"),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(lj.callback_energy_per_particle,),
              scheduler=np.arange(10, steps + 1, 10))],
        steps, path=path, mesh=mesh)
    sim.run()
    return sim, path, steps


def test_engine_cell_path(engine_cell_run):
    sim, path, steps = engine_cell_run
    met = sim.device_algos[0]
    assert met._use_cell and met.supports_fused
    slc = sim.device_state["metropolis"]
    assert not bool(np.asarray(slc["cell_overflow"]))
    cnt = np.asarray(slc["counters"])
    # substep rounding can overshoot the requested move count slightly
    want = steps * 64
    assert np.all(cnt[:, 0, 1] >= want)
    assert np.all(cnt[:, 0, 1] <= want * 1.5)
    assert np.all(cnt[:, 0, 0] > 0)
    e = np.loadtxt(f"{path}/energy_per_particle.dat")
    assert np.all(np.isfinite(e[:, 1]))


def test_engine_cell_energy_consistent(engine_cell_run):
    sim, _, _ = engine_cell_run
    st = sim.device_state["sys"]
    e_true = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st))
    # refresh hook revalidated at the last observation point
    np.testing.assert_allclose(np.asarray(st.energy), e_true, rtol=1e-5,
                               atol=1e-2)


def test_cell_vs_generic_same_ensemble():
    """Equilibrium e/N from the cell path matches the generic row path
    (both sample the same canonical ensemble)."""
    N, M = 256, 24
    n_att = 6000
    st = lj.init_chains(M, N, rho=1.0, beta=1.0, frac_b=0.0, seed=8,
                        params=PARAMS)
    pe, rc2, _ = _closures()
    grid = cell_mc.plan_grid(N, float(st.box[0]), rcut=2.5, d_cap=0.45)
    per = grid.nc * grid.nc // 4
    pos, _, e, att, _, ovf = cell_mc.cell_mc_segment(
        grid, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.12, jax.random.key(9), n_att // per)
    assert not bool(np.any(np.asarray(ovf)))
    st_c = dataclasses.replace(st, pos=pos, energy=e)
    e_cell = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st_c)) / N

    from montecarlo_tpu.ops.lj_sweep import fused_lj_sweep
    pos_r, e_r, _ = fused_lj_sweep(
        st.pos, st.species, st.beta, st.energy, float(st.box[0]), 0.12,
        17, 0, int(att[0, 0]), params=PARAMS, interpret=True)
    st_r = dataclasses.replace(st, pos=pos_r, energy=e_r)
    e_row = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st_r)) / N

    se = np.sqrt(e_cell.std() ** 2 / M + e_row.std() ** 2 / M)
    assert abs(e_cell.mean() - e_row.mean()) < 4 * se + 0.02, (
        f"cell {e_cell.mean():.4f} vs row {e_row.mean():.4f} (se {se:.4f})")


def test_cell_swap_species_conserved():
    """Within-cell species swaps: composition conserved, cache exact, both
    kinds attempted."""
    pe, rc2, _ = _closures()
    st = lj.init_chains(4, 512, rho=1.2, beta=1.0 / 0.45, frac_b=0.2,
                        seed=11, params=PARAMS)
    grid = cell_mc.plan_grid(512, float(st.box[0]), rcut=2.5, d_cap=0.45)
    pos, attr, e, att, acc, ovf = cell_mc.cell_mc_segment(
        grid, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.08, jax.random.key(1), 400, w_disp=0.6,
        swap_mode="species")
    assert not bool(np.any(np.asarray(ovf)))
    att = np.asarray(att)
    assert np.all(att[:, 0] > 0) and np.all(att[:, 1] > 0)
    assert np.all(np.asarray(acc)[:, 1] > 0)
    species = np.asarray(attr).astype(np.int64)
    np.testing.assert_array_equal(species.sum(axis=1),
                                  np.asarray(st.species).sum(axis=1))
    st2 = dataclasses.replace(st, pos=pos,
                              species=attr.astype(st.species.dtype),
                              energy=e)
    e_true = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st2))
    np.testing.assert_allclose(np.asarray(e), e_true, rtol=2e-5, atol=1e-2)


def test_cell_swap_pair_diameters_conserved():
    """Polydisperse within-cell pair swaps conserve the diameter multiset
    and keep the incremental energy cache exact."""
    from montecarlo_tpu.models import polydisperse as poly

    params = poly.PolyParams()
    pe, rc2, rcut_max = poly.cell_closures(params)
    st = poly.init_chains(4, 512, rho=1.0, beta=1.0, seed=12, params=params)
    grid = cell_mc.plan_grid(512, float(st.box[0]), rcut_max, d_cap=0.45)
    pos, diam, e, att, acc, ovf = cell_mc.cell_mc_segment(
        grid, pe, rc2, st.pos, st.diam, st.beta, st.energy, 0.08,
        jax.random.key(2), 400, w_disp=0.6, swap_mode="pair")
    assert not bool(np.any(np.asarray(ovf)))
    assert np.all(np.asarray(att)[:, 1] > 0)
    d_new = np.sort(np.asarray(diam), axis=1)
    d_old = np.sort(np.asarray(st.diam), axis=1)
    np.testing.assert_allclose(d_new, d_old, rtol=0, atol=0)
    st2 = dataclasses.replace(st, pos=pos, diam=diam, energy=e)
    e_true = np.asarray(jax.lax.map(
        lambda s: poly.total_energy(s, params), st2))
    np.testing.assert_allclose(np.asarray(e), e_true, rtol=2e-5, atol=1e-2)


def test_engine_cell_mixed_pool():
    """Metropolis(fused='cell') on the LJ mixed displacement+swap pool:
    per-move counters split by kind, species conserved end to end."""
    N, M, steps = 512, 4, 24
    chains = lj.init_chains(M, N, rho=1.2, beta=1.0 / 0.45, frac_b=0.2,
                            seed=13, params=PARAMS)
    pool = (lj.lj_displacement_move(0.08, weight=0.7, params=PARAMS),
            lj.lj_swap_move(weight=0.3, params=PARAMS))
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=3, sweepstep=64,
              fused="cell")],
        steps, path="/tmp/mctpu_cell_mixed")
    met = sim.device_algos[0]
    assert met._use_cell and met.supports_fused
    sim.run()
    slc = sim.device_state["metropolis"]
    assert not bool(np.asarray(slc["cell_overflow"]))
    cnt = np.asarray(slc["counters"])
    assert np.all(cnt[:, 0, 1] > 0) and np.all(cnt[:, 1, 1] > 0)
    st = sim.device_state["sys"]
    np.testing.assert_array_equal(
        np.asarray(st.species).sum(axis=1),
        np.asarray(chains.species).sum(axis=1))
    e_true = np.asarray(jax.lax.map(
        lambda s: lj.total_energy(s, PARAMS), st))
    np.testing.assert_allclose(np.asarray(st.energy), e_true, rtol=1e-5,
                               atol=1e-2)


def test_pgmc_composes_with_cell_path():
    """Hybrid advance + cell fast path: PGMC adapts sigma while Metropolis
    runs cell-MC segments between estimator/update events."""
    from montecarlo_tpu import policy_guided as pg
    from montecarlo_tpu.core.simulation import _select_advance

    N, M, steps = 512, 4, 24
    chains = lj.init_chains(M, N, rho=1.0, beta=1.0, frac_b=0.2, seed=15,
                            params=PARAMS)
    pool = (lj.lj_displacement_move(0.05, params=PARAMS),)
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=2, sweepstep=32,
              fused="cell"),
         dict(algorithm=pg.PolicyGradientEstimator,
              dependencies=(mc.Metropolis,), optimisers=(pg.VPG(0.02),),
              q_batch_size=1, scheduler=np.arange(4, steps + 1, 4)),
         dict(algorithm=pg.PolicyGradientUpdate,
              dependencies=(pg.PolicyGradientEstimator,),
              scheduler=np.arange(8, steps + 1, 8))],
        steps, path="/tmp/mctpu_cell_pgmc")
    advance = _select_advance(sim)
    assert "hybrid" in advance.__qualname__
    assert sim.device_algos[0]._use_cell
    sim.run()
    sigma = float(jax.tree_util.tree_leaves(
        sim.device_state["params"][0])[0])
    assert sigma > 0.05 * 1.01   # VPG grew the too-small width
    assert not bool(np.asarray(
        sim.device_state["metropolis"]["cell_overflow"]))


def test_anchor_constraint_invariant():
    """Correctness cornerstone: during a segment no particle ever leaves
    its storage cell's +/- d_cap halo (this is what makes simultaneous
    same-color moves independent and the 3x3 neighbourhood sufficient
    without re-binning)."""
    pe, rc2, _ = _closures()
    st = lj.init_chains(2, 512, rho=1.0, beta=1.0, frac_b=0.2, seed=20,
                        params=PARAMS)
    box = float(st.box[0])
    grid = cell_mc.plan_grid(512, box, rcut=2.5, d_cap=0.45)
    # bind BEFORE the segment to know each particle's storage cell
    cells0 = cell_mc.bind_cells(grid, st.pos[0],
                                st.species[0].astype(jnp.float32))
    pos1, _, _, _, _, _ = cell_mc.cell_mc_segment(
        grid, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.3, jax.random.key(3), 500)   # big sigma stresses it
    # chain 0: map each particle back to its storage cell via idx
    idx = np.asarray(cells0["idx"]).reshape(grid.nc, grid.nc, grid.cap)
    pos1_0 = np.asarray(pos1[0])
    w = grid.w
    for cy in range(grid.nc):
        for cx in range(grid.nc):
            for slot in range(grid.cap):
                p = idx[cy, cx, slot]
                if p >= 512:
                    continue
                x, y = pos1_0[p]
                # compare in unwrapped cell coordinates (min-image to the
                # cell centre handles the box wrap of edge cells)
                ccx, ccy = (cx + 0.5) * w, (cy + 0.5) * w
                dx = (x - ccx + box / 2) % box - box / 2
                dy = (y - ccy + box / 2) % box - box / 2
                assert abs(dx) <= w / 2 + grid.d_cap + 1e-5, (cy, cx, p, dx)
                assert abs(dy) <= w / 2 + grid.d_cap + 1e-5, (cy, cx, p, dy)


def test_fused_cell_unplannable_raises():
    """An explicit fused='cell' request must fail loudly when the cell
    decomposition cannot be planned (here: box too small), not silently
    degrade to the generic path."""
    st = lj.init_chains(4, 32, rho=1.0, beta=1.0, seed=30, params=PARAMS)
    pool = (lj.lj_displacement_move(0.1, params=PARAMS),)
    with pytest.raises(ValueError, match="fused='cell'"):
        mc.Simulation(
            lj.make_system(PARAMS), st,
            [dict(algorithm=mc.Metropolis, pool=pool, seed=1,
                  fused="cell")],
            4, path="/tmp/mctpu_cell_raise")


def test_invalid_bind_is_noop_and_flagged():
    """Capacity overflow / box mismatch: the chain's segment is a no-op
    (state unchanged, zero counters) and the invalid flag is set — no
    silent corruption (particles teleported to the origin)."""
    pe, rc2, _ = _closures()
    st = lj.init_chains(2, 512, rho=1.2, beta=1.0 / 0.45, seed=31,
                        params=PARAMS)
    box = float(st.box[0])
    # capacity 8 << the ~32 mean occupancy: every chain's bind overflows
    bad = cell_mc.CellGrid(nc=4, cap=8, box=box, d_cap=0.45)
    pos, attr, e, att, acc, inv = cell_mc.cell_mc_segment(
        bad, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.08, jax.random.key(0), 50)
    assert bool(np.all(np.asarray(inv)))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(st.pos))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(st.energy))
    np.testing.assert_array_equal(np.asarray(att), 0)

    # box mismatch path: valid capacity but wrong per-chain box
    good = cell_mc.plan_grid(512, box, rcut=2.5, d_cap=0.45)
    pos2, _, _, att2, _, inv2 = cell_mc.cell_mc_segment(
        good, pe, rc2, st.pos, st.species.astype(jnp.float32), st.beta,
        st.energy, 0.08, jax.random.key(0), 50,
        box=jnp.full((2,), box * 1.1, jnp.float32))
    assert bool(np.all(np.asarray(inv2)))
    np.testing.assert_array_equal(np.asarray(pos2), np.asarray(st.pos))


def test_engine_surfaces_invalid_bind():
    """Simulation.run raises when the cell path latched an invalid bind."""
    st = lj.init_chains(2, 512, rho=1.2, beta=1.0 / 0.45, seed=32,
                        params=PARAMS)
    pool = (lj.lj_displacement_move(0.08, params=PARAMS),)
    sim = mc.Simulation(
        lj.make_system(PARAMS), st,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=1, sweepstep=16,
              fused="cell")],
        8, path="/tmp/mctpu_cell_invalid")
    met = sim.device_algos[0]
    # sabotage the plan with an undersized capacity to force overflow
    met._cell_plan = cell_mc.CellGrid(
        nc=met._cell_plan.nc, cap=8, box=met._cell_plan.box,
        d_cap=met._cell_plan.d_cap)
    with pytest.raises(RuntimeError, match="invalid"):
        sim.run()


def test_hard_disk_cell_path():
    """Hard disks through the cell path: accept-iff-overlap-free via the
    finite energy wall, overlap-free invariant preserved, uniform-square
    proposal matching the pool's convention."""
    from montecarlo_tpu.models import hard_disks as hd

    N, M, steps = 2048, 4, 30
    chains = hd.init_chains(M, N, eta=0.70, seed=40)
    pool = (hd.displacement_move(0.12),)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=5, sweepstep=128,
              fused="cell"),
         dict(algorithm=mc.StoreCallbacks, callbacks=(hd.callback_psi6,),
              scheduler=np.arange(10, steps + 1, 10))],
        steps, path="/tmp/mctpu_hd_cell")
    met = sim.device_algos[0]
    assert met._use_cell and met._cell_model[2] == "hd"
    assert met._cell_model[6] == "square"
    sim.run()
    slc = sim.device_state["metropolis"]
    assert not bool(np.asarray(slc["cell_overflow"]))
    cnt = np.asarray(slc["counters"])
    rate = cnt[:, 0, 0].sum() / cnt[:, 0, 1].sum()
    assert 0.1 < rate < 0.99, rate
    ok = np.asarray(jax.vmap(hd.overlap_free)(sim.device_state["sys"]))
    assert ok.all(), "cell path produced hard-core overlaps"
    p6 = np.loadtxt("/tmp/mctpu_hd_cell/psi6.dat")
    assert np.all((p6[:, 1] >= 0) & (p6[:, 1] <= 1))


def test_auto_cell_disabled_with_volume_moves():
    """fused='auto' never engages the static-grid cell path when ANY
    algorithm in the simulation carries volume moves — the generic path
    samples NPT correctly, a frozen grid cannot."""
    N, M = 2048, 2
    chains = lj.init_chains(M, N, rho=0.7, beta=1.0, seed=41,
                            params=PARAMS)
    pool = (lj.lj_displacement_move(0.1, weight=0.95, params=PARAMS),
            lj.lj_volume_move(dlnv=0.02, pressure=1.0, weight=0.05,
                              params=PARAMS))
    sim = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=1)],
        4, path="/tmp/mctpu_cell_vol")
    met = sim.device_algos[0]
    assert not met._use_cell and not met.supports_fused

    # displacement-only pool at the same N: auto-cell engages
    sim2 = mc.Simulation(
        lj.make_system(PARAMS), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(lj.lj_displacement_move(0.1, params=PARAMS),),
              seed=1)],
        4, path="/tmp/mctpu_cell_vol2")
    assert sim2.device_algos[0]._use_cell
