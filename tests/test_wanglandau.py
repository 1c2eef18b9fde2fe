"""Wang–Landau density-of-states estimation, checked against exact
enumeration of the 4x4 periodic Ising lattice (2^16 states).

The reference has no flat-histogram capability; the correctness gate here is
the strongest available — the estimated log g(E) and the canonical moments
derived from it must match the exactly enumerated density of states.
"""

import numpy as np
import jax.numpy as jnp

import montecarlo_tpu as mc
from montecarlo_tpu.core.wanglandau import (_flatness, mean_log_g, reweight)
from montecarlo_tpu.models import ising2d


def test_flatness_ignores_unvisited_bins():
    h = jnp.asarray([[100, 0, 90, 110, 0]], jnp.int32)
    f = np.asarray(_flatness(h))
    assert np.isclose(f[0], 90.0 / 100.0)


def test_flatness_zero_when_empty():
    h = jnp.zeros((2, 5), jnp.int32)
    assert np.allclose(np.asarray(_flatness(h)), 0.0)


def test_refine_halves_only_flat_chains():
    sim = _make_sim(steps=1, n_chains=2)
    walker = sim.algorithms[0]
    refine = sim.algorithms[1]
    slc = walker.init_state(sim)
    # chain 0 flat, chain 1 not
    hist = np.zeros((2, walker.model.n_bins), np.int32)
    hist[0, :3] = [100, 95, 105]
    hist[1, :3] = [100, 5, 100]
    slc = {**slc, "hist": jnp.asarray(hist)}
    out = refine._refine(slc)
    log_f = np.asarray(out["log_f"])
    assert np.isclose(log_f[0], 0.5) and np.isclose(log_f[1], 1.0)
    assert np.asarray(out["hist"])[0].sum() == 0
    assert np.asarray(out["hist"])[1].sum() == 205


def _make_sim(steps, n_chains, seed=3, tmp="/tmp/mctpu_wl", interval=250):
    system = ising2d.make_system()
    chains = ising2d.init_chains(n_chains, size=4, beta=1.0, seed=seed)
    model = ising2d.wl_model(4)
    refine_sched = np.arange(interval, steps + 1, interval, dtype=np.int64)
    return mc.Simulation(
        system, chains,
        [dict(algorithm=mc.WangLandau, model=model, moves_per_step=16,
              seed=seed),
         dict(algorithm=mc.WangLandauRefine, flatness=0.8, log_f_min=1e-4,
              dependencies=(mc.WangLandau,),
              scheduler=refine_sched if len(refine_sched) else None)],
        steps, path=tmp)


def test_wl_matches_exact_density_of_states(tmp_path):
    steps = 60_000  # x16 moves/step ~ 1M proposals per walker
    sim = _make_sim(steps=steps, n_chains=4, tmp=str(tmp_path))
    sim.run()

    slc = sim.device_state["wang_landau"]
    # convergence: every walker refined well past the initial factor
    assert float(np.max(np.asarray(slc["log_f"]))) < 0.01

    # ground level (bin 0) has exactly 2 states
    log_g, support = mean_log_g(slc, anchor_bin=0, anchor_log_g=np.log(2.0))
    exact = ising2d.exact_log_g(4)
    exact_support = np.isfinite(exact)
    # the walkers must have discovered the full reachable support
    assert np.array_equal(support, exact_support)

    err = np.abs(log_g[support] - exact[support])
    assert err.max() < 0.35, f"max |dlog g| = {err.max()}"

    # canonical moments from the estimated g(E) vs from the exact one
    energies = ising2d.wl_bin_energies(4)
    for beta in (0.2, 0.4406868, 1.0):
        _, e_wl, var_wl = reweight(log_g, energies, beta)
        _, e_ex, var_ex = reweight(exact, energies, beta)
        assert abs(e_wl - e_ex) / abs(e_ex) < 0.02
        # specific heat (beta^2 var E) is the hardest derived quantity
        assert abs(var_wl - var_ex) / max(var_ex, 1.0) < 0.12


def test_wl_summary_written(tmp_path):
    sim = _make_sim(steps=250, n_chains=2, tmp=str(tmp_path), interval=250)
    sim.run()
    text = (tmp_path / "summary.log").read_text()
    assert "WangLandau" in text and "WangLandauRefine" in text
    assert "Flatness criterion" in text
