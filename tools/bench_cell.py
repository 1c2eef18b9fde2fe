"""Cell-MC vs row-kernel throughput (large-N particle path).

Measures LJ displacement moves/s/chip for the O(N)-row Pallas kernel and the
checkerboard cell-MC path at N = 1024 and N = 4096.  The row kernel's
per-move cost is O(N); the cell path's is O(9C) (N-independent at fixed
density), so the crossover makes N >= ~2k ParticlesMC-scale systems viable.

Usage: python tools/bench_cell.py [n_chains]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup(n_chains, n_particles, rho=1.2):
    from montecarlo_tpu.models import lennard_jones as lj
    params = lj.LJParams()
    st = lj.init_chains(n_chains, n_particles, rho=rho, beta=1.0 / 0.45,
                        frac_b=0.2, seed=42, params=params)
    return st, params


def bench_row(st, params, n_moves, block_chains):
    from montecarlo_tpu.ops.lj_sweep import fused_lj_sweep
    box = float(st.box[0])

    def run():
        pos, e, acc = fused_lj_sweep(
            st.pos, st.species, st.beta, st.energy, box, 0.08, 42, 0,
            n_moves, params=params, block_chains=block_chains)
        float(e.sum())  # scalar readback forces sync on the axon tunnel

    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return st.pos.shape[0] * n_moves / best


def bench_cell(st, params, n_substeps):
    from montecarlo_tpu.models.lennard_jones import cell_closures
    from montecarlo_tpu.ops import cell_mc
    pe, rc2, rcut_max = cell_closures(params)
    n = st.pos.shape[1]
    grid = cell_mc.plan_grid(n, float(st.box[0]), rcut_max)
    attr = st.species.astype(jnp.float32)
    att_total = {}

    def run():
        pos, _, e, _, att, acc, ovf = cell_mc.cell_mc_segment(
            grid, pe, rc2, st.pos, attr, st.beta, st.energy, 0.08,
            jax.random.key(0), n_substeps, box=st.box)
        float(e.sum())
        att_total["n"] = int(jnp.sum(att))
        att_total["ovf"] = bool(jnp.any(ovf))

    run()
    assert not att_total["ovf"], "cell capacity overflow"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return att_total["n"] / best, grid


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = {"metric": "lj_cell_vs_row_moves_per_sec", "unit": "moves/s",
           "n_chains": m}
    for n, row_moves, row_bc, sub in ((1024, 4096, 256, 2000),
                                      (4096, 1024, 64, 2000)):
        st, params = _setup(m, n)
        r_row = bench_row(st, params, row_moves, row_bc)
        r_cell, grid = bench_cell(st, params, sub)
        print(f"N={n}: row {r_row / 1e6:.2f} M moves/s | cell "
              f"{r_cell / 1e6:.2f} M moves/s ({r_cell / r_row:.2f}x) "
              f"[{grid!r}]", file=sys.stderr)
        out[f"n{n}"] = {"row": round(r_row), "cell": round(r_cell),
                        "speedup_x": round(r_cell / r_row, 2),
                        "grid": repr(grid)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
