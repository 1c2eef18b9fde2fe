"""Lennard-Jones throughput benchmark (BASELINE configs 4-5).

Measures MC move attempts/s/chip for the 2-D LJ system with local
displacement moves (N=256 by default) and for the mixed displacement+swap
pool (N=1024), chains vmapped on one chip.

Usage:  python tools/bench_lj.py [n_chains]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(n_chains, n_particles, mixed, n_sweeps):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import lennard_jones as lj

    params = lj.LJParams()
    chains = lj.init_chains(n_chains, n_particles, rho=0.7, beta=1.0,
                            frac_b=0.2, seed=42, params=params)
    if mixed:
        pool = (lj.lj_displacement_move(0.1, weight=0.8, params=params),
                lj.lj_swap_move(weight=0.2, params=params))
    else:
        pool = (lj.lj_displacement_move(0.1, params=params),)
    sim = mc.Simulation(
        lj.make_system(params), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=42,
              sweepstep=n_particles)],
        n_sweeps, path="/tmp/mctpu_lj_bench")
    ds = sim.init_device_state()
    masks = (jnp.ones(n_sweeps + 1, bool),)
    adv = jax.jit(_select_advance(sim))  # fused Pallas path when eligible
    out = adv(ds, masks, n_sweeps)
    float(out["sys"].energy.sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, masks, n_sweeps)
        float(out["sys"].energy.sum())
        best = min(best, time.perf_counter() - t0)
    moves = n_chains * n_sweeps * n_particles
    return moves / best


def bench_poly(n_chains, n_particles, n_sweeps):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import polydisperse as poly

    params = poly.PolyParams()
    chains = poly.init_chains(n_chains, n_particles, rho=0.9, beta=2.0,
                              seed=42, params=params)
    pool = (poly.displacement_move(0.1, weight=0.8, params=params),
            poly.swap_move(weight=0.2, params=params))
    sim = mc.Simulation(
        poly.make_system(params), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=42,
              sweepstep=n_particles)],
        n_sweeps, path="/tmp/mctpu_poly_bench")
    ds = sim.init_device_state()
    masks = (jnp.ones(n_sweeps + 1, bool),)
    adv = jax.jit(_select_advance(sim))
    out = adv(ds, masks, n_sweeps)
    float(out["sys"].energy.sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, masks, n_sweeps)
        float(out["sys"].energy.sum())
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_sweeps * n_particles / best


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    r256 = bench(n_chains, 256, mixed=False, n_sweeps=200)
    print(f"LJ N=256 local: {r256 / 1e6:.2f} M moves/s", file=sys.stderr)
    r1024 = bench(max(n_chains // 4, 8), 1024, mixed=True, n_sweeps=50)
    print(f"LJ N=1024 mixed: {r1024 / 1e6:.2f} M moves/s", file=sys.stderr)
    rpoly = bench_poly(max(n_chains // 4, 8), 256, n_sweeps=100)
    print(f"poly N=256 swap-MC: {rpoly / 1e6:.2f} M moves/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "lj_mc_moves_per_sec_per_chip",
        "n256_local": round(r256),
        "n1024_mixed": round(r1024),
        "poly_n256_mixed": round(rpoly),
        "unit": "moves/s",
    }))


if __name__ == "__main__":
    main()
