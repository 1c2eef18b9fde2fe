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


def bench_adaptive(n_chains, n_particles, n_sweeps):
    """Mixed LJ pool + PGMC adaptation through the hybrid advance (BASELINE
    config 5) — compare against :func:`bench` mixed for the adaptive tax."""
    import numpy as np

    import montecarlo_tpu as mc
    from montecarlo_tpu import policy_guided as pg
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import lennard_jones as lj

    params = lj.LJParams()
    chains = lj.init_chains(n_chains, n_particles, rho=0.7, beta=1.0,
                            frac_b=0.2, seed=42, params=params)
    pool = (lj.lj_displacement_move(0.1, weight=0.8, params=params),
            lj.lj_swap_move(weight=0.2, params=params))
    sim = mc.Simulation(
        lj.make_system(params), chains,
        [dict(algorithm=mc.Metropolis, pool=pool, seed=42,
              sweepstep=n_particles),
         dict(algorithm=pg.PolicyGradientEstimator,
              dependencies=(mc.Metropolis,),
              optimisers=(pg.VPG(0.001), pg.Static()), q_batch_size=2,
              scheduler=np.arange(10, n_sweeps + 1, 10)),
         dict(algorithm=pg.PolicyGradientUpdate,
              dependencies=(pg.PolicyGradientEstimator,),
              scheduler=np.arange(20, n_sweeps + 1, 20))],
        n_sweeps, path="/tmp/mctpu_lj_bench_pgmc")
    ds = sim.init_device_state()
    advance = _select_advance(sim)
    assert "hybrid" in advance.__qualname__, advance.__qualname__
    masks = []
    for a in sim.device_algos:
        i = sim.algorithms.index(a)
        m = jnp.zeros(n_sweeps + 1, bool)
        m = m.at[jnp.asarray(sim.schedulers[i])].set(True)
        masks.append(m)
    adv = jax.jit(advance)
    out = adv(ds, tuple(masks), n_sweeps)
    float(out["sys"].energy.sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, tuple(masks), n_sweeps)
        float(out["sys"].energy.sum())
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_sweeps * n_particles / best


# VPU-work model for the utilization estimate: per displacement attempt the
# kernel does ~2 row passes x ~15 arithmetic ops per (pair) element over N
# rows (min-image, r^2, reciprocal-powers, select-accumulate), plus ~40
# O(B)-wide proposal/accept ops that vanish at large N.
_FLOPS_PER_ATTEMPT_PER_ROW = 2 * 15
# TPU v5e VPU: 4 MXU-independent vector units x (8x128) lanes x ~940 MHz
# ~= 1.9 Tf32op/s (order-of-magnitude anchor for the roofline argument).
_VPU_PEAK_F32 = 1.9e12


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sweep = "--sweep" in sys.argv
    out = {"metric": "lj_mc_moves_per_sec_per_chip", "unit": "moves/s"}

    r256 = bench(n_chains, 256, mixed=False, n_sweeps=200)
    print(f"LJ N=256 local: {r256 / 1e6:.2f} M moves/s", file=sys.stderr)
    r1024 = bench(max(n_chains // 4, 8), 1024, mixed=True, n_sweeps=50)
    print(f"LJ N=1024 mixed: {r1024 / 1e6:.2f} M moves/s", file=sys.stderr)
    rpoly = bench_poly(max(n_chains // 4, 8), 256, n_sweeps=100)
    print(f"poly N=256 swap-MC: {rpoly / 1e6:.2f} M moves/s",
          file=sys.stderr)
    radapt = bench_adaptive(max(n_chains // 4, 8), 1024, n_sweeps=200)
    print(f"LJ N=1024 mixed+PGMC (hybrid): {radapt / 1e6:.2f} M moves/s "
          f"({r1024 / radapt:.2f}x tax vs non-adaptive)", file=sys.stderr)
    out.update(n256_local=round(r256), n1024_mixed=round(r1024),
               poly_n256_mixed=round(rpoly),
               n1024_mixed_pgmc_hybrid=round(radapt),
               adaptive_tax_x=round(r1024 / radapt, 3))

    if sweep:
        # chain-scaling study: where does the chip saturate?
        scaling = {}
        for m in (64, 256, 1024, 4096):
            r = bench(m, 1024, mixed=False, n_sweeps=max(6400 // m, 25))
            util = r * 1024 * _FLOPS_PER_ATTEMPT_PER_ROW / _VPU_PEAK_F32
            scaling[m] = {"moves_per_sec": round(r),
                          "vpu_utilization_est": round(util, 3)}
            print(f"  N=1024 local x {m} chains: {r / 1e6:.2f} M moves/s "
                  f"(~{util * 100:.0f}% VPU)", file=sys.stderr)
        out["n1024_local_chain_scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
