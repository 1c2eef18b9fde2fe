"""2-D Ising checkerboard throughput: spin-flip attempts/s/chip.

Measures the production engine path (the compiled ``_make_advance`` loop the
orchestrator runs between sync points) for whole-lattice checkerboard sweeps.
Each simulation step performs ``sweeps * L^2`` Metropolis attempts per chain
as fused (chains, L, L) vector ops.

Usage: python tools/bench_ising2d.py [n_chains] [L] [sweeps] [steps]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(n_chains=1024, size=64, sweeps=4, n_steps=200, repeats=3):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import ising2d

    chains = ising2d.init_chains(n_chains, size, beta=0.44, seed=42)
    sim = mc.Simulation(
        ising2d.make_system(), chains,
        [dict(algorithm=ising2d.CheckerboardMetropolis, sweeps=sweeps,
              seed=42)],
        n_steps, path="/tmp/mctpu_bench_ising2d")
    ds = sim.init_device_state()
    masks = tuple(jnp.ones(n_steps + 1, bool) for _ in sim.device_algos)
    advance = jax.jit(_select_advance(sim))

    out = advance(ds, masks, n_steps)   # compile + warm
    float(out["sys"].energy.sum())

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = advance(ds, masks, n_steps)
        float(out["sys"].energy.sum())  # force sync
        best = min(best, time.perf_counter() - t0)
    return n_chains * size * size * sweeps * n_steps / best


def main():
    args = [int(a) for a in sys.argv[1:]]
    rate = bench(*args)
    print(json.dumps({
        "metric": "ising2d_checkerboard_flip_attempts_per_sec_per_chip",
        "value": round(rate),
        "unit": "attempts/s",
    }))


if __name__ == "__main__":
    main()
