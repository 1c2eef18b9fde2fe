"""Chain-scaling efficiency benchmark (1 -> N devices).

BASELINE target: ~linear chain-scaling efficiency.  On a real pod slice this
measures chips/hosts; in the sandbox it runs on N virtual CPU devices
(``--xla_force_host_platform_device_count``), which demonstrates the sharded
program and the measurement harness — virtual devices share host cores, so
the absolute efficiency here under-reports real-chip scaling.

Weak scaling: chains per device held constant; efficiency(n) =
rate(n) / (n * rate(1)).

Usage:  python tools/bench_scaling.py [chains_per_device] [n_steps]
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rate(n_dev, chains_per_dev, n_steps, recorders=False):
    """Weak-scaling rate; ``recorders=True`` measures the PRODUCTION
    buffered-chunk recorder path over the mesh (Simulation.run with
    StoreCallbacks + StoreTrajectories at stride n_steps/100) instead of
    the bare advance — the with-recorders column VERDICT r4 item 7 asked
    for."""
    import numpy as np
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _make_advance
    from montecarlo_tpu.models import particle1d as p1d
    from montecarlo_tpu.parallel import make_mesh, shard_device_state

    devices = jax.devices("cpu")[:n_dev]
    m = chains_per_dev * n_dev
    chains = p1d.init_chains(m, beta=2.0, seed=42)
    mesh = make_mesh(devices=devices)
    if recorders:
        import shutil
        path = "/tmp/mctpu_scaling_rec"
        stride = max(1, n_steps // 100)
        sched = np.arange(stride, n_steps + 1, stride)

        def build():
            return mc.Simulation(
                p1d.make_system(), chains,
                [dict(algorithm=mc.Metropolis,
                      pool=(p1d.displacement_move(sigma=0.5),), seed=42),
                 dict(algorithm=mc.StoreCallbacks,
                      callbacks=(p1d.callback_energy,
                                 mc.callback_acceptance),
                      scheduler=sched),
                 dict(algorithm=mc.StoreTrajectories, fmt=mc.BIN(),
                      scheduler=sched)],
                n_steps, path=path, mesh=mesh)

        shutil.rmtree(path, ignore_errors=True)
        build().run()      # compile warm-up
        best = float("inf")
        for _ in range(2):
            shutil.rmtree(path, ignore_errors=True)
            sim = build()
            t0 = time.perf_counter()
            sim.run()
            best = min(best, time.perf_counter() - t0)
        return m * n_steps / best

    sim = mc.Simulation(
        p1d.make_system(), chains,
        [dict(algorithm=mc.Metropolis,
              pool=(p1d.displacement_move(sigma=0.5),), seed=42)],
        n_steps, path="/tmp/mctpu_scaling")
    ds = sim.init_device_state()
    ds = shard_device_state(ds, mesh, m)
    masks = (jax.device_put(jnp.ones(n_steps + 1, bool), devices[0]),)
    adv = jax.jit(_make_advance(sim.device_algos, always_on=(True,)))
    out = adv(ds, masks, n_steps)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, masks, n_steps)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return m * n_steps / best


def main():
    chains_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_avail = len(jax.devices("cpu"))
    results = {}
    r1 = rr1 = None
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        r = rate(n, chains_per_dev, n_steps)
        rr = rate(n, chains_per_dev, n_steps, recorders=True)
        if r1 is None:
            r1, rr1 = r, rr
        results[n] = {"steps_per_sec": round(r),
                      "efficiency": round(r / (n * r1), 3),
                      "steps_per_sec_with_recorders": round(rr),
                      "efficiency_with_recorders": round(rr / (n * rr1), 3)}
        print(f"devices={n}: bare {r / 1e6:.1f} M steps/s "
              f"(eff {results[n]['efficiency']}) | with recorders "
              f"{rr / 1e6:.1f} M steps/s "
              f"(eff {results[n]['efficiency_with_recorders']})",
              file=sys.stderr)
    print(json.dumps({"metric": "chain_scaling_weak",
                      "chains_per_device": chains_per_dev,
                      "results": results}))


if __name__ == "__main__":
    main()
