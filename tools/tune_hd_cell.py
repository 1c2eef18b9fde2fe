"""Hard-disk cell-MC tuning probe: d_cap x sigma grid (VERDICT r4 weak 4).

The cell path's acceptance at eta=0.70 was 0.14-0.17 with the fixed
d_cap=0.45 halo and sigma=0.12.  This probes the (d_cap, sigma) grid and
reports ACCEPTED moves/s (the quantity that matters — attempts are free to
tune against each other) through the production engine path.

Usage: python tools/tune_hd_cell.py [n_chains]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def accepted_rate(m, n, eta, d_cap, sigma, steps=12, sweep=512):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import hard_disks as hd
    from montecarlo_tpu.utils.observability import device_sync

    chains = hd.init_chains(m, n, eta=eta, seed=42)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.Metropolis, pool=(hd.displacement_move(sigma),),
              seed=5, sweepstep=sweep, fused="cell",
              cell_opts={"d_cap": d_cap})],
        steps, path="/tmp/mctpu_hd_tune")
    ds = sim.init_device_state()
    masks = tuple(jnp.ones(sim.steps + 1, bool) for _ in sim.device_algos)
    adv = jax.jit(_select_advance(sim))
    out = adv(ds, masks, steps)
    device_sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, masks, steps)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    cnt = np.asarray(out["metropolis"]["counters"])
    acc, att = int(cnt[..., 0].sum()), int(cnt[..., 1].sum())
    ovf = bool(np.asarray(out["metropolis"]["cell_overflow"]))
    met = sim.device_algos[0]
    return {"acc_per_sec": round(acc / best), "att_per_sec": round(att / best),
            "acceptance": round(acc / max(att, 1), 3),
            "nc": met._cell_plan.nc, "cap": met._cell_plan.cap,
            "overflow": ovf}


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n, eta = 2048, 0.70
    grid = {}
    best = (None, 0)
    for d_cap in (0.25, 0.35, 0.45):
        for sigma in (0.08, 0.12, 0.18, 0.25):
            r = accepted_rate(m, n, eta, d_cap, sigma)
            key = f"dcap{d_cap}_sig{sigma}"
            grid[key] = r
            print(f"{key}: acc/s {r['acc_per_sec'] / 1e6:.2f} M "
                  f"(acceptance {r['acceptance']}, nc {r['nc']}, "
                  f"ovf {r['overflow']})", file=sys.stderr)
            if not r["overflow"] and r["acc_per_sec"] > best[1]:
                best = (key, r["acc_per_sec"])
    print(json.dumps({"metric": "hard_disk_cell_tuning",
                      "n": n, "eta": eta, "n_chains": m,
                      "best": best[0], "grid": grid}))


if __name__ == "__main__":
    main()
