"""ECMC vs Metropolis on hard disks: events/s + equal-wall-clock ESS.

Two measurements (VERDICT r3 item 7):

1. Raw event throughput of the hard-disk straight event chain
   (collisions/s/chip) through the production engine path.
2. Sampling efficiency: integrated autocorrelation time of the slow
   bond-orientational observable |psi6| for ECMC and for Metropolis local
   displacements, converted to effective samples per second of wall clock.

Usage: python tools/bench_ecmc.py [n_chains] [eta]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DISKS = 64
STEPS = 400


def _advance(sim):
    from montecarlo_tpu.core.simulation import _select_advance
    ds = sim.init_device_state()
    masks = tuple(jnp.ones(sim.steps + 1, bool) for _ in sim.device_algos)
    adv = jax.jit(_select_advance(sim))
    return adv, ds, masks


def bench_ecmc(m, eta, chain_length, events_per_step=8):
    import montecarlo_tpu as mc
    from montecarlo_tpu.models import hard_disks as hd

    chains = hd.init_chains(m, N_DISKS, eta=eta, seed=42)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.EventChain,
              model=hd.ecmc_model(chain_length, max_events_per_chain=512),
              events_per_step=events_per_step, seed=7)],
        STEPS, path="/tmp/mctpu_ecmc_bench")
    adv, ds, masks = _advance(sim)
    out = adv(ds, masks, STEPS)
    float(out["sys"].pos.sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(ds, masks, STEPS)
        float(out["sys"].pos.sum())
        best = min(best, time.perf_counter() - t0)
    ncoll = int(np.asarray(out["ecmc"]["stats"]["collisions"]).sum())
    cap = int(np.asarray(out["ecmc"]["stats"]["cap_hits"]).sum())
    return ncoll / best, ncoll, cap, best


def series_run(m, eta, algo_spec, path):
    """Run with a per-step |psi6| recorder; return (series, wall_s)."""
    import montecarlo_tpu as mc
    from montecarlo_tpu.models import hard_disks as hd

    chains = hd.init_chains(m, N_DISKS, eta=eta, seed=42)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [algo_spec,
         dict(algorithm=mc.StoreCallbacks, callbacks=(hd.callback_psi6,),
              scheduler=np.arange(1, STEPS + 1))],
        STEPS, path=path)
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    d = np.loadtxt(os.path.join(path, "psi6.dat"))
    return d[1:, 1], wall


def main():
    import montecarlo_tpu as mc
    from montecarlo_tpu.models import hard_disks as hd
    from montecarlo_tpu.utils.analysis import integrated_autocorr_time

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    eta = float(sys.argv[2]) if len(sys.argv) > 2 else 0.70
    chains0 = hd.init_chains(1, N_DISKS, eta=eta, seed=0)
    box = float(chains0.box[0])
    ell = box / 2.0

    ev_s, ncoll, cap, wall = bench_ecmc(m, eta, ell)
    print(f"ECMC events/s: {ev_s / 1e6:.3f} M (collisions={ncoll}, "
          f"cap_hits={cap}, wall={wall:.3f}s)", file=sys.stderr)

    s_e, w_e = series_run(
        m, eta,
        dict(algorithm=mc.EventChain,
             model=hd.ecmc_model(ell, max_events_per_chain=512),
             events_per_step=8, seed=7),
        "/tmp/mctpu_ecmc_series")
    s_m, w_m = series_run(
        m, eta,
        dict(algorithm=mc.Metropolis,
             pool=(hd.displacement_move(0.08),), sweepstep=N_DISKS,
             seed=7),
        "/tmp/mctpu_mh_series")
    tau_e = integrated_autocorr_time(s_e)
    tau_m = integrated_autocorr_time(s_m)
    ess_s_e = (len(s_e) / tau_e) / w_e
    ess_s_m = (len(s_m) / tau_m) / w_m
    print(f"ECMC: tau={tau_e:.2f} steps, wall={w_e:.2f}s -> "
          f"{ess_s_e:.2f} ESS/s", file=sys.stderr)
    print(f"MH:   tau={tau_m:.2f} steps, wall={w_m:.2f}s -> "
          f"{ess_s_m:.2f} ESS/s", file=sys.stderr)
    print(json.dumps({
        "metric": "hard_disk_ecmc",
        "n_disks": N_DISKS, "n_chains": m, "eta": eta,
        "events_per_sec": round(ev_s),
        "cap_hits": cap,
        "psi6_tau_ecmc_steps": round(tau_e, 2),
        "psi6_tau_mh_steps": round(tau_m, 2),
        "ess_per_sec_ecmc": round(ess_s_e, 2),
        "ess_per_sec_mh": round(ess_s_m, 2),
        "ecmc_vs_mh_x": round(ess_s_e / ess_s_m, 2),
    }))


if __name__ == "__main__":
    main()
