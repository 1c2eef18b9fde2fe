"""Headline benchmark: Metropolis steps/s/chip at 10^4 particle-1d chains.

BASELINE.json target: >100M Metropolis steps/s/chip.  Prints ONE JSON line.

The measured path is the production engine path: the fused compiled time loop
(`_make_advance`) the Simulation orchestrator runs between sync points —
not a stripped-down kernel.  A scalar readback forces device sync
(block_until_ready does not reliably block on the axon tunnel backend).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

_HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "history.json")


def _round_key(tag):
    """Numeric-aware ordering for round tags: r2 < r04 < r10 < any
    non-numeric tag (lexicographic max would put 'r9' above 'r10')."""
    suffix = tag[1:] if tag.startswith("r") else tag
    return (0, int(suffix)) if suffix.isdigit() else (1, tag)


def _compare_with_history(rate):
    """Read the prior rounds' headline numbers, compute the ratio vs the
    most recent OTHER round (re-runs of the same tag never compare against
    the value they overwrite), and record this run (perf-regression
    bookkeeping; the CI gate lives in tools/perf_gate.py)."""
    try:
        with open(_HISTORY) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = {}
    rounds = hist.setdefault("headline_steps_per_sec", {})
    tag = os.environ.get("BENCH_ROUND")
    if tag is None:
        n = max((int(k[1:]) for k in rounds if k[1:].isdigit()),
                default=0)
        tag = f"r{n + 1:02d}"
    prior = {k: v for k, v in rounds.items() if k != tag}
    prev = prior[max(prior, key=_round_key)] if prior else None
    rounds[tag] = round(rate)
    try:
        with open(_HISTORY, "w") as f:
            json.dump(hist, f, indent=2)
    except OSError:
        pass
    return (rate / prev) if prev else None


def bench_metropolis(n_chains=10_000, n_steps=500_000, repeats=3):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import particle1d as p1d

    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(n_chains, beta=2.0, seed=42)
    pool = (p1d.displacement_move(sigma=0.5),)
    sim = mc.Simulation(system, chains,
                        [dict(algorithm=mc.Metropolis, pool=pool, seed=42)],
                        n_steps, path="/tmp/mctpu_bench")
    ds = sim.init_device_state()
    masks = tuple(jnp.ones(n_steps + 1, bool) for _ in sim.device_algos)
    # production path: fused Pallas segment kernel when eligible
    advance = jax.jit(_select_advance(sim))

    # compile + warm
    out = advance(ds, masks, n_steps)
    float(out["sys"].x.sum())

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = advance(ds, masks, n_steps)
        float(out["sys"].x.sum())  # force sync
        best = min(best, time.perf_counter() - t0)
    return n_chains * n_steps / best


def main():
    rate = bench_metropolis()
    baseline = 100e6  # BASELINE.json: >100M Metropolis steps/s/chip
    vs_prev = _compare_with_history(rate)
    out = {
        "metric": "metropolis_steps_per_sec_per_chip_at_1e4_chains",
        "value": round(rate),
        "unit": "steps/s",
        "vs_baseline": round(rate / baseline, 3),
    }
    if vs_prev is not None:
        out["vs_prev_round"] = round(vs_prev, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
