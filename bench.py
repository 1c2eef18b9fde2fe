"""Headline benchmark: Metropolis steps/s/chip at 10^4 particle-1d chains.

BASELINE.json target: >100M Metropolis steps/s/chip.  Prints ONE JSON line.

The measured path is the production engine path: the fused compiled time loop
(`_select_advance`) the Simulation orchestrator runs between sync points —
not a stripped-down kernel.  A scalar readback forces device sync
(block_until_ready does not reliably block on the axon tunnel backend).

Variance discipline (VERDICT r4): the work unit is sized to a few seconds on chip
so timer/tunnel jitter is amortised, the reported rate is the MEDIAN of
``repeats`` runs, and the JSON carries the relative spread so a regression
can be told from noise.  History bookkeeping: an explicitly tagged run
(``BENCH_ROUND=rNN``) records under that round key; an UNTAGGED run (e.g.
the driver's capture) overwrites the single ``latest`` slot instead of
minting a new round key (round 4's untagged driver run polluted the history
with a spurious ``r05`` entry).
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


def _is_round(tag):
    return tag.startswith("r") and tag[1:].isdigit()


def _compare_with_history(rate):
    """Read the prior rounds' headline numbers, compute the ratio vs the
    most recent NUMERIC round other than this run's tag (re-runs of the
    same tag never compare against the value they overwrite; the 'latest'
    scratch slot never serves as a baseline), and record this run."""
    try:
        with open(_HISTORY) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = {}
    rounds = hist.setdefault("headline_steps_per_sec", {})
    tag = os.environ.get("BENCH_ROUND", "latest")
    prior = {k: v for k, v in rounds.items() if k != tag and _is_round(k)}
    prev = prior[max(prior, key=_round_key)] if prior else None
    rounds[tag] = round(rate)
    try:
        with open(_HISTORY, "w") as f:
            json.dump(hist, f, indent=2)
    except OSError:
        pass
    return (rate / prev) if prev else None


def bench_metropolis(n_chains=10_000, n_steps=12_000_000, repeats=7):
    import montecarlo_tpu as mc
    from montecarlo_tpu.core.simulation import _select_advance
    from montecarlo_tpu.models import particle1d as p1d

    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(n_chains, beta=2.0, seed=42)
    pool = (p1d.displacement_move(sigma=0.5),)
    sim = mc.Simulation(system, chains,
                        [dict(algorithm=mc.Metropolis, pool=pool, seed=42)],
                        n_steps, path="/tmp/mctpu_bench")
    from montecarlo_tpu.utils.observability import device_sync
    ds = sim.init_device_state()
    masks = tuple(jnp.ones(n_steps + 1, bool) for _ in sim.device_algos)
    # production path: fused Pallas segment kernel when eligible
    advance = jax.jit(_select_advance(sim))

    # compile + warm
    out = advance(ds, masks, n_steps)
    device_sync(out)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = advance(ds, masks, n_steps)
        device_sync(out)  # scalar readback (axon block_until_ready caveat)
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]
    spread = (times[-1] - times[0]) / median
    return n_chains * n_steps / median, spread


def main():
    rate, spread = bench_metropolis()
    baseline = 100e6  # BASELINE.json: >100M Metropolis steps/s/chip
    vs_prev = _compare_with_history(rate)
    out = {
        "metric": "metropolis_steps_per_sec_per_chip_at_1e4_chains",
        "value": round(rate),
        "unit": "steps/s",
        "vs_baseline": round(rate / baseline, 3),
        "spread": round(spread, 4),
    }
    if vs_prev is not None:
        out["vs_prev_round"] = round(vs_prev, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
