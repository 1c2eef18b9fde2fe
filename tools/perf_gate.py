"""Perf-regression gate: fail when the latest RECORDED headline benchmark
dropped more than ``TOL`` below the previous round's number.

Reads ``benchmarks/history.json`` (written by ``bench.py``, which runs on
real TPU hardware — the round driver executes it every round).  The nightly
CI job runs on CPU-only runners and therefore cannot re-measure; what it
gates is the COMMITTED artifact: any on-chip bench run that lands a >TOL
regression into history.json turns CI red instead of drifting silently
(rounds 1 -> 3 drifted 19.76 -> 19.64 G with nothing tracking it).  Run
this locally right after ``bench.py`` for the measuring version of the
check.

Usage: python tools/perf_gate.py [tolerance]   (default 0.05 = 5%)
"""

import json
import os
import sys

TOL = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "benchmarks", "history.json")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import _round_key  # noqa: E402  (single source of tag ordering)

with open(path) as f:
    hist = json.load(f)
rounds = hist.get("headline_steps_per_sec", {})
tags = sorted(rounds, key=_round_key)
if len(tags) < 2:
    print(f"perf_gate: only {len(tags)} round(s) recorded, nothing to gate")
    sys.exit(0)
prev, cur = rounds[tags[-2]], rounds[tags[-1]]
ratio = cur / prev
status = "OK" if ratio >= 1.0 - TOL else "REGRESSION"
print(f"perf_gate: {tags[-1]} = {cur / 1e9:.2f} G vs {tags[-2]} = "
      f"{prev / 1e9:.2f} G steps/s ({ratio:.3f}x) -> {status}")
sys.exit(0 if status == "OK" else 1)
