"""Perf-regression gate: fail when the latest headline benchmark dropped
more than ``TOL`` below the previous round's number.

Reads ``benchmarks/history.json`` (written by ``bench.py``).  Wired into the
nightly fullscale CI job so throughput drift between rounds is caught instead
of silently accumulating (round 1 -> 3 drifted 19.76 -> 19.64 G unnoticed).

Usage: python tools/perf_gate.py [tolerance]   (default 0.05 = 5%)
"""

import json
import os
import sys

TOL = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "benchmarks", "history.json")

with open(path) as f:
    hist = json.load(f)
rounds = hist.get("headline_steps_per_sec", {})
tags = sorted(rounds)
if len(tags) < 2:
    print(f"perf_gate: only {len(tags)} round(s) recorded, nothing to gate")
    sys.exit(0)
prev, cur = rounds[tags[-2]], rounds[tags[-1]]
ratio = cur / prev
status = "OK" if ratio >= 1.0 - TOL else "REGRESSION"
print(f"perf_gate: {tags[-1]} = {cur / 1e9:.2f} G vs {tags[-2]} = "
      f"{prev / 1e9:.2f} G steps/s ({ratio:.3f}x) -> {status}")
sys.exit(0 if status == "OK" else 1)
