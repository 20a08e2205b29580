#!/usr/bin/env python3
"""Wall-budget gate for the round-2 recorded headline set (round-15,
verdict item 4).

The harness criterion is "within 2x of the recorded baseline at the
same scale"; round 14 crossed 1.0x on that set for the first time
(1.19x, entirely q25's deliberate recall price), leaving 0.81x of
headroom a future recall-schedule bump could consume SILENTLY. This
gate makes approaching the bar a loud decision: it recomputes the
r02-set total from a fresh sf0.1 bench artifact and FAILS the sweep
when the RAW ratio exceeds the named threshold.

RAW, not calib-normalized, deliberately: the harness bar is raw, and
round 14 proved the anchors can move opposite to the suite. A failure
on a slow host is therefore possible — the remedy is the worktree
same-host A/B (SCALING.md host-drift protocol), and the override for
an ADJUDICATED host artifact is to re-run with an explicit higher
threshold, which leaves a visible trace in the sweep log.

Usage: headline_gate.py NEW_SF01_BENCH.json [threshold=1.6]
"""
import json
import re
import sys

THRESH = float(sys.argv[2]) if len(sys.argv) > 2 else 1.6
BASELINE = "BENCH_r02.json"


def load_queries(path):
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        return d["queries"]
    # driver-wrapped artifact (BENCH_r02.json): the bench JSON line is
    # embedded in the captured output tail
    m = re.findall(r'\{"metric":"total".*?"sf":"[^"]*"\}', d.get("tail", ""))
    if m:
        return json.loads(m[-1])["queries"]
    sys.exit(f"{path}: no queries map found")


base = load_queries(BASELINE)
new = load_queries(sys.argv[1])

missing = sorted(set(base) - set(new))
if missing:
    sys.exit(f"HEADLINE GATE FAIL: r02 queries missing from the new "
             f"artifact: {missing}")

rows = [(q, base[q], new[q]) for q in sorted(base)
        if isinstance(new.get(q), (int, float))]

# Bench.scala serializes an ERRORED query as -1 seconds; summing that
# into tot_new would LOWER the ratio and make the gate MORE likely to
# pass over a broken query. Mirror benchdiff.py: any non-positive
# timing (either side) is a loud failure, not a data point. (r15
# advisory — the sweep's set -e covered the sweep path, but a
# standalone gate run did not.)
bad = [(q, a, b) for q, a, b in rows if a <= 0 or b <= 0]
if bad:
    sys.exit("HEADLINE GATE FAIL: non-positive timings (errored queries "
             f"serialize as -1): {[(q, a, b) for q, a, b in bad]}")
tot_base = sum(r[1] for r in rows)
tot_new = sum(r[2] for r in rows)
ratio = tot_new / tot_base
print(f"headline gate: r02 16-query set {tot_base:.3f}s -> {tot_new:.3f}s "
      f"raw {ratio:.2f}x (threshold {THRESH}x, harness bar 2.0x)")
worst = sorted(rows, key=lambda r: r[2] / r[1], reverse=True)[:3]
for q, a, b in worst:
    print(f"  worst: {q} {a:.3f}s -> {b:.3f}s ({b / a:.2f}x)")
if ratio > THRESH:
    sys.exit(f"HEADLINE GATE FAIL: {ratio:.2f}x > {THRESH}x — the r02 "
             "headline set is drifting toward the 2x harness bar. If a "
             "worktree same-host A/B adjudicates this as host drift, "
             "re-run with an explicit threshold to override (visibly).")
print("headline gate: PASS")
