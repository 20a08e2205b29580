#!/usr/bin/env python3
"""Round-over-round bench comparison, normalized by the host-speed
calibration anchor.

Usage: benchdiff.py OLD_BENCH.json NEW_BENCH.json [threshold]

Every BENCH_r*.json from round 11 on carries "calib": the median of a
fixed single-threaded CPU+memory microbench (graft.Bench). Two rounds
run on differently-provisioned hosts (round 10 measured ~1.3x slower
than round 9 uniformly); dividing the raw per-query ratio by the calib
ratio removes the host term, so what remains is plan/code change.
Queries whose normalized ratio exceeds the threshold (default 1.25x)
are listed as real regressions; for pre-calib artifacts the raw ratio
is reported with a NO-CALIB warning.
"""
import json
import sys

if len(sys.argv) < 3:
    sys.exit(__doc__)
old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

for path, art in ((sys.argv[1], old), (sys.argv[2], new)):
    if not isinstance(art.get("queries"), dict):
        sys.exit(f"{path}: no 'queries' map — not a bench artifact")
    for anchor in ("calib", "calib_parallel"):
        v = art.get(anchor)
        if v is not None and (not isinstance(v, (int, float))
                              or isinstance(v, bool) or v <= 0):
            sys.exit(f"{path}: '{anchor}' must be a positive number, "
                     f"got {v!r} — corrupt or truncated bench artifact")

# Prefer the PARALLEL anchor (round 13+): the serial one provably
# misses multicore contention drift (round-12 same-host A/B: ~20%
# suite movement at flat serial calib). Fall back to the serial
# anchor for r11/r12 artifacts.
host = None
anchor_used = None
for anchor in ("calib_parallel", "calib"):
    if old.get(anchor) and new.get(anchor):
        host = new[anchor] / old[anchor]
        anchor_used = anchor
        break
if host is not None:
    print(f"{anchor_used}: old={old[anchor_used]}s new={new[anchor_used]}s "
          f"host ratio={host:.3f}x (new host is "
          f"{'slower' if host > 1 else 'faster'})")
    if anchor_used == "calib":
        print("  (serial anchor only — blind to multicore contention "
              "drift; suite-total movements may still need a same-host "
              "A/B, see the verify skill's host-drift protocol)")
else:
    print("NO-CALIB: at least one artifact predates the calib anchor; "
          "ratios below are RAW and include any host-speed drift")

common = sorted(set(old["queries"]) & set(new["queries"]))
rows = []
for q in common:
    a, b = old["queries"][q], new["queries"][q]
    if a is None or b is None or a <= 0 or b < 0:
        continue
    raw = b / a
    norm = raw / host if host else raw
    rows.append((norm, raw, a, b, q))
rows.sort(reverse=True)
if not rows:
    sys.exit("no comparable queries between the two artifacts "
             "(disjoint query sets, or every common entry errored)")

tot_old = sum(r[2] for r in rows)
tot_new = sum(r[3] for r in rows)
tot_raw = tot_new / tot_old
tot_norm = tot_raw / host if host else tot_raw
print(f"total over {len(rows)} common queries: {tot_old:.2f}s -> "
      f"{tot_new:.2f}s raw {tot_raw:.2f}x"
      + (f" normalized {tot_norm:.2f}x" if host else ""))

regs = [r for r in rows if r[0] > thresh]
label = "normalized" if host else "raw"
def line(q, a, b, raw, norm):
    base = f"  {q}: {a:.3f}s -> {b:.3f}s raw {raw:.2f}x"
    return base + (f" normalized {norm:.2f}x" if host else "")

if regs:
    print(f"\n{label} regressions > {thresh}x:")
    for norm, raw, a, b, q in regs:
        print(line(q, a, b, raw, norm))
else:
    print(f"no {label} regression exceeds {thresh}x")
imps = [r for r in rows if r[0] < 1 / thresh]
if imps:
    print(f"\n{label} improvements < {1/thresh:.2f}x:")
    for norm, raw, a, b, q in sorted(imps):
        print(line(q, a, b, raw, norm))
