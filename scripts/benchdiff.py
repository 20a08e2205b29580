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

Round-15 amendment (from the round-14 adjudication): normalization is
applied ONLY when every available anchor (calib, calib_parallel, and
the round-15 calib_io parquet scan+aggregate anchor) agrees in sign
with the raw suite movement — r13->r14 proved both ALU anchors can
move 30-40% one way while the suite moves 13% the other (an
IO/page-cache/JVM drift class), and normalizing through that anchor
fabricated a 1.66x reading on a same-host-flat diff. On disagreement
the script reports RAW ratios and prints the worktree same-host A/B
instruction instead.
"""
import json
import math
import sys

if len(sys.argv) < 3:
    sys.exit(__doc__)
old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

ANCHORS = ("calib", "calib_parallel", "calib_io")
for path, art in ((sys.argv[1], old), (sys.argv[2], new)):
    if not isinstance(art.get("queries"), dict):
        sys.exit(f"{path}: no 'queries' map — not a bench artifact")
    for anchor in ANCHORS:
        v = art.get(anchor)
        if v is not None and (not isinstance(v, (int, float))
                              or isinstance(v, bool) or v <= 0):
            sys.exit(f"{path}: '{anchor}' must be a positive number, "
                     f"got {v!r} — corrupt or truncated bench artifact")

# All anchors present in BOTH artifacts, with their host ratios.
# Three classes: calib (serial ALU+RMW, r11+), calib_parallel (32-way
# contention, r13+), calib_io (parquet scan+aggregate — page-cache /
# codec / JIT, r15+: the drift dimension the round-14 adjudication
# proved the ALU loops cannot see).
ratios = {a: new[a] / old[a] for a in ANCHORS if old.get(a) and new.get(a)}
# Preferred normalization anchor: parallel > serial (calib_io gates
# but does not normalize — it measures a fixed scan, not the suite's
# CPU mix).
host = None
anchor_used = None
for anchor in ("calib_parallel", "calib"):
    if anchor in ratios:
        host = ratios[anchor]
        anchor_used = anchor
        break
for a, r in sorted(ratios.items()):
    print(f"{a}: old={old[a]}s new={new[a]}s host ratio={r:.3f}x "
          f"(new host is {'slower' if r > 1 else 'faster'})")
if host is None:
    print("NO-CALIB: at least one artifact predates the calib anchor; "
          "ratios below are RAW and include any host-speed drift")
elif anchor_used == "calib" and "calib_parallel" not in ratios:
    print("  (serial anchor only — blind to multicore contention "
          "drift; suite-total movements may still need a same-host "
          "A/B, see the verify skill's host-drift protocol)")

common = sorted(set(old["queries"]) & set(new["queries"]))
pre = []
for q in common:
    a, b = old["queries"][q], new["queries"][q]
    if a is None or b is None or a <= 0 or b < 0:
        continue
    pre.append((a, b, q))
if not pre:
    sys.exit("no comparable queries between the two artifacts "
             "(disjoint query sets, or every common entry errored)")
tot_old = sum(p[0] for p in pre)
tot_new = sum(p[1] for p in pre)
tot_raw = tot_new / tot_old

# SIGN-AGREEMENT RULE (round-15, from the round-14 adjudication): the
# anchors can move OPPOSITE to the suite (r13->r14: both ALU anchors
# ~30-40% faster, suite ~13% slower — an IO/page-cache/JVM drift class
# they cannot see), and normalizing through such an anchor fabricates
# regressions (the "1.66x" artifact). Normalize ONLY when every
# available anchor's movement agrees in sign with the raw suite
# movement (a ~flat reading, within 5%, is sign-agnostic and never
# vetoes); otherwise report RAW and print the worktree-A/B protocol.
DEADBAND = math.log(1.05)


def sgn(r):
    lr = math.log(r)
    return 0 if abs(lr) <= DEADBAND else (1 if lr > 0 else -1)


if host is not None:
    raw_sign = sgn(tot_raw)
    vetoes = [a for a, r in ratios.items()
              if sgn(r) != 0 and raw_sign != 0 and sgn(r) != raw_sign]
    vetoes += [a for a, r in ratios.items() if sgn(r) != 0 and raw_sign == 0]
    if vetoes:
        print(f"ANCHOR/SUITE SIGN DISAGREEMENT ({', '.join(sorted(set(vetoes)))} "
              f"moved {'with a flat' if raw_sign == 0 else 'against the'} "
              f"suite): normalization SKIPPED — ratios below are RAW. "
              "Adjudicate with the worktree same-host A/B (check out both "
              "HEADs as worktrees, bench both on THIS host — SCALING.md "
              "host-drift protocol) before calling any movement real.")
        host = None

rows = []
for a, b, q in pre:
    raw = b / a
    norm = raw / host if host else raw
    rows.append((norm, raw, a, b, q))
rows.sort(reverse=True)

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
