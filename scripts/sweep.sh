#!/bin/bash
# Serial multi-scale bench sweep — ONE sbt JVM at a time (two JVMs
# sharing target/ corrupt each other's runs: round 9's 11 phantom
# errors). Usage: scripts/sweep.sh [outPrefix]
# Writes one JSON per scale: <outPrefix>_<sf>.json, then runs the
# WIDTH-SCHEDULE PROBE: oracle-verifies the four adaptive-family
# queries on the 2x-sf1 fixture (the NEXT width configuration past the
# committed scales — LSH 14 planes / 28 probes, doubled pigeonhole
# corpus). The round-13 probe caught two real defects (q25's
# broadcast-death, an oracle temp blowup) precisely because it
# exercised the next config; it is standard round evidence now.
# Record: <outPrefix>_sf2x_verify.txt
set -e
cd "$(dirname "$0")/.."
prefix="${1:-/tmp/bench_sweep}"
for dir in /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/graft_sf1; do
  sf=$(basename "$dir")
  [ "$sf" = graft_sf1 ] && sf=sf1
  if [ ! -d "$dir" ]; then
    echo "=== $sf: fixture missing ($dir) — scripts/make_sf1.py builds it ==="
    continue
  fi
  echo "=== $sf ($dir) ==="
  # Capture the FULL long-name JSON via the file sink (the last stdout
  # line is the compact short-id form; sbt also prefixes echoed lines
  # with "[info] ") — one file per scale, not the shared default path.
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="${prefix}_${sf}.json" \
    sbt -batch "runMain graft.Bench" > /dev/null 2>&1
  python3 -c "import json;d=json.load(open('${prefix}_${sf}.json'));print('$sf total', d['value'], 'errors', d.get('errors'))"
done

echo "=== width-schedule probe (2x-sf1) ==="
if [ ! -d /tmp/graft_sf2x ]; then
  python3 scripts/make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2
fi
rm -rf /tmp/vs_sweep_w
sbt -batch "runMain graft.tools.VerifySome /tmp/graft_sf2x /tmp/vs_sweep_w q25_neardup_cosine q267_lsh_recall q152_simhash_hamming q214_media_phash_dedup" \
  > /dev/null 2>&1
GRAFT_ORACLE_TEMP_CAP=70GB GRAFT_ORACLE_MEM=80GB \
  python3 scripts/compare.py /tmp/graft_sf2x /tmp/vs_sweep_w \
  | tee "${prefix}_sf2x_verify.txt"
