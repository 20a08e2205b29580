#!/bin/bash
# Serial multi-scale bench sweep — ONE sbt JVM at a time (two JVMs
# sharing target/ corrupt each other's runs: round 9's 11 phantom
# errors). Usage: scripts/sweep.sh [outPrefix]
# Writes one JSON per scale: <outPrefix>_<sf>.json
set -e
cd "$(dirname "$0")/.."
prefix="${1:-/tmp/bench_sweep}"
for dir in /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/graft_sf1; do
  sf=$(basename "$dir")
  [ "$sf" = graft_sf1 ] && sf=sf1
  echo "=== $sf ($dir) ==="
  # Capture the FULL long-name JSON via the file sink (the last stdout
  # line is the compact short-id form; sbt also prefixes echoed lines
  # with "[info] ") — one file per scale, not the shared default path.
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_OUT="${prefix}_${sf}.json" \
    sbt -batch "runMain graft.Bench" > /dev/null 2>&1
  python3 -c "import json;d=json.load(open('${prefix}_${sf}.json'));print('$sf total', d['value'], 'errors', d.get('errors'))"
done
