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
  SPARK_GRAFT_SF_DIR="$dir" sbt -batch "runMain graft.Bench" 2>&1 \
    | grep '"metric"' | tail -1 > "${prefix}_${sf}.json"
  python3 -c "import json;d=json.load(open('${prefix}_${sf}.json'));print('$sf total', d['value'], 'errors', d.get('errors'))"
done
