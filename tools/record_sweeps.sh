#!/bin/bash
# Record N full bench sweeps (default 5) off a classes snapshot into one
# JSON-lines file, with a cheap fx_corr calm-window probe logged before
# each sweep (the r13/r14 adjudication rule: never read cross-window
# absolutes; the probe series is the window evidence).
# Usage: CP_DIR=/tmp/classes_snap tools/record_sweeps.sh out.jsonl [N]
set -u
OUT="${1:?usage: record_sweeps.sh out.jsonl [N]}"
N="${2:-5}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
DIR="$(dirname "$0")"
for i in $(seq 1 "$N"); do
  # the bench now prints the full per-query line PLUS a compact driver-
  # parsable final line — record the full one
  probe=$(SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF" \
    "$DIR/run_bench.sh" graft.Bench fx_corr 2>/dev/null |
    grep '"metric":"total"' | tail -1 |
    grep -o '"fx_corr":[0-9.]*' | head -1 | cut -d: -f2)
  echo "{\"sweep\":$i,\"probe_fx_corr\":${probe:-null}}" >> "$OUT"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF" \
    "$DIR/run_bench.sh" graft.Bench 2>/dev/null |
    grep '"metric":"total"' | tail -1 >> "$OUT"
done
