#!/bin/bash
# Round-4 bench matrix (run AFTER scripts/r4_campaign.sh; one TPU process
# at a time).  Produces the evidence rows for: the int8 default flip
# (VERDICT r3 #1), the seg-backbone model-level lever (#2), the
# production-scale lane-packed re-measure (#4), and the hierarchy
# breakdown that decides the sort-kernel wiring (#5).
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-results/bench_matrix_r4.jsonl}
mkdir -p results
: > "$OUT"

run() {  # run <label> [ENV=VAL ...]
  label=$1; shift
  echo "=== bench: $label ($*)" >&2
  line=$(env "$@" python bench.py 2>>/tmp/bench_matrix_stderr.log) || {
    echo "{\"label\": \"$label\", \"error\": true}" >> "$OUT"; return 0; }
  echo "${line%\}}, \"label\": \"$label\"}" >> "$OUT"
  echo "$line  <- $label" >&2
}

run bf16-18D
run int8-18D BENCH_IMPL=pallas-int8
run int8-18D-fullwidth BENCH_IMPL=pallas-int8 MRCC_KG_LANES_Q8=10368
run bf16-18 BENCH_SEG_BACKBONE=minkunet18
run int8-18 BENCH_SEG_BACKBONE=minkunet18 BENCH_IMPL=pallas-int8
run bf16-14A BENCH_SEG_BACKBONE=minkunet14A
run prod-bf16-18D BENCH_BATCH=2 BENCH_POINTS=131072 BENCH_ITERS=5
run prod-int8-18D BENCH_BATCH=2 BENCH_POINTS=131072 BENCH_ITERS=5 BENCH_IMPL=pallas-int8

echo "=== hierarchy breakdown probe"
python scripts/probe_hierarchy_breakdown.py 2>&1 | tail -12

cat "$OUT"
