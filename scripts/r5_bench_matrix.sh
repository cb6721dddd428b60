#!/bin/bash
# Round-5 bench matrix (run AFTER scripts/r5_campaign.sh; one TPU process
# at a time).  Evidence rows for: the self-keyed default (VERDICT r4 #1),
# production-scale re-measure (#3), sk on/off and window-slack A/Bs.
# Error rows carry the one-line failure signature (VERDICT r4 weak #2).
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-results/bench_matrix_r5.jsonl}
mkdir -p results
: > "$OUT"

run() {  # run <label> [ENV=VAL ...]
  label=$1; shift
  echo "=== bench: $label ($*)" >&2
  line=$(env "$@" python bench.py 2>/tmp/bench_row_stderr.log) || {
    sig=$(grep -Eo "(Error|OOM|RESOURCE_EXHAUSTED|Assertion)[^\"]*" \
          /tmp/bench_row_stderr.log | head -1 | cut -c1-160)
    echo "{\"label\": \"$label\", \"error\": true, \"signature\": \"${sig//\"/}\"}" >> "$OUT"
    return 0; }
  echo "${line%\}}, \"label\": \"$label\"}" >> "$OUT"
  echo "$line  <- $label" >&2
}

# headline (defaults: minkunet18, sk on, bf16)
run bf16-18-sk
run bf16-18-tables BENCH_K3_SK=0
run int8-18-sk BENCH_IMPL=pallas-int8
run bf16-18-sk-wslack32 MRCC_CONV_WSLACK=32 BENCH_CERTIFY=0
# flagship 18D comparison rows (reference default backbone)
run bf16-18D BENCH_SEG_BACKBONE=minkunet
# production scale (SURVEY §6 max_npoint territory)
run prod-int8-18-sk BENCH_BATCH=2 BENCH_POINTS=131072 BENCH_ITERS=5 BENCH_IMPL=pallas-int8
run prod-bf16-18-sk BENCH_BATCH=2 BENCH_POINTS=131072 BENCH_ITERS=5
run prod-int8-18-wslack32 BENCH_BATCH=2 BENCH_POINTS=131072 BENCH_ITERS=5 BENCH_IMPL=pallas-int8 MRCC_CONV_WSLACK=32 BENCH_CERTIFY=0

cat "$OUT"
