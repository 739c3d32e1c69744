#!/bin/sh
# QAT step-throughput grid (VERDICT r3 item 3): Llama-8B-like layer
# shapes + the square headline, all three grad modes per shape.
# Output: one JSON line per shape -> benchmarks/results_qat_r4.jsonl
set -x
cd /root/repo
OUT=benchmarks/results_qat_r4.jsonl
: > "$OUT"
for shape in "4096 4096 4096" "4096 14336 4096" "4096 4096 14336" \
             "8192 4096 4096"; do
  set -- $shape
  timeout 900 python benchmarks/bench_qat.py --m "$1" --n "$2" --k "$3" \
    2>/dev/null | tail -1 >> "$OUT"
done
cat "$OUT"
