#!/bin/sh
# QAT step-throughput grid (VERDICT r3 item 3): Llama-8B-like layer
# shapes + the square headline, all three grad modes per shape.
# Output: one JSON line per shape -> benchmarks/results_qat_r4.jsonl
# A crashed/timed-out shape writes an explicit FAIL record instead of
# silently appending garbage (ADVICE r4); stderr goes to a per-shape log.
set -x
cd /root/repo
OUT=benchmarks/results_qat_r4.jsonl
: > "$OUT"
for shape in "4096 4096 4096" "4096 14336 4096" "4096 4096 14336" \
             "8192 4096 4096"; do
  set -- $shape
  ERRLOG="/tmp/qat_${1}_${2}_${3}.err"
  LINE=$(timeout 2700 python benchmarks/bench_qat.py --m "$1" --n "$2" \
    --k "$3" 2>"$ERRLOG" | tail -1)
  case "$LINE" in
    *qat_step_speedup*) printf '%s\n' "$LINE" >> "$OUT" ;;
    *) printf '{"metric": "qat_step_speedup_vs_pseudoquant", "m": %s, "n": %s, "k": %s, "error": "FAIL (see %s)"}\n' \
         "$1" "$2" "$3" "$ERRLOG" >> "$OUT" ;;
  esac
done
cat "$OUT"
