#!/bin/sh
# Complete the FULL 198-point reference protocol (2 tables x 3 geos x
# had{32,64,128} x 11 M) across as many budget windows as needed
# (VERDICT r4 item 4): each pass appends per-point lines to the shared
# log and the next pass resumes past everything already measured.
# Usage: sh benchmarks/run_full_grid_r5.sh [passes] [budget_s]
set -x
cd /root/repo
LOG=benchmarks/results_full_grid_r5.log
PASSES=${1:-6}
BUDGET=${2:-3000}
i=0
while [ "$i" -lt "$PASSES" ]; do
  i=$((i + 1))
  QUTLASS_BENCH_FULL=1 QUTLASS_BENCH_BUDGET_S="$BUDGET" \
    QUTLASS_BENCH_RESUME="$LOG" \
    timeout $((BUDGET + 600)) python bench.py 2>>"$LOG" | tail -1
  # done when the full grid is in: 198 MX points measured or resumed
  N=$(grep -c "mxfp4-int8" "$LOG")
  # resumed points are not re-logged, so count UNIQUE point keys
  U=$(grep "mxfp4-int8" "$LOG" | sed 's/: .*//' | sort -u | wc -l)
  echo "pass $i: $N lines, $U unique MX points"
  [ "$U" -ge 198 ] && break
done
grep "mxfp4-int8" "$LOG" | sed 's/: .*//' | sort -u | wc -l
