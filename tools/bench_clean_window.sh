#!/bin/bash
# Hunt for a CLEAN full-surface bench window: launch graft.Bench at
# sf0.1, poll the log, and abort+retry as soon as the canary gate
# routes the run noisy (no point paying the remaining ~10 min of a
# disqualified window). Stops on the first window that finishes
# clean, or after MAX_TRIES. The committed BENCH_TOTALS/DETAIL files
# are only replaced by a clean window (Bench's own gate guarantees
# it; this wrapper just saves wall-clock between attempts).
#
# Usage: tools/bench_clean_window.sh [max_tries] [logdir]
set -u
MAX_TRIES=${1:-6}
LOGDIR=${2:-/tmp}
for i in $(seq 1 "$MAX_TRIES"); do
  LOG="$LOGDIR/bench_clean_try$i.log"
  echo "[clean-window] attempt $i/$MAX_TRIES -> $LOG"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_BUDGET_SEC=900 \
    SPARK_GRAFT_PRETOUCH=1 \
    sbt -batch "runMain graft.Bench" > "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 20
    if grep -q "noisy window" "$LOG" 2>/dev/null; then
      echo "[clean-window] attempt $i went noisy - aborting it"
      # kill the whole sbt/jvm tree, then let the loop retry
      pkill -9 -P "$PID" 2>/dev/null
      kill -9 "$PID" 2>/dev/null
      pkill -9 -f "runMain graft.Bench" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if ! grep -q "noisy window" "$LOG" 2>/dev/null \
      && grep -q '"n_queries"' "$LOG" 2>/dev/null; then
    echo "[clean-window] attempt $i finished CLEAN"
    tail -c 400 "$LOG"
    exit 0
  fi
done
echo "[clean-window] no clean window in $MAX_TRIES attempts"
exit 1
