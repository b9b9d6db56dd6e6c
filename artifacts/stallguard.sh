#!/bin/bash
# stallguard.sh STALL_S TOTAL_S LOGFILE CMD...
#
# Runs CMD in its own session with stdout+stderr appended to LOGFILE.
# Kills the whole process tree (SIGTERM first, so bench.py's flush
# handler can emit its best-so-far JSON; SIGKILL 10 s later) when the
# log stops growing for STALL_S seconds or TOTAL_S elapses. The axon
# tunnel's failure mode is a silent mid-RPC wedge — a wedged client
# burns its entire timeout doing nothing, so progress, not time, is the
# right liveness signal.
#
# Exit: CMD's status, or 124 (stall) / 125 (total budget).
set -u
STALL=$1; TOTAL=$2; LOG=$3; shift 3
touch "$LOG"
setsid "$@" >> "$LOG" 2>&1 &
PID=$!
start=$(date +%s)
while kill -0 "$PID" 2>/dev/null; do
  sleep 15
  now=$(date +%s)
  mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
  rc=""
  if (( now - mt > STALL )); then rc=124; fi
  if (( now - start > TOTAL )); then rc=125; fi
  if [ -n "$rc" ]; then
    echo "stallguard: killing pid $PID (rc=$rc, stalled $((now-mt))s, ran $((now-start))s)" >> "$LOG"
    kill -TERM -- "-$PID" 2>/dev/null
    for _ in 1 2 3 4 5 6 7 8 9 10; do
      kill -0 "$PID" 2>/dev/null || break
      sleep 1
    done
    kill -KILL -- "-$PID" 2>/dev/null
    exit "$rc"
  fi
done
wait "$PID"
