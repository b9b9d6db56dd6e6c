#!/bin/bash
# stallguard.sh STALL_S TOTAL_S LOGFILE CMD...
#
# Runs CMD in its own session with stdout+stderr appended to LOGFILE.
# Kills the whole process tree (SIGTERM first, so bench.py's flush
# handler can emit its best-so-far JSON; SIGKILL 10 s later) when
# progress stops for STALL_S seconds or TOTAL_S elapses. The axon
# tunnel's failure mode is a silent mid-RPC wedge — a wedged client
# burns its entire timeout doing nothing, so progress, not time, is the
# right liveness signal.
#
# Progress = newest mtime over the log file AND any paths matched by the
# colon-separated globs in $SG_PROGRESS (e.g. a checkpoint directory):
# python block-buffers stdout when redirected, so log growth alone can go
# silent for many epochs while training is healthy.  CMD is additionally
# launched with PYTHONUNBUFFERED=1 so python logs flush line-by-line.
#
# Exit: CMD's status, or 124 (stall) / 125 (total budget).
set -u
STALL=$1; TOTAL=$2; LOG=$3; shift 3
# Mid-queue skip hook: if the step's .done marker appears (operator
# decision to cut a training short), succeed immediately so the queue
# advances instead of retrying the killed step.
if [ -f "${LOG%.log}.done" ]; then echo "stallguard: ${LOG%.log}.done present, skipping"; exit 0; fi
touch "$LOG"
setsid env PYTHONUNBUFFERED=1 "$@" >> "$LOG" 2>&1 &
PID=$!
# Publish the child's pid (it is its own process-group/session leader) so
# bench.py can SIGSTOP the training group for an uncontended timing window
# and SIGCONT it afterwards; cleaned up on exit.
echo "$PID" > "${LOG%.log}.pid"
trap 'rm -f "${LOG%.log}.pid"' EXIT
start=$(date +%s)
# Cap the cumulative SIGSTOP-pause allowance: if bench.py dies without its
# SIGCONT hook (SIGKILL/OOM skip atexit), the trainer would otherwise stay
# stopped forever while the T-state branch extends the budget indefinitely.
# Past the cap stallguard resumes the group itself and normal accounting
# takes over.
PAUSE_CAP=${SG_PAUSE_CAP:-2700}
paused=0

newest_mtime() {
  local best
  best=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  if [ -n "${SG_PROGRESS:-}" ]; then
    local IFS=':'
    local pat t
    for pat in $SG_PROGRESS; do
      # shellcheck disable=SC2086
      for f in $pat; do
        t=$(stat -c %Y "$f" 2>/dev/null || echo 0)
        (( t > best )) && best=$t
      done
    done
  fi
  echo "$best"
}

while kill -0 "$PID" 2>/dev/null; do
  sleep 15
  # Externally paused (bench.py holds the chip and SIGSTOPped the training
  # group): not a stall — skip the liveness check and extend the total
  # budget by the paused interval so a long bench can't eat the step's time.
  state=$(ps -o stat= -p "$PID" 2>/dev/null || true)
  if [[ "${state:-}" == T* ]]; then
    if (( paused >= PAUSE_CAP )); then
      echo "stallguard: pause cap ${PAUSE_CAP}s exceeded; SIGCONT group $PID" >> "$LOG"
      kill -CONT -- "-$PID" 2>/dev/null
    else
      paused=$((paused + 15))
      start=$((start + 15))
      touch "$LOG"   # keep mtime fresh so resume doesn't read as a stall
      continue
    fi
  fi
  now=$(date +%s)
  mt=$(newest_mtime)
  (( mt == 0 )) && mt=$now
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
