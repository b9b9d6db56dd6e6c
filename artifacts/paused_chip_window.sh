#!/bin/bash
# paused_chip_window.sh CMD... — run CMD with the chip to itself:
# takes /tmp/bench_active.lock (the queue's run_train/run_once wait on it)
# and SIGSTOPs any live stallguard-published training group for the
# duration, resuming it on ANY exit path. Mirrors bench.py's pause
# protocol for ad-hoc probes (uncontended kernel A/Bs, VERDICT r4 item 6).
#
# The stallguard WATCHER (the published pid's parent) is suspended first:
# once a watcher's cumulative pause allowance is spent it SIGCONTs its
# child within 15 s of any external STOP, which silently turns the
# "uncontended" window contended (observed after BENCH_r05 try 2 burned
# the whole allowance). Suspending the watcher also freezes its
# stall/budget clocks, so the training step is not charged for the window.
set -u
cd /root/repo
PIDS=()
WATCHERS=()
for f in runs/r5/*.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f" 2>/dev/null)
  [ -n "$p" ] && kill -0 "$p" 2>/dev/null || continue
  PIDS+=("$p")
  w=$(ps -o ppid= -p "$p" 2>/dev/null | tr -d ' ')
  [ -n "$w" ] && [ "$w" != 1 ] && WATCHERS+=("$w")
done
cleanup() {
  for p in ${PIDS[@]+"${PIDS[@]}"}; do kill -CONT -- "-$p" 2>/dev/null; done
  for w in ${WATCHERS[@]+"${WATCHERS[@]}"}; do kill -CONT "$w" 2>/dev/null; done
  rm -f /tmp/bench_active.lock
}
trap cleanup EXIT INT TERM
touch /tmp/bench_active.lock
for w in ${WATCHERS[@]+"${WATCHERS[@]}"}; do
  kill -STOP "$w" 2>/dev/null && echo "# suspended watcher $w" >&2
done
for p in ${PIDS[@]+"${PIDS[@]}"}; do
  kill -STOP -- "-$p" 2>/dev/null && echo "# paused group $p" >&2
done
"$@"
