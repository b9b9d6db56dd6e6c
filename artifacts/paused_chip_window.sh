#!/bin/bash
# paused_chip_window.sh CMD... — run CMD with the chip to itself:
# takes /tmp/bench_active.lock (the queue's run_train/run_once wait on it)
# and SIGSTOPs any live stallguard-published training group for the
# duration, resuming it on ANY exit path. Mirrors bench.py's pause
# protocol for ad-hoc probes (uncontended kernel A/Bs, VERDICT r4 item 6).
set -u
cd /root/repo
PIDS=()
for f in runs/r5/*.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f" 2>/dev/null)
  [ -n "$p" ] && kill -0 "$p" 2>/dev/null && PIDS+=("$p")
done
cleanup() {
  for p in ${PIDS[@]+"${PIDS[@]}"}; do kill -CONT -- "-$p" 2>/dev/null; done
  rm -f /tmp/bench_active.lock
}
trap cleanup EXIT INT TERM
touch /tmp/bench_active.lock
for p in ${PIDS[@]+"${PIDS[@]}"}; do
  kill -STOP -- "-$p" 2>/dev/null && echo "# paused group $p" >&2
done
"$@"
