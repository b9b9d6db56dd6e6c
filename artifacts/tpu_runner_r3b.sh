#!/bin/bash
# Round-3b sequenced TPU runner (post-VM-reset): waits for the tunneled
# TPU, runs the headline bench first (so a real BENCH number exists the
# moment the tunnel blinks up, before training grabs the chip), then
# hands off to the marker-guarded training queue.
#
# Context: the VM rebooted 2026-08-19 04:03 UTC, wiping /tmp (old watch
# logs + nohup queue) and the gitignored runs/ + data_synth/. The tunnel
# now BLINKS: it served one probe at 04:28, came up again at 04:40, ran
# bench init for ~90 s, then wedged silently mid-compile. So every
# chip-touching step runs under artifacts/stallguard.sh (progress-based
# watchdog, SIGTERM first so bench.py's flush handler emits best-so-far
# JSON) and the headline bench retries across tunnel windows, leaning on
# the persistent JAX compile cache to get further each attempt.
set -u
cd /root/repo
mkdir -p runs/r3
LOG=runs/r3/runner.log
exec >> "$LOG" 2>&1

probe() {
  timeout 75 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1
}

wait_tpu() {
  until probe; do
    echo "$(date +%F-%T) runner: tpu down"
    sleep 120
  done
  echo "$(date +%F-%T) runner: tpu UP"
}

echo "$(date +%F-%T) runner: start"

# Headline bench (untrained scaled init) — the round's perf artifact.
# Attempt 1 autotunes on-chip; retries use --no-autotune (shorter
# critical path; fused kernels verified-then-preferred) so a short
# tunnel window still yields profile numbers.
for attempt in 1 2 3 4 5 6; do
  [ -f runs/r3/bench_headline.done ] && break
  wait_tpu
  extra=""
  [ "$attempt" -gt 1 ] && extra="--no-autotune"
  echo "$(date +%F-%T) runner: bench attempt $attempt $extra"
  bash artifacts/stallguard.sh 300 1500 runs/r3/bench_headline.log \
    python bench.py $extra
  rc=$?
  j=$(grep -h '^{"metric"' runs/r3/bench_headline.log | tail -1)
  ok=$(python -c "import json,sys; d=json.loads(sys.argv[1]); print(int(d.get('value',0)>0))" "$j" 2>/dev/null || echo 0)
  echo "$(date +%F-%T) runner: bench attempt $attempt rc=$rc ok=$ok: $j"
  if [ "$ok" = "1" ]; then
    printf '%s\n' "$j" > runs/r3/bench_headline.json
    touch runs/r3/bench_headline.done
  fi
done

# Wait for the corpus regeneration to finish before training needs it.
for i in $(seq 1 60); do
  n=$(ls data_synth/train/data 2>/dev/null | wc -l)
  [ "$n" -ge 1200 ] && break
  echo "$(date +%F-%T) runner: corpus at $n/1200, waiting"
  sleep 30
done

exec bash artifacts/train_queue_r3.sh
