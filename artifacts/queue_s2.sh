#!/bin/bash
# Round-4 session-2 chip queue: wait out the wedged tunnel, then run the
# headline bench the moment the TPU answers. Training/perf steps are
# dispatched separately once the bench number is known (the allocation
# decision depends on it). Everything is deadline-bounded so the chip is
# FREE before the driver's own end-of-round bench.
set -u
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue_s2.log
exec >> "$LOG" 2>&1

DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-7200} ))

wait_tpu() {
  until timeout 240 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    if (( $(date +%s) > DEADLINE )); then
      echo "$(date +%F-%T) queue_s2: deadline passed while tunnel down"
      exit 1
    fi
    echo "$(date +%F-%T) queue_s2: tpu down, waiting"
    sleep 90
  done
  echo "$(date +%F-%T) queue_s2: tpu reachable"
}

wait_tpu
echo "$(date +%F-%T) queue_s2: starting bench"
bash artifacts/stallguard.sh 600 1800 runs/r4/bench_s2.log \
  python bench.py --out runs/r4/bench_s2.json
rc=$?
echo "$(date +%F-%T) queue_s2: bench rc=$rc"
cat runs/r4/bench_s2.json 2>/dev/null
touch runs/r4/bench_s2.done
