#!/bin/bash
# Round-4 tail: after the main queue finishes (eval_vr.done or "queue
# complete"), resume the lambda=0.013 TCM-Small point toward the 50-epoch
# recipe (the converged lambda=0.0025 point exposed how undertrained the
# epoch-29 mid-rate point is — the curve needs it for monotonicity), then
# re-run the TCM RD eval so the final table uses the freshest weights.
set -u
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/tail.log
exec >> "$LOG" 2>&1

echo "$(date +%F-%T) tail: waiting for main queue"
until [ -f runs/r4/eval_vr.done ] || grep -q "queue complete" runs/r4/queue.log 2>/dev/null; do
  sleep 60
done
echo "$(date +%F-%T) tail: main queue done"

wait_tpu() {
  until timeout 240 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    echo "$(date +%F-%T) tail: tpu down, waiting"
    sleep 120
  done
}

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

marker=runs/r4/tcm_013_tail.done
if [ ! -f "$marker" ]; then
  for attempt in 1 2 3 4 5 6; do
    wait_tpu
    ck=$(ls -dt runs/*tcm_64_False__25_25_25___0.013_*/*.ckpt 2>/dev/null | head -1)
    resume=()
    [ -n "$ck" ] && resume=(--continue_train --checkpoint "$(realpath "$ck")")
    echo "$(date +%F-%T) tail: tcm_013 resume (attempt $attempt) from ${ck:-none}"
    if SG_PROGRESS="runs/*tcm_64_False__25_25_25___0.013_*/*.ckpt/*" \
       bash runs/r4/bin/stallguard.sh 900 10800 runs/r4/tcm_013_tail.log \
        $TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.013 "${resume[@]}"; then
      touch "$marker"
      break
    fi
    echo "$(date +%F-%T) tail: tcm_013 attempt $attempt FAILED"
    sleep 60
  done
fi

# final TCM RD eval on the freshest checkpoints (all 24 held-out images)
wait_tpu
for lam in 0.0025 0.013 0.05; do
  ck=$(ls -dt runs/*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && continue
  echo "=== final eval lambda=$lam ckpt=$ck"
  timeout 3600 python -m reslic_tcm_tpu.cli.eval --data data_synth/test/data \
    --N 64 --M 320 --real --bf16 --checkpoint "$(realpath "$ck")" \
    2>&1 | tail -5
done
echo "$(date +%F-%T) tail complete"
