#!/bin/bash
# Round-3 training queue: waits for the tunneled TPU, then runs the
# VERDICT round-3 training items in value order. Each step is marker-
# guarded (runs/r3/step_N.done) so the queue can be restarted; a step
# that fails (tunnel drop mid-run) is retried after the TPU probe goes
# green again, up to 3 attempts.
set -u
cd /root/repo
mkdir -p runs/r3
LOG=runs/r3/queue.log
exec >> "$LOG" 2>&1

wait_tpu() {
  until timeout 75 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    echo "$(date +%F-%T) queue: tpu down, waiting"
    sleep 120
  done
  echo "$(date +%F-%T) queue: tpu reachable"
}

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r3/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  for attempt in 1 2 3; do
    wait_tpu
    echo "$(date +%F-%T) start $name (attempt $attempt): $*"
    if timeout "$tmo" "$@"; then
      touch "$marker"
      echo "$(date +%F-%T) done $name"
      return 0
    fi
    echo "$(date +%F-%T) FAILED $name (attempt $attempt)"
    sleep 60
  done
  echo "$(date +%F-%T) giving up on $name"
  return 1
}

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

# 0. kernel A/B (informs the bench configuration; ~5 min)
run_step ab_probe 1800 python artifacts/probe_kernels_ab.py

# 1. resume the lambda=0.0025 TCM-Small toward the 30-epoch mark
run_step tcm_0025_resume 7200 $TRAIN -m tcm --N 64 --M 320 -e 30 \
  --lambda_list 0.0025 --continue_train \
  --checkpoint /root/repo/runs/zerotcm_64_False__25_25_25___0.0025_/_very_best.ckpt

# 2-3. two more RD points for the curve
run_step tcm_013 5400 $TRAIN -m tcm --N 64 --M 320 -e 12 --lambda_list 0.013
run_step tcm_05 5400 $TRAIN -m tcm --N 64 --M 320 -e 12 --lambda_list 0.05

# 4. multi-rate STanH (3 levels, gap_stoc annealing drives beta).
# --gauss_trainable yes is REQUIRED for variable-rate behavior: the
# parser default "no" freezes every level at the identical init (see
# tests/test_stanh_models.py::test_stanh_grads_reach_selected_level).
run_step wacnn_stanh 9000 $TRAIN -m wacnn_stanh -e 12 \
  --lambda_list 0.0025 0.0067 0.025 --gauss_trainable yes yes yes

# 5. gain model for the interpolated-rate sweep
run_step scale_gain 5400 $TRAIN -m scale_gain -e 10 \
  --lambda_list 0.0025 0.025

echo "$(date +%F-%T) queue complete"
