#!/bin/bash
# Round-3 training queue: waits for the tunneled TPU, then runs the
# VERDICT round-3 training items in value order. Each step is marker-
# guarded (runs/r3/step_N.done) so the queue can be restarted; a training
# step that fails (tunnel drop / timeout mid-run) RESUMES from the newest
# checkpoint matching its run tag on the next attempt, so no epoch is
# ever trained twice. After training, the RD eval driver and a
# trained-checkpoint bench row run on the same queue.
#
# v2 (this file): epochs raised toward the reference recipe (50 for the
# main RD point, 30-40 elsewhere) — the round-1 measurement showed the
# TPU trains TCM-Large at ~35 img/s, so 50 epochs over the 1200-image
# corpus is ~30 min, not hours; the bottleneck is tunnel uptime, which
# the resume-aware retries absorb.
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
  for attempt in 1 2 3 4; do
    wait_tpu
    echo "$(date +%F-%T) start $name (attempt $attempt): $*"
    # stallguard, not plain timeout: the tunnel's failure mode is a
    # silent mid-RPC wedge; progress (log growth) is the liveness signal
    # and a wedged attempt must not burn the whole step budget.
    if bash artifacts/stallguard.sh 900 "$tmo" "runs/r3/${name}.log" "$@"; then
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

# newest checkpoint file whose run-dir name contains the tag (the train CLI
# writes per-epoch ckpts and _very_best into runs/<check><model>_<N>_..._<lambdas>_)
latest_ckpt() {
  ls -t runs/*"$1"*/*.ckpt 2>/dev/null | head -1
}

# Resume-aware training step: on every attempt, continue from the newest
# checkpoint matching the tag if one exists (first attempt may already
# resume a run from a previous queue incarnation).
run_train() {
  local name="$1"; shift
  local tmo="$1"; shift
  local tag="$1"; shift
  local marker="runs/r3/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  for attempt in 1 2 3 4; do
    wait_tpu
    local resume=()
    local ck
    ck=$(latest_ckpt "$tag")
    [ -n "$ck" ] && resume=(--continue_train --checkpoint "$(realpath "$ck")")
    echo "$(date +%F-%T) start $name (attempt $attempt) resume=${ck:-none}: $*"
    if bash artifacts/stallguard.sh 900 "$tmo" "runs/r3/${name}.log" \
        "$@" "${resume[@]}"; then
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

# 1. the main RD point: lambda=0.0025 TCM-Small to the 50-epoch recipe
#    (currently at epoch ~9 from round 2; resumes automatically)
run_train tcm_0025_r3 10800 "tcm_64_False__25_25_25___0.0025_" \
  $TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.0025

# 2-3. two more RD points for the 3-point curve
run_train tcm_013 10800 "tcm_64_False__25_25_25___0.013_" \
  $TRAIN -m tcm --N 64 --M 320 -e 30 --lambda_list 0.013
run_train tcm_05 10800 "tcm_64_False__25_25_25___0.05_" \
  $TRAIN -m tcm --N 64 --M 320 -e 30 --lambda_list 0.05

# 4. multi-rate STanH (3 levels, gap_stoc annealing drives beta).
# --gauss_trainable yes is REQUIRED for variable-rate behavior: the
# parser default "no" freezes every level at the identical init (see
# tests/test_stanh_models.py::test_stanh_grads_reach_selected_level).
# Per-level staircase inits (fixed num_sigmoids, descending extrema =
# descending step size) seed rate separation at epoch 0 the way the
# reference's per-level configs do — the CPU-fallback v2 run showed
# identical inits need far more epochs to separate than the budget has.
run_train wacnn_stanh 12600 "wacnn_stanh" \
  $TRAIN -m wacnn_stanh -e 40 \
  --lambda_list 0.0025 0.0067 0.025 --gauss_trainable yes yes yes \
  --gauss_num_sigmoids 32 32 32 --gauss_extrema 32 16 8

# 5. gain model for the interpolated-rate sweep (spread init: levels
# separated from epoch 0; the ones-init CPU run stayed within 0.1%)
run_train scale_gain 10800 "scale_gain" \
  $TRAIN -m scale_gain -e 30 --lambda_list 0.0025 0.025 \
  --gain_init_spread 2.0

# 6. RD eval of everything the queue trained (real codec, held-out set)
run_step eval_rd 14400 bash artifacts/eval_rd_r3.sh

# 7. bench on the trained TCM-Small checkpoint (VERDICT item 7: real
#    weights + real PSNR next to the throughput row)
run_step bench_ckpt 3600 bash -c '
  ck=$(ls -t runs/*tcm_64*0.0025*/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && exit 1
  python bench.py --N 64 --M 320 --checkpoint "$(realpath "$ck")" \
    2>&1 | tee runs/r3/bench_ckpt.log | tail -3
'

echo "$(date +%F-%T) queue complete"
