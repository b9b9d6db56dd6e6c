#!/bin/bash
# CPU fallback v2 — corrected variable-rate recipe (round 3).
#
# v1 (train_cpu_fallback.sh -> runs/r3cpu) trained wacnn_stanh with the
# parser-default --gauss_trainable no: every level's STanH stayed frozen at
# the identical init, so the 3-level eval coded identically at every level
# (root-caused via zero stanh gradients; see
# tests/test_stanh_models.py::test_stanh_grads_reach_selected_level).
# v2 passes --gauss_trainable yes (the reference's multi-rate recipe) and
# gives the gain model enough epochs for visible level separation.
#
# Marker-guarded (runs/r3cpu2/step.done); one attempt per step.
set -u
cd /root/repo
mkdir -p runs/r3cpu2
LOG=runs/r3cpu2/queue.log
exec >> "$LOG" 2>&1

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r3cpu2/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  echo "$(date +%F-%T) start $name: $*"
  if timeout "$tmo" "$@"; then
    touch "$marker"
    echo "$(date +%F-%T) done $name"
    return 0
  fi
  echo "$(date +%F-%T) FAILED $name"
  return 1
}

TRAIN="python -m reslic_tcm_tpu.cli.train --platform cpu \
  -d /root/repo/data_synth --num_images 240 --num_images_val 8 \
  --batch-size 4 --patch-size 64 64 --seed 42 -n 2 \
  --save --save_path /root/repo/runs/r3cpu2 --kodak /nonexistent"

# A. multi-rate STanH with TRAINABLE quantizers (the fix)
run_step wacnn_stanh_cpu 7200 $TRAIN -m wacnn_stanh --N 64 -e 12 \
  --lambda_list 0.0025 0.0067 0.025 --gauss_trainable yes yes yes

# B. gain model: longer run for measurable level separation
run_step scale_gain_cpu 5400 $TRAIN -m scale_gain --N 64 --M 128 -e 30 \
  --lambda_list 0.0025 0.025

DATA=/root/repo/data_synth/test/data

# C. per-level real-codec eval of the multi-rate STanH model
ck=$(ls -dt runs/r3cpu2/*wacnn_stanh*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ]; then
  run_step eval_stanh_cpu 5400 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model wacnn_stanh --N 64 --M 320 --real \
    --lambda_list 0.0025 0.0067 0.025 --checkpoint $(realpath "$ck") \
    2>&1 | tee runs/r3cpu2/eval_wacnn_stanh.log | tail -8"
fi

# D. gain: discrete-level eval
gck=$(ls -dt runs/r3cpu2/*scale_gain*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$gck" ]; then
  run_step eval_gain_cpu 5400 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model scale_gain --N 64 --M 128 --real \
    --lambda_list 0.0025 0.025 --checkpoint $(realpath "$gck") \
    2>&1 | tee runs/r3cpu2/eval_scale_gain.log | tail -6"

  # E. interpolated-rate sweep (monotone bpp gate)
  run_step gain_sweep_cpu 3600 bash -c "SWEEP_CPU=1 SWEEP_N=64 SWEEP_M=128 \
    python artifacts/gain_sweep.py $(realpath "$gck") \
    2>&1 | tee runs/r3cpu2/gain_sweep.log | tail -10"
fi

echo "$(date +%F-%T) cpu fallback v2 queue complete"
