#!/bin/bash
# CPU fallback for the round-3 variable-rate training items (VERDICT #3/#6).
#
# The tunneled TPU has been unreachable for hours this round; the TPU queue
# (train_queue_r3.sh) keeps waiting and will produce the full-scale runs if
# the tunnel returns. This fallback trains MINIATURE configs on the single
# host CPU core so that the variable-rate subsystems — STanH beta-annealing
# (multi-lambda) and gain interpolation — have *trained and measured*
# evidence either way. Results are labeled "CPU miniature" in docs and are
# superseded by the TPU runs when those land.
#
# Marker-guarded like the TPU queue (runs/r3cpu/step.done) so it can be
# restarted; one attempt per step (no tunnel to wait for).
set -u
cd /root/repo
mkdir -p runs/r3cpu
LOG=runs/r3cpu/queue.log
exec >> "$LOG" 2>&1

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r3cpu/${name}.done"
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
  --save --save_path /root/repo/runs/r3cpu --kodak /nonexistent"

# A. multi-rate STanH: 3 lambda levels, gap_stoc annealing drives beta
#    (beta trajectory printed per epoch by the train CLI)
run_step wacnn_stanh_cpu 7200 $TRAIN -m wacnn_stanh --N 64 -e 10 \
  --lambda_list 0.0025 0.0067 0.025

# B. gain model for the interpolated-rate sweep (2 anchors)
run_step scale_gain_cpu 5400 $TRAIN -m scale_gain --N 64 --M 128 -e 8 \
  --lambda_list 0.0025 0.025

DATA=/root/repo/data_synth/test/data

# C. per-level real-codec eval of the multi-rate STanH model
ck=$(ls -dt runs/r3cpu/*stanh*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ]; then
  run_step eval_stanh_cpu 5400 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model wacnn_stanh --N 64 --M 320 --real \
    --lambda_list 0.0025 0.0067 0.025 --checkpoint $(realpath "$ck") \
    2>&1 | tee runs/r3cpu/eval_wacnn_stanh.log | tail -8"
fi

# D. gain: discrete-level eval + interpolated sweep (monotone bpp gate)
ck=$(ls -dt runs/r3cpu/*gain*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ]; then
  run_step eval_gain_cpu 3600 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model scale_gain --N 64 --M 128 --real \
    --lambda_list 0.0025 0.025 --checkpoint $(realpath "$ck") \
    2>&1 | tee runs/r3cpu/eval_scale_gain.log | tail -6"
  run_step gain_sweep_cpu 3600 bash -c "SWEEP_CPU=1 SWEEP_N=64 SWEEP_M=128 \
    python artifacts/gain_sweep.py $(realpath "$ck") \
    2>&1 | tee runs/r3cpu/gain_sweep.log | tail -10"
fi

echo "$(date +%F-%T) cpu fallback queue complete"
