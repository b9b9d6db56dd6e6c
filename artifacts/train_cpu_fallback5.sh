#!/bin/bash
# CPU fallback v5 — trained wacnn_gain (round 3).
#
# The reference's gain_wacnn has NO working compress/decompress
# (gain_wacnn.py:8-93 forward only); this framework's GainedWACNN rides
# the ChannelARCodec slice codec through the gain hooks. Training it and
# coding real streams at both levels evidences that parity-plus path on
# trained weights. Spread init for epoch-0 level separation.
#
# Marker-guarded (runs/r3cpu5/step.done); one attempt per step.
set -u
cd /root/repo
mkdir -p runs/r3cpu5
LOG=runs/r3cpu5/queue.log
exec >> "$LOG" 2>&1

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r3cpu5/${name}.done"
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
  --save --save_path /root/repo/runs/r3cpu5 --kodak /nonexistent"

# A. wacnn_gain, 2 levels, spread init
run_step wacnn_gain_cpu 10800 $TRAIN -m wacnn_gain --N 64 -e 12 \
  --lambda_list 0.0025 0.025 --gain_init_spread 2.0

DATA=/root/repo/data_synth/test/data
gck=$(ls -dt runs/r3cpu5/*wacnn_gain*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$gck" ]; then
  # B. discrete-level real-codec eval through the slice codec
  run_step eval_wacnn_gain 5400 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model wacnn_gain --N 64 --M 320 --real \
    --lambda_list 0.0025 0.025 --checkpoint $(realpath "$gck") \
    2>&1 | tee runs/r3cpu5/eval_wacnn_gain.log | tail -6"
fi

echo "$(date +%F-%T) cpu fallback v5 queue complete"
