#!/bin/bash
# CPU fallback v3b — gain model with spread init (round 3).
#
# The v2 ones-init scale_gain run separated its two levels by only 1.2%
# bpp after 30 CPU epochs (runs/r3cpu2/gain_sweep.log) — matching the
# reference's init (GainBalle2018.py:73-76) but not demonstrable inside a
# CPU budget. --gain_init_spread 2.0 puts the per-level y gains on a
# geometric ladder (0.5, 2.0 at 2 levels) so the interpolated-rate sweep
# shows a real rate range from epoch 0.
#
# Waits for the v3 stanh queue to release the CPU. Marker-guarded
# (runs/r3cpu3/step.done).
set -u
cd /root/repo
mkdir -p runs/r3cpu3
LOG=runs/r3cpu3/queue_b.log
exec >> "$LOG" 2>&1

# wait for v3's queue (pid file) to finish before competing for cores
for i in $(seq 1 200); do
  [ -f runs/r3cpu3/wacnn_stanh_cpu.done ] && break
  v3pid=$(cat /tmp/cpuq3.pid 2>/dev/null)
  { [ -z "$v3pid" ] || ! kill -0 "$v3pid" 2>/dev/null; } && break
  sleep 60
done

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r3cpu3/${name}.done"
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
  --save --save_path /root/repo/runs/r3cpu3 --kodak /nonexistent"

# A. gain model, spread init
run_step scale_gain_cpu 7200 $TRAIN -m scale_gain --N 64 --M 128 -e 30 \
  --lambda_list 0.0025 0.025 --gain_init_spread 2.0

DATA=/root/repo/data_synth/test/data
gck=$(ls -dt runs/r3cpu3/*scale_gain*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$gck" ]; then
  # B. discrete-level eval
  run_step eval_gain_cpu 5400 bash -c "python -m reslic_tcm_tpu.cli.eval \
    --platform cpu --data $DATA --model scale_gain --N 64 --M 128 --real \
    --lambda_list 0.0025 0.025 --checkpoint $(realpath "$gck") \
    2>&1 | tee runs/r3cpu3/eval_scale_gain.log | tail -6"

  # C. interpolated-rate sweep (monotone bpp gate)
  run_step gain_sweep_cpu 3600 bash -c "SWEEP_CPU=1 SWEEP_N=64 SWEEP_M=128 \
    python artifacts/gain_sweep.py $(realpath "$gck") \
    2>&1 | tee runs/r3cpu3/gain_sweep.log | tail -10"
fi

echo "$(date +%F-%T) cpu fallback v3b queue complete"
