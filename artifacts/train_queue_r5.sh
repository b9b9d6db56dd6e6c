#!/bin/bash
# Round-5 training queue. Order follows VERDICT r4 "Next round" items:
#   1. Variable-rate FIRST (item 4 — starved two rounds): wacnn_stanh 3-level
#      and scale_gain at the 256^2 recipe, N=192, then the strict
#      codec-consistent gate writing runs/r5/rd_stanh_gate_r5.jsonl.
#   2. tcm lambda=0.05 resumed WITH optimizer state (--continue_train; the
#      params-only restarts are what VERDICT item 2 flagged).
#   3. fp16 snapshots + manifests (real epoch fields), 3-lambda --real eval.
#   4. High-res probe + uncontended kernel A/Bs in the tail.
#
# Retry semantics: every training attempt after the first warm-resumes from
# the newest orbax ckpt in its own run dir with --continue_train, so a retry
# carries Adam/plateau/epoch state. A total-budget stop (rc=125) ACCEPTS the
# partial result and advances — per-epoch full-state checkpoints exist, and
# queue overruns are exactly how VR got starved in rounds 3 and 4.
set -u
cd /root/repo
mkdir -p runs/r5 runs/r5/bin
cp artifacts/stallguard.sh runs/r5/bin/
LOG=runs/r5/queue.log
exec >> "$LOG" 2>&1

echo "$(date +%F-%T) queue r5: start"

wait_tpu() {
  until timeout 240 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    echo "$(date +%F-%T) queue r5: tpu down, waiting"
    sleep 120
  done
  echo "$(date +%F-%T) queue r5: tpu reachable"
}

wait_bench() {  # ADVICE r4: never launch a step while bench holds the chip
  while [ -f /tmp/bench_active.lock ]; do
    echo "$(date +%F-%T) queue r5: bench active, waiting"
    sleep 15
  done
}

# run_train NAME TOTAL_S CKPT_GLOB CMD...
# Attempt 1 uses CMD as-is (or resumes if the glob already matches — e.g.
# the preempted tcm 0.05 run); later attempts resume from the newest ckpt.
run_train() {
  local name="$1" tmo="$2" glob="$3"; shift 3
  local marker="runs/r5/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  local attempt rc ck
  for attempt in 1 2 3 4; do
    wait_bench
    wait_tpu
    ck=$(ls -dt $glob 2>/dev/null | head -1)
    local extra=()
    [ -n "$ck" ] && extra=(--checkpoint "$(realpath "$ck")" --continue_train)
    echo "$(date +%F-%T) start $name (attempt $attempt): $* ${extra[*]:-}"
    bash runs/r5/bin/stallguard.sh 900 "$tmo" "runs/r5/${name}.log" \
      "$@" "${extra[@]}"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$marker"; echo "$(date +%F-%T) done $name"; return 0
    fi
    if [ "$rc" -eq 125 ]; then
      echo "$(date +%F-%T) budget-stop $name: accepting partial progress"
      touch "$marker"; return 0
    fi
    echo "$(date +%F-%T) FAILED $name rc=$rc (attempt $attempt)"
    sleep 60
  done
  echo "$(date +%F-%T) giving up on $name"
  return 1
}

run_once() {  # run_once NAME TOTAL_S CMD... — non-training steps, 2 attempts
  local name="$1" tmo="$2"; shift 2
  local marker="runs/r5/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  local attempt
  for attempt in 1 2; do
    wait_bench
    wait_tpu
    echo "$(date +%F-%T) start $name (attempt $attempt): $*"
    if timeout "$tmo" "$@" >> "runs/r5/${name}.log" 2>&1; then
      touch "$marker"; echo "$(date +%F-%T) done $name"; return 0
    fi
    echo "$(date +%F-%T) FAILED $name (attempt $attempt)"
    sleep 60
  done
  return 1
}

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

# ---- 1a. variable-rate wacnn_stanh: 3 levels, per-level staircase ----------
SG_PROGRESS="runs/*wacnn_stanh_192_*/*.ckpt/*" run_train vr_stanh 14400 \
  "runs/*wacnn_stanh_192_*/*.ckpt" \
  $TRAIN -m wacnn_stanh -e 16 --N 192 --M 320 \
  --lambda_list 0.0025 0.013 0.05 --gauss_trainable yes yes yes \
  --gauss_extrema 32 16 8 --gauss_num_sigmoids 16 16 16

# ---- 1b. strict codec-consistent gate, immediately (the r5 deliverable) ----
vr_ck=$(ls -dt runs/*wacnn_stanh_192_*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$vr_ck" ]; then
  run_once gate_stanh 3600 python artifacts/eval_rd_stanh.py \
    --ckpt "$(realpath "$vr_ck")" --N 192 --M 320 \
    --lambda_list 0.0025 0.013 0.05 \
    --extrema 32 16 8 --num_sigmoids 16 16 16 \
    --out runs/r5/rd_stanh_gate_r5.jsonl
  if [ ! -f runs/r5/snap_stanh.done ]; then
    python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$vr_ck")" \
      --out checkpoints/wacnn_stanh_vr_r5 \
      --command "$TRAIN -m wacnn_stanh -e 16 --N 192 --M 320 --lambda_list 0.0025 0.013 0.05 --gauss_trainable yes yes yes --gauss_extrema 32 16 8 --gauss_num_sigmoids 16 16 16" \
      --note "round-5 full-size variable-rate (VERDICT r4 item 4)" \
      && touch runs/r5/snap_stanh.done
  fi
fi

# ---- 2a. variable-rate scale_gain ------------------------------------------
SG_PROGRESS="runs/*scale_gain_192_*/*.ckpt/*" run_train vr_gain 10800 \
  "runs/*scale_gain_192_*/*.ckpt" \
  $TRAIN -m scale_gain -e 16 --N 192 --M 320 \
  --lambda_list 0.0025 0.013 0.05

# ---- 2b. gain interpolation sweep on the trained model ---------------------
gn_ck=$(ls -dt runs/*scale_gain_192_*/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$gn_ck" ]; then
  SWEEP_N=192 SWEEP_M=320 SWEEP_LAMBDAS="0.0025 0.013 0.05" \
    run_once gate_gain 3600 python artifacts/gain_sweep.py \
    "$(realpath "$gn_ck")"
  if [ ! -f runs/r5/snap_gain.done ]; then
    python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$gn_ck")" \
      --out checkpoints/scale_gain_vr_r5 \
      --command "$TRAIN -m scale_gain -e 16 --N 192 --M 320 --lambda_list 0.0025 0.013 0.05" \
      --note "round-5 full-size gain variable-rate (VERDICT r4 items 4+8)" \
      && touch runs/r5/snap_gain.done
  fi
fi

# ---- 3. tcm lambda=0.05 to recipe-50: resume WITH optimizer state ----------
# The preempted run dir (runs/prettcm_64_*_0.05_) already holds full-state
# per-epoch ckpts from this morning; the glob resumes the newest one.
SG_PROGRESS="runs/*tcm_64_*_0.05_/*.ckpt/*" run_train tcm_05r5 21600 \
  "runs/*tcm_64_*_0.05_/*.ckpt" \
  $TRAIN -m tcm --N 64 --M 320 -e 39 --lambda_list 0.05

# ---- 4. snapshots with real epoch fields + 3-lambda --real eval ------------
if [ ! -f runs/r5/snap_tcm.done ]; then
  for lam in 0.013 0.05; do
    ck=$(ls -dt runs/*tcm_64_*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
    [ -z "$ck" ] && continue
    python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$ck")" \
      --out "checkpoints/tcm_s_lambda${lam}_r5" \
      --command "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list $lam" \
      --note "round-5: lambda=$lam at the full 50-epoch recipe (0.013: e29 snapshot + 21; 0.05: e11 snapshot + 39, optimizer state carried across r5 resumes)"
  done
  touch runs/r5/snap_tcm.done
fi

if [ ! -f runs/r5/eval_tcm.done ]; then
  wait_bench; wait_tpu
  {
    for lam in 0.0025 0.013 0.05; do
      ck=$(ls -dt runs/*tcm_64_*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
      if [ -z "$ck" ]; then
        npz=$(ls checkpoints/tcm_s_lambda${lam}*.npz 2>/dev/null | tail -1)
        [ -z "$npz" ] && continue
        python artifacts/snapshot_ckpt.py --restore "$npz" \
          --to "runs/r5/eval_${lam}.ckpt"
        ck="runs/r5/eval_${lam}.ckpt"
      fi
      echo "=== final eval lambda=$lam ckpt=$ck"
      timeout 3600 python -m reslic_tcm_tpu.cli.eval --data data_synth/test/data \
        --N 64 --M 320 --real --bf16 --checkpoint "$(realpath "$ck")" \
        2>&1 | tail -6
    done
  } >> runs/r5/eval_tcm.log 2>&1
  touch runs/r5/eval_tcm.done
fi

# ---- 5. tail: high-res probe + uncontended kernel A/Bs ---------------------
run_once hires 3600 python artifacts/probe_hires.py
run_once ab_kernels 3600 python artifacts/probe_kernels_ab.py

echo "$(date +%F-%T) queue r5 complete"
