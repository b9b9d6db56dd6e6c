#!/bin/bash
# Round-5 queue, part B: restart after the mid-round VM wipe.
#
# The wipe cost runs/ (the λ=0.013 50-epoch orbax state reached at 08:26
# and the λ=0.05 full-state resume) but NOT the committed artifacts:
# wacnn_stanh VR weights + strict gate record are in git
# (checkpoints/wacnn_stanh_vr_r5.*, docs/rd_stanh_gate_r5.jsonl), so the
# VR steps are pre-marked done here. What remains, in VERDICT-r4 priority
# order (item 2 outranks the second VR family now that item 4 landed):
#   1. tcm λ=0.013: e29 committed snapshot + 21 epochs -> recipe 50.
#   2. tcm λ=0.05:  e11 committed snapshot + 39 epochs -> recipe 50.
#   3. snapshots WITH epoch offsets (VERDICT weak #4) + immediate git
#      commit (this reboot proved uncommitted weights are one power cycle
#      from gone) + 3-λ --real TPU eval.
#   4. scale_gain VR (16 epochs, N=192) + interpolation sweep (items 4+8).
#   5. tail: high-res probe + uncontended kernel A/Bs.
#
# Warm-start semantics: attempt 1 resumes from the committed fp16 npz
# restored to orbax (params-only; cli/train.py:110-118 ignores
# --continue_train for these). Retries resume the NEW run's own per-epoch
# full-state ckpts with --continue_train, carrying Adam/plateau/epoch.
set -u
cd /root/repo
mkdir -p runs/r5 runs/r5/bin
cp artifacts/stallguard.sh runs/r5/bin/
LOG=runs/r5/queue.log
exec >> "$LOG" 2>&1

echo "$(date +%F-%T) queue r5c: start (post-wipe restore)"

# ---- restore completed-step state from committed artifacts ------------------
for s in vr_stanh gate_stanh snap_stanh; do touch "runs/r5/${s}.done"; done
cp -n docs/rd_stanh_gate_r5.jsonl runs/r5/rd_stanh_gate_r5.jsonl 2>/dev/null

wait_corpus() {
  until [ -f data_synth/train/data/synth_01199.png ] \
     && [ -f data_synth/test/data/synth_00023.png ]; do
    echo "$(date +%F-%T) queue r5c: corpus regenerating, waiting"
    sleep 60
  done
}

wait_tpu() {
  until timeout 240 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    echo "$(date +%F-%T) queue r5c: tpu down, waiting"
    sleep 120
  done
  echo "$(date +%F-%T) queue r5c: tpu reachable"
}

wait_bench() {  # ADVICE r4: never launch a step while bench holds the chip
  while [ -f /tmp/bench_active.lock ]; do
    echo "$(date +%F-%T) queue r5c: bench active, waiting"
    sleep 15
  done
}

git_commit_ckpts() {  # commit snapshots the moment they exist (wipe-proof)
  local msg="$1"
  local try
  for try in 1 2 3 4 5; do
    if git add checkpoints/ 2>/dev/null \
       && git commit -m "$msg" --quiet; then
      echo "$(date +%F-%T) committed: $msg"; return 0
    fi
    sleep 20  # index.lock contention with the interactive session
  done
  echo "$(date +%F-%T) COMMIT FAILED: $msg"
}

run_train() {  # run_train NAME TOTAL_S CKPT_GLOB CMD...
  local name="$1" tmo="$2" glob="$3"; shift 3
  local marker="runs/r5/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  local attempt rc ck
  for attempt in $(seq 1 24); do
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

run_once() {  # run_once NAME TOTAL_S CMD...
  local name="$1" tmo="$2"; shift 2
  local marker="runs/r5/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  local attempt
  for attempt in 1 2 3 4 5 6; do
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

restore_seed() {  # restore_seed NPZ DIR — params-only orbax seed for run_train
  local npz="$1" dir="$2"
  [ -d "$dir/_seed.ckpt" ] && return 0
  mkdir -p "$dir"
  python artifacts/snapshot_ckpt.py --restore "$npz" --to "$dir/_seed.ckpt"
}

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

wait_corpus

# ---- 1. tcm λ=0.013: committed e29 snapshot + 21 epochs --------------------
restore_seed checkpoints/tcm_s_lambda0.013_e29.npz runs/snap_tcm_64_e29__0.013_
SG_PROGRESS="runs/*tcm_64_*_0.013_/*.ckpt/*" run_train tcm_013r5 10800 \
  "runs/*tcm_64_*_0.013_/*.ckpt" \
  $TRAIN -m tcm --N 64 --M 320 -e 21 --lambda_list 0.013

ck=$(ls -dt runs/pret*tcm_64_*_0.013_/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ] && [ ! -f runs/r5/snap_013.done ]; then
  python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$ck")" \
    --out checkpoints/tcm_s_lambda0.013_r5 --epoch-offset 29 \
    --command "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.013" \
    --note "round-5: lambda=0.013 at the full 50-epoch recipe (29 snapshot epochs + 21 continuation; retries within the continuation carry optimizer state)" \
    && touch runs/r5/snap_013.done \
    && git_commit_ckpts "RD curve: lambda=0.013 trained to the 50-epoch recipe"
fi

# ---- 2. tcm λ=0.05: committed e11 snapshot + 39 epochs ---------------------
restore_seed checkpoints/tcm_s_lambda0.05_e11.npz runs/snap_tcm_64_e11__0.05_
SG_PROGRESS="runs/*tcm_64_*_0.05_/*.ckpt/*" run_train tcm_05r5 18000 \
  "runs/*tcm_64_*_0.05_/*.ckpt" \
  $TRAIN -m tcm --N 64 --M 320 -e 39 --lambda_list 0.05

ck=$(ls -dt runs/pret*tcm_64_*_0.05_/_very_best.ckpt 2>/dev/null | head -1)
if [ -n "$ck" ] && [ ! -f runs/r5/snap_05.done ]; then
  python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$ck")" \
    --out checkpoints/tcm_s_lambda0.05_r5 --epoch-offset 11 \
    --command "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.05" \
    --note "round-5: lambda=0.05 at the full 50-epoch recipe (11 snapshot epochs + 39 continuation; retries within the continuation carry optimizer state)" \
    && touch runs/r5/snap_05.done \
    && git_commit_ckpts "RD curve: lambda=0.05 trained to the 50-epoch recipe"
fi

# ---- 3. 3-λ --real TPU eval ------------------------------------------------
if [ ! -f runs/r5/eval_tcm.done ]; then
  wait_bench; wait_tpu
  {
    for lam in 0.0025 0.013 0.05; do
      ck=$(ls -dt runs/pret*tcm_64_*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
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

# ---- 4. variable-rate scale_gain + interpolation sweep ---------------------
SG_PROGRESS="runs/*scale_gain_192_*/*.ckpt/*" run_train vr_gain 10800 \
  "runs/*scale_gain_192_*/*.ckpt" \
  $TRAIN -m scale_gain -e 16 --N 192 --M 320 \
  --lambda_list 0.0025 0.013 0.05

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
      && touch runs/r5/snap_gain.done \
      && git_commit_ckpts "scale_gain VR trained at recipe scale (N=192)"
  fi
fi

# ---- 5. tail: high-res probe + uncontended kernel A/Bs ---------------------
run_once hires 3600 python artifacts/probe_hires.py
run_once ab_kernels 3600 python artifacts/probe_kernels_ab.py

echo "$(date +%F-%T) queue r5c complete"
