#!/bin/bash
# Round-4 restart queue (session c): the VM reset wiped runs/ mid-round, so
# the live orbax checkpoints are gone. This queue restarts the remaining
# round-4 training items from the committed fp16 snapshots
# (checkpoints/tcm_s_lambda*.npz) — exactly the wipe-survival path VERDICT
# r3 #5 demanded — and finishes with the variable-rate runs.
#
# Warm starts are params-only (no optimizer state), so each resume runs a
# fresh LR schedule for the REMAINING epochs: λ=0.013 e29 + 21 → recipe 50,
# λ=0.05 e11 + 39 → recipe 50.
#
# Coordination with the driver's end-of-round bench: stallguard publishes
# the trainee's pid at runs/r4/<step>.pid; bench.py SIGSTOPs that group for
# its timing window and SIGCONTs after, and stallguard tolerates state T.
set -u
cd /root/repo
mkdir -p runs/r4 runs/r4/bin
cp artifacts/stallguard.sh runs/r4/bin/
LOG=runs/r4/queue.log
exec >> "$LOG" 2>&1

echo "$(date +%F-%T) queue c: start"

# Don't start until the in-session bench probe finished (marker) or 30 min.
for _ in $(seq 120); do
  [ -f /tmp/bench_now.json ] && break
  sleep 15
done

# Corpus must exist (deterministic regen may still be running; test split
# is written after the 1200 train images, so its count is the done signal).
until [ "$(ls data_synth/test/data 2>/dev/null | wc -l)" -ge 24 ]; do
  echo "$(date +%F-%T) queue c: waiting for corpus regen"
  sleep 60
done

wait_tpu() {
  until timeout 240 python -c "
import jax
jax.devices()
import jax.numpy as jnp
float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())
" > /dev/null 2>&1; do
    echo "$(date +%F-%T) queue c: tpu down, waiting"
    sleep 120
  done
  echo "$(date +%F-%T) queue c: tpu reachable"
}

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="runs/r4/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  for attempt in 1 2 3 4; do
    wait_tpu
    echo "$(date +%F-%T) start $name (attempt $attempt): $*"
    if bash runs/r4/bin/stallguard.sh 900 "$tmo" "runs/r4/${name}.log" "$@"; then
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

latest_ckpt() {  # newest orbax ckpt dir whose run dir matches the tag
  ls -dt runs/*"$1"*/*.ckpt 2>/dev/null | head -1
}

restore_warm() {  # restore_warm <npz> <dest>; idempotent
  [ -d "$2" ] && return 0
  python artifacts/snapshot_ckpt.py --restore "$1" --to "$2"
}

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

# ---- λ=0.013: e29 snapshot + 21 epochs → recipe-50 equivalent -------------
if [ ! -f runs/r4/tcm_013c.done ]; then
  ck=$(latest_ckpt "_0.013_")
  if [ -z "$ck" ]; then
    restore_warm checkpoints/tcm_s_lambda0.013_e29.npz runs/r4/warm_013.ckpt
    ck=runs/r4/warm_013.ckpt
  fi
  SG_PROGRESS="runs/*_0.013_*/*.ckpt/*" run_step tcm_013c 21600 \
    $TRAIN -m tcm --N 64 --M 320 -e 21 --lambda_list 0.013 \
    --checkpoint "$(realpath "$ck")"
fi

# ---- λ=0.05: e11 snapshot + 39 epochs → recipe-50 equivalent --------------
if [ ! -f runs/r4/tcm_05c.done ]; then
  ck=$(latest_ckpt "_0.05_")
  if [ -z "$ck" ]; then
    restore_warm checkpoints/tcm_s_lambda0.05_e11.npz runs/r4/warm_05.ckpt
    ck=runs/r4/warm_05.ckpt
  fi
  SG_PROGRESS="runs/*_0.05_*/*.ckpt/*" run_step tcm_05c 28800 \
    $TRAIN -m tcm --N 64 --M 320 -e 39 --lambda_list 0.05 \
    --checkpoint "$(realpath "$ck")"
fi

# ---- snapshot both fresh points into git-committable npz -------------------
for lam in 0.013 0.05; do
  ck=$(ls -dt runs/*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && continue
  python artifacts/snapshot_ckpt.py --ckpt "$ck" \
    --out "checkpoints/tcm_s_lambda${lam}_r4c" \
    --command "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list $lam" \
    --note "round-4 session-c resume from committed npz after VM wipe"
done

# ---- final TCM RD eval on the freshest checkpoints (8 test images) ---------
if [ ! -f runs/r4/eval_tcmc.done ]; then
  wait_tpu
  {
    for lam in 0.0025 0.013 0.05; do
      ck=$(ls -dt runs/*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
      if [ -z "$ck" ]; then
        npz=$(ls checkpoints/tcm_s_lambda${lam}*.npz 2>/dev/null | tail -1)
        [ -z "$npz" ] && continue
        restore_warm "$npz" "runs/r4/eval_${lam}.ckpt"
        ck="runs/r4/eval_${lam}.ckpt"
      fi
      echo "=== final eval lambda=$lam ckpt=$ck"
      timeout 3600 python -m reslic_tcm_tpu.cli.eval --data data_synth/test/data \
        --N 64 --M 320 --real --bf16 --checkpoint "$(realpath "$ck")" \
        2>&1 | tail -6
    done
  } >> runs/r4/eval_tcmc.log 2>&1
  touch runs/r4/eval_tcmc.done
fi

# ---- variable-rate at the recipe scale (VERDICT r3 #4) ---------------------
if [ ! -f runs/r4/vr_stanh.done ]; then
  SG_PROGRESS="runs/*stanh*/*.ckpt/*" run_step vr_stanh 28800 \
    $TRAIN -m wacnn_stanh -e 16 --N 192 --M 320 \
    --lambda_list 0.0025 0.013 0.05 --gauss_trainable yes yes yes \
    --gauss_extrema 32 16 8 --gauss_num_sigmoids 16 16 16
fi
if [ ! -f runs/r4/vr_gain.done ]; then
  SG_PROGRESS="runs/*gain*/*.ckpt/*" run_step vr_gain 21600 \
    $TRAIN -m scale_gain -e 16 --N 192 --M 320 \
    --lambda_list 0.0025 0.013 0.05
fi

# VR eval through the codec-consistent gate
if [ -f runs/r4/vr_stanh.done ] && [ ! -f runs/r4/eval_vrc.done ]; then
  wait_tpu
  ck=$(ls -dt runs/*stanh*/_very_best.ckpt 2>/dev/null | head -1)
  [ -n "$ck" ] && timeout 3600 python artifacts/eval_rd_stanh.py \
    --ckpt "$(realpath "$ck")" --extrema 32 16 8 \
    --num_sigmoids 16 16 16 >> runs/r4/eval_vrc.log 2>&1
  touch runs/r4/eval_vrc.done
fi

echo "$(date +%F-%T) queue c complete"
