#!/bin/bash
# Round-4 training queue: finish the VERDICT round-3 training items.
#
# Fixes over train_queue_r3.sh (both bit round 3):
#  * latest_ckpt used `ls -t` on orbax checkpoint DIRECTORIES, so ls
#    descended into them and emitted a "dir:" header as the path —
#    the lambda=0.0025 resume died on "...ckpt: not found".  `ls -dt`.
#  * stallguard now launches with PYTHONUNBUFFERED=1 and takes
#    SG_PROGRESS (checkpoint-dir globs) as an extra liveness signal, so
#    block-buffered logs can't look like a stall (ADVICE round 3).
#  * bench step: no inner tee (two writers garbled the log), pipefail
#    semantics via checking the emitted JSON file instead.
#
# Ordering: the three TCM-Small lambda resumes first (they have live
# round-3 checkpoints at epochs 25/29/11 and are the headline RD curve),
# then bench-on-trained-weights and the TCM RD eval (so the round's two
# must-land artifacts are secured before the long variable-rate runs),
# then wacnn_stanh / scale_gain with whatever TPU time remains.
set -u
cd /root/repo
mkdir -p runs/r4
LOG=runs/r4/queue.log
exec >> "$LOG" 2>&1

wait_tpu() {
  # 240 s: the tunnel's cold matmul compile is 25-80+ s and varies with
  # load; 75 s misdiagnosed a slow-but-healthy tunnel as down (round 4).
  until timeout 240 python -c "
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

# Newest checkpoint DIR whose run-dir name contains the tag.  -d: orbax
# checkpoints are directories; without it ls lists their contents with
# "name:" header lines and head -1 returns a path with a trailing colon.
latest_ckpt() {
  # shellcheck disable=SC2086  # tag may contain glob chars
  ls -dt runs/*$1*/*.ckpt 2>/dev/null | head -1
}

run_train() {
  local name="$1"; shift
  local tmo="$1"; shift
  local tag="$1"; shift
  local marker="runs/r4/${name}.done"
  [ -f "$marker" ] && { echo "skip $name (done)"; return 0; }
  for attempt in 1 2 3 4 5 6; do
    wait_tpu
    local resume=()
    local ck
    ck=$(latest_ckpt "$tag")
    [ -n "$ck" ] && resume=(--continue_train --checkpoint "$(realpath "$ck")")
    echo "$(date +%F-%T) start $name (attempt $attempt) resume=${ck:-none}: $*"
    if SG_PROGRESS="runs/*${tag}*/*.ckpt/*" \
       bash runs/r4/bin/stallguard.sh 900 "$tmo" "runs/r4/${name}.log" \
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

# 0. two-minute diagnosis probe: full Mosaic tracebacks for the fused
#    conv kernels (round 3 swallowed the error; the fix is blocked on it)
run_step probe_mosaic 900 python artifacts/probe_mosaic_trace.py

# 1-3. the headline RD curve: TCM-Small at three lambdas to the 50-epoch
#      recipe, resuming the surviving round-3 checkpoints (epochs 25/29/11).
run_train tcm_0025 10800 "tcm_64_False__25_25_25___0.0025_" \
  $TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.0025
run_train tcm_013 10800 "tcm_64_False__25_25_25___0.013_" \
  $TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.013
run_train tcm_05 14400 "tcm_64_False__25_25_25___0.05_" \
  $TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.05

# 4. bench on the best trained high-rate TCM-Small checkpoint (real
#    weights + real PSNR next to the throughput row).  No inner tee:
#    stallguard already captures all output in runs/r4/bench_ckpt.log.
run_step bench_ckpt 5400 bash -c '
  ck=$(ls -dt runs/*tcm_64*0.05*/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && ck=$(ls -dt runs/*tcm_64*/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && exit 1
  python bench.py --N 64 --M 320 --checkpoint "$(realpath "$ck")" \
    --out runs/r4/bench_ckpt.json
  python - <<EOF
import json
rec = json.load(open("runs/r4/bench_ckpt.json"))
assert rec.get("value", 0) > 0, rec
print("bench_ckpt ok:", rec)
EOF
'

# 5. RD eval of the trained TCM points (real codec) — secured before the
#    long variable-rate runs.
run_step eval_tcm 7200 bash runs/r4/bin/eval_rd_r4.sh tcm

# 6. multi-rate STanH at the full recipe (3 levels, gap_stoc beta).
run_train wacnn_stanh 14400 "wacnn_stanh" \
  $TRAIN -m wacnn_stanh -e 30 \
  --lambda_list 0.0025 0.0067 0.025 --gauss_trainable yes yes yes \
  --gauss_num_sigmoids 32 32 32 --gauss_extrema 32 16 8

# 7. gain model for the interpolated-rate sweep
run_train scale_gain 10800 "scale_gain" \
  $TRAIN -m scale_gain -e 30 --lambda_list 0.0025 0.025 \
  --gain_init_spread 2.0

# 8. RD eval of the variable-rate models
run_step eval_vr 10800 bash runs/r4/bin/eval_rd_r4.sh vr

echo "$(date +%F-%T) queue complete"
