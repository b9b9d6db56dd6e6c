#!/bin/bash
# snapshot_sidecar.sh — wipe-proof + round-end-proof training progress.
#
# Every INTERVAL seconds, snapshot the newest checkpoint of each tracked
# run family into checkpoints/ (fp16 npz + manifest with true total-epoch
# offsets) and git-commit it. The mid-round VM wipe cost a finished
# 50-epoch run that existed only in runs/; and a round that ends mid-step
# would otherwise lose everything since the step's last queue-driven
# snapshot. Idempotent per source mtime: skips a family whose newest ckpt
# was already snapshotted.
set -u
cd /root/repo
INTERVAL=${SNAP_INTERVAL:-1500}
STAMP_DIR=/tmp/snap_sidecar
mkdir -p "$STAMP_DIR"

TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

snap() {  # snap TAG GLOB OUT OFFSET CMD NOTE
  local tag="$1" glob="$2" out="$3" off="$4" cmd="$5" note="$6"
  local ck mt stamp
  ck=$(ls -dt $glob 2>/dev/null | head -1)
  [ -z "$ck" ] && return 0
  mt=$(stat -c %Y "$ck" 2>/dev/null || echo 0)
  stamp="$STAMP_DIR/$tag"
  [ -f "$stamp" ] && [ "$(cat "$stamp")" = "$mt" ] && return 0
  if python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$ck")" \
      --out "$out" --epoch-offset "$off" --command "$cmd" \
      --note "$note" >> /tmp/snap_sidecar.log 2>&1; then
    echo "$mt" > "$stamp"
    for try in 1 2 3 4 5; do
      if git add checkpoints/ 2>/dev/null \
         && git commit -q -m "Sidecar snapshot: $tag (source $(basename "$(dirname "$ck")")/$(basename "$ck"))"; then
        return 0
      fi
      git reset -q 2>/dev/null
      sleep 20
    done
    echo "$(date +%F-%T) sidecar: commit failed for $tag" >> /tmp/snap_sidecar.log
  fi
}

while true; do
  snap tcm013 "runs/prettcm_64_*_0.013_/_very_best.ckpt" \
    checkpoints/tcm_s_lambda0.013_r5 29 \
    "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.013" \
    "round-5: lambda=0.013 toward the 50-epoch recipe (29 snapshot epochs + continuation; optimizer state carried across resumes)"
  snap tcm05 "runs/prettcm_64_*_0.05_/_very_best.ckpt" \
    checkpoints/tcm_s_lambda0.05_r5 11 \
    "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list 0.05" \
    "round-5: lambda=0.05 toward the 50-epoch recipe (11 snapshot epochs + continuation; optimizer state carried across resumes)"
  snap gain192 "runs/*scale_gain_192_*/_very_best.ckpt" \
    checkpoints/scale_gain_vr_r5 0 \
    "$TRAIN -m scale_gain -e 16 --N 192 --M 320 --lambda_list 0.0025 0.013 0.05" \
    "round-5 full-size gain variable-rate (VERDICT r4 items 4+8)"
  sleep "$INTERVAL"
done
