#!/bin/bash
# Regenerate the round-5 TCM snapshot manifests with true TOTAL epoch
# counts (VERDICT r4 weak #4: params-only warm starts reset the in-run
# epoch counter, so a manifest recorded from the continuation run alone
# under-reports convergence). Offsets: lambda=0.013 resumed from the e29
# snapshot, lambda=0.05 from the e11 snapshot. Idempotent; run after the
# queue's snap_tcm step has produced checkpoints/tcm_s_lambda*_r5.npz.
set -u
cd /root/repo
TRAIN="python -m reslic_tcm_tpu.cli.train -d /root/repo/data_synth \
  --num_images 1200 --num_images_val 24 --batch-size 16 --seed 42 \
  --save --save_path /root/repo/runs --kodak /nonexistent --bf16"

fix() {
  local lam="$1" off="$2"
  local ck
  ck=$(ls -dt runs/*tcm_64_*_${lam}_/_very_best.ckpt 2>/dev/null | head -1)
  [ -z "$ck" ] && { echo "no ckpt for lambda=$lam"; return; }
  python artifacts/snapshot_ckpt.py --ckpt "$(realpath "$ck")" \
    --out "checkpoints/tcm_s_lambda${lam}_r5" --epoch-offset "$off" \
    --command "$TRAIN -m tcm --N 64 --M 320 -e 50 --lambda_list $lam" \
    --note "round-5: lambda=$lam toward the 50-epoch recipe ($off snapshot epochs + the continuation run; optimizer state carried across round-5 resumes)"
}

fix 0.013 29
fix 0.05 11
