#!/bin/bash
# Round-4 RD evaluation: real-codec (--real) eval of trained checkpoints
# on the held-out synthetic set.  Stage arg: "tcm" (the TCM-Small lambda
# points), "vr" (variable-rate stanh/gain), default both.
set -u
cd /root/repo
mkdir -p runs/r4
DATA=/root/repo/data_synth/test/data
STAGE=${1:-all}

latest_ckpt() {  # newest run dir matching $1 (glob) with a _very_best.ckpt
  # shellcheck disable=SC2086  # $1 may itself contain glob chars
  ls -dt runs/*$1*/_very_best.ckpt 2>/dev/null | head -1
}

if [ "$STAGE" = tcm ] || [ "$STAGE" = all ]; then
  # TCM-Small points (lambda embedded in the run-dir name; the tcm_64 tag
  # keeps multi-lambda stanh run dirs, which also contain _0.0025_, out)
  for lam in 0.0025 0.013 0.05; do
    ck=$(latest_ckpt "tcm_64*_${lam}_")
    [ -z "$ck" ] && { echo "no ckpt for lambda=$lam"; continue; }
    echo "=== tcm lambda=$lam ckpt=$ck"
    timeout 3600 python -m reslic_tcm_tpu.cli.eval --data "$DATA" \
      --N 64 --M 320 --real --bf16 --checkpoint "$(realpath "$ck")" \
      2>&1 | tee "runs/r4/eval_tcm_${lam}.log" | tail -4
  done
fi

if [ "$STAGE" = vr ] || [ "$STAGE" = all ]; then
  # multi-rate STanH (3 levels) — registry eval path, per-level real codec
  ck=$(ls -dt runs/*stanh*/_very_best.ckpt 2>/dev/null | head -1)
  if [ -n "$ck" ]; then
    echo "=== wacnn_stanh RD gate (codec-consistent forward) ckpt=$ck"
    timeout 5400 python artifacts/eval_rd_stanh.py \
      --ckpt "$(realpath "$ck")" --data "$DATA" --model wacnn_stanh \
      --N 192 --M 320 --lambda_list 0.0025 0.0067 0.025 \
      --num_sigmoids 32 32 32 --extrema 32 16 8 --images 8 \
      --out runs/r4/rd_stanh_gate_r4.jsonl \
      2>&1 | tee runs/r4/gate_wacnn_stanh.log | tail -8
    echo "=== wacnn_stanh ckpt=$ck"
    timeout 5400 python -m reslic_tcm_tpu.cli.eval --data "$DATA" \
      --model wacnn_stanh --real \
      --lambda_list 0.0025 0.0067 0.025 \
      --gauss_num_sigmoids 32 32 32 --gauss_extrema 32 16 8 \
      --gauss_trainable yes yes yes \
      --checkpoint "$(realpath "$ck")" \
      2>&1 | tee runs/r4/eval_wacnn_stanh.log | tail -6
  fi

  # gain model: discrete levels via the eval CLI; the interpolation sweep
  # has its own driver below
  ck=$(ls -dt runs/*gain*/_very_best.ckpt 2>/dev/null | head -1)
  if [ -n "$ck" ]; then
    echo "=== scale_gain ckpt=$ck"
    timeout 3600 python -m reslic_tcm_tpu.cli.eval --data "$DATA" \
      --model scale_gain --real --lambda_list 0.0025 0.025 \
      --checkpoint "$(realpath "$ck")" \
      2>&1 | tee runs/r4/eval_scale_gain.log | tail -4
    echo "=== scale_gain interpolation sweep"
    timeout 3600 python artifacts/gain_sweep.py "$(realpath "$ck")" \
      2>&1 | tee runs/r4/gain_sweep.log | tail -10
  fi
fi
