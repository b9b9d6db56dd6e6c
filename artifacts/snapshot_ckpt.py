"""Snapshot a trained run into a git-committable artifact (VERDICT r3 #5).

Extracts params-only from an orbax checkpoint into a compressed fp16 npz
(~6x smaller than the optimizer-state checkpoint; fp16 costs <0.01 dB on
eval — the params are consumed in fp32/bf16 matmuls anyway) plus a JSON
manifest recording everything needed to retrain from a clean checkout:
the exact command, seeds, corpus regeneration recipe, and the metrics the
snapshot was taken at. Restores with --restore into a fresh orbax-format
params tree for cli/eval.py --checkpoint.

Usage:
  python artifacts/snapshot_ckpt.py --ckpt runs/<run>/_very_best.ckpt \
      --out checkpoints/tcm_s_0025 --command "python -m ... " \
      --metrics '{"psnr": 31.2, "bpp": 0.31}'
  python artifacts/snapshot_ckpt.py --restore checkpoints/tcm_s_0025.npz \
      --to /tmp/restored.ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="orbax checkpoint dir to snapshot")
    ap.add_argument("--out", help="output path stem (writes .npz + .json)")
    ap.add_argument("--command", default="", help="exact retrain command")
    ap.add_argument("--metrics", default="{}", help="JSON metrics at snapshot")
    ap.add_argument("--epoch-offset", type=int, default=0,
                    help="epochs completed BEFORE the run this ckpt belongs "
                    "to (params-only warm starts reset the in-run counter); "
                    "metrics.epochs is recorded as offset + in-run epoch + 1")
    ap.add_argument("--note", default="")
    ap.add_argument("--restore", help="npz snapshot to restore")
    ap.add_argument("--to", help="orbax dir to restore into")
    args = ap.parse_args()

    import numpy as np

    if args.restore:
        import jax
        import orbax.checkpoint as ocp

        with np.load(args.restore) as z:
            flat = {k: z[k] for k in z.files}
        params = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32), unflatten(flat)
        )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.to), {"params": params}, force=True)
        ckptr.wait_until_finished()
        print(f"restored {len(flat)} arrays -> {args.to}")
        return

    assert args.ckpt and args.out
    from reslic_tcm_tpu.utils.checkpoint import load_checkpoint

    restored = load_checkpoint(args.ckpt)
    state = restored.get("state", restored)
    params = state["params"] if "params" in state else state
    flat = flatten(params)
    half = {}
    for k, v in flat.items():
        a = np.asarray(v)
        half[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out + ".npz", **half)

    import subprocess

    git = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
    in_run_epoch = (restored.get("extra") or {}).get("epoch",
                                                     restored.get("epoch"))
    metrics = json.loads(args.metrics)
    if in_run_epoch is not None and "epochs" not in metrics:
        metrics["epochs"] = args.epoch_offset + int(in_run_epoch) + 1
    manifest = {
        "source_ckpt": args.ckpt,
        "epoch": in_run_epoch,
        "epoch_offset": args.epoch_offset,
        "val_loss": (restored.get("extra") or {}).get("val_loss"),
        "git_commit": git.stdout.strip(),
        "retrain_command": args.command,
        "corpus": "python -m reslic_tcm_tpu.data.synthetic data_synth 1200 "
                  "(deterministic: per-image seeded rng, seed 0)",
        "metrics": metrics,
        "dtype": "fp16 (params-only; consumed in fp32/bf16 matmuls)",
        "note": args.note,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    sz = os.path.getsize(args.out + ".npz") / 1e6
    print(f"wrote {args.out}.npz ({sz:.1f} MB, {len(half)} arrays) + .json")


if __name__ == "__main__":
    main()
