"""Round-5 3-lambda RD eval in ONE process: the TCM-Small programs compile
once and all checkpoints reuse them (cli.eval is one-checkpoint-per-process,
which pays the full compile per lambda — too slow for an end-of-round chip
window on this tunnel).

Mirrors cli/eval.py --real --bf16 measurement semantics (pad-128 host-coder
roundtrip, PSNR/MS-SSIM on the cropped reconstruction, coded bpp from real
stream bytes). Reference anchor: eval.py:33-47 (pad) / RD_data.md:34-38
(per-lambda converged table).

Usage: python artifacts/eval_rd_r5.py OUT.json NPZ[,NPZ...]
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from reslic_tcm_tpu.data.datasets import list_images, read_image
from reslic_tcm_tpu.models.tcm import make_tcm
from reslic_tcm_tpu.ops.math import compute_padding, crop_nhwc, pad_nhwc
from reslic_tcm_tpu.ops.window_attention import enable_fused_attention
from reslic_tcm_tpu.utils.metrics import compute_psnr, ms_ssim, msssim_to_db

out_path = sys.argv[1]
npzs = sys.argv[2].split(",")
data_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/data_synth/test/data"

net = make_tcm(N=64, M=320, input_shape=(256, 256))
net.set_matmul_precision("bfloat16")
# AFTER make_tcm: init_on_cpu would otherwise trace the pallas kernel for
# the CPU backend (cli/eval.py enables in this order too)
if jax.devices()[0].platform != "cpu":
    enable_fused_attention(True)

imgs = [read_image(p) for p in list_images(data_dir)]
rows = []
for npz in npzs:
    flat = {}
    with np.load(npz) as z:
        for key in z.files:
            node = flat
            parts = key.split("/")
            for pp in parts[:-1]:
                node = node.setdefault(pp, {})
            node[parts[-1]] = z[key].astype(np.float32)
    net.variables = {"params": jax.tree_util.tree_map(jnp.asarray, flat)}
    net.update()
    psnrs, msssims, bpps = [], [], []
    t0 = time.time()
    for img in imgs:
        x = jnp.asarray(img)[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, 128)
        xp = pad_nhwc(x, pad)
        enc = net.compress(xp)
        dec = net.decompress(enc["strings"], enc["shape"])
        x_hat = crop_nhwc(dec["x_hat"], pad)
        nbytes = len(enc["strings"][0][0]) + sum(
            len(t) for t in enc["strings"][1])
        bpps.append(nbytes * 8.0 / (h * w))
        psnrs.append(float(compute_psnr(x, x_hat)))
        msssims.append(msssim_to_db(float(ms_ssim(x, x_hat))))
    row = {
        "npz": npz,
        "images": len(imgs),
        "bpp": round(float(np.mean(bpps)), 4),
        "psnr_db": round(float(np.mean(psnrs)), 2),
        "msssim_db": round(float(np.mean(msssims)), 2),
        "wall_s": round(time.time() - t0, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(row), flush=True)
    rows.append(row)

with open(out_path, "w") as f:
    json.dump(rows, f, indent=1)
    f.write("\n")
print(f"wrote {out_path}", flush=True)
