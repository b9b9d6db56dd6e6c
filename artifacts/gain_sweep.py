"""Continuous-rate sweep of a trained gain model (VERDICT r2 item 6).

Sweeps the interpolated codec (models/gain/gained.py compress(x, s, l))
over l in {0, 0.25, 0.5, 0.75, 1} between trained level 0 and 1 and
reports bpp/PSNR per point — the demonstration that gain interpolation
yields a monotone continuous rate axis (reference GainBalle2018.py:124-178).

Usage: python artifacts/gain_sweep.py <orbax _very_best.ckpt path>
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("SWEEP_CPU"):
    # config API beats the hosted TPU plugin's JAX_PLATFORMS override
    jax.config.update("jax_platforms", "cpu")

from reslic_tcm_tpu.data.datasets import list_images, read_image
from reslic_tcm_tpu.models.gain.gained import make_gained_hyperprior
from reslic_tcm_tpu.ops.math import compute_padding, crop_nhwc, pad_nhwc
from reslic_tcm_tpu.utils.checkpoint import load_checkpoint

ckpt = sys.argv[1]
data = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data_synth/test/data"
n_imgs = int(os.environ.get("SWEEP_IMAGES", "8"))

_lambdas = tuple(
    float(t) for t in os.environ.get("SWEEP_LAMBDAS", "0.0025 0.025").split()
)
codec = make_gained_hyperprior(
    "scale",
    N=int(os.environ.get("SWEEP_N", "192")),
    M=int(os.environ.get("SWEEP_M", "320")),
    lmbda_list=_lambdas,
)
restored = load_checkpoint(os.path.abspath(ckpt))
params = restored["state"]["params"] if "state" in restored else restored["params"]
codec.variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
codec.update()

imgs = list_images(data)[:n_imgs]
print(f"# {len(imgs)} images, levels={_lambdas}, interp={codec.interp}")

sweep = [(s, l) for s in range(len(_lambdas) - 1)
         for l in (0.0, 0.25, 0.5, 0.75)]
sweep.append((len(_lambdas) - 2, 1.0))  # the top trained level
rows = []
for s, l in sweep:
    bpp = psnr = 0.0
    for p in imgs:
        x = jnp.asarray(read_image(p))[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, 64)
        xp = pad_nhwc(x, pad)
        enc = codec.compress(xp, s=s, l=l)
        dec = codec.decompress(enc["strings"], enc["shape"], s=s, l=l)
        x_hat = crop_nhwc(jnp.clip(dec["x_hat"], 0, 1), pad)
        nbytes = sum(
            len(ss[0]) if isinstance(ss, list) else len(ss)
            for ss in enc["strings"]
        )
        bpp += nbytes * 8 / (h * w)
        mse = float(jnp.mean((x - x_hat) ** 2))
        psnr += -10 * math.log10(max(mse, 1e-12))
    rows.append((s, l, bpp / len(imgs), psnr / len(imgs)))
    print(f"s={s} l={l:4.2f}: bpp={rows[-1][2]:.4f} psnr={rows[-1][3]:.2f}")

bpps = [r[2] for r in rows]
mono = all(b2 >= b1 * 0.98 for b1, b2 in zip(bpps, bpps[1:]))
print("monotone bpp across the sweep:", mono)
