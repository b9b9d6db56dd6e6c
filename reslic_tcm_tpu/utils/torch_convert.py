"""PyTorch checkpoint -> JAX params converter.

Maps the reference's released .pth.tar state dicts (README.md:41-49; names
produced by the nn.Sequential/ModuleList structure of reference
models/reference/tcm.py:310-417) onto this framework's linen param tree.

Tensor layout rules:
  Conv2d          [O, I, kh, kw] -> HWIO [kh, kw, I, O]
  ConvTranspose2d [I, O, kh, kw] -> spatial flip -> HWIO [kh, kw, I, O]
                  (matches ops.layers.Deconv's input-dilated formulation)
  Linear          [O, I]         -> [I, O]
  LayerNorm       weight -> scale
  GDN / entropy-bottleneck chain / rel-pos tables: direct copy
CDF buffers (_quantized_cdf/_offset/_cdf_length/scale_table) are derived
state here and are skipped (rebuilt by update()).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth(.tar) checkpoint to numpy, stripping 'module.' prefixes
    (reference eval.py:98-99)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


_SKIP_SUFFIXES = ("_quantized_cdf", "_offset", "_cdf_length", "scale_table",
                  "relative_position_index", ".target")


def _t_conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _t_deconv(w):  # IOHW -> flip -> HWIO
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _t_linear(w):  # OI -> IO
    return np.ascontiguousarray(w.T)


def _translate_path(path: tuple, deconv_paths: set) -> tuple[str, Any, list]:
    """My linen param path -> (torch key, tensor transform, alternate keys).

    Alternates cover the one syntactically ambiguous case: a Conv wrapper
    named "conv" whose child is the nn.Conv "conv" is EITHER a bare
    SubpelConv3x3 placed directly in a Sequential (torch "<idx>.0.weight")
    OR ResidualBlockUpsample's mid conv (torch "<idx>.conv.weight"); the
    caller resolves by key presence in the state dict."""
    parts = list(path)
    leaf = parts[-1]

    out: list[str] = []
    amb: list[int] = []  # indices in `out` where "0" could instead be "conv"
    i = 0
    transform = None
    while i < len(parts) - 1:
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) - 1 else None

        if m := re.fullmatch(r"layers_(\d+)", p):
            out.append(m.group(1))
        elif m := re.fullmatch(r"(atten_mean|atten_scale)_(\d+)", p):
            # reference wraps each SWAtten in a Sequential (tcm.py:377-385)
            out.extend([m.group(1), m.group(2), "0"])
        elif m := re.fullmatch(r"(cc_mean|cc_scale|lrp)_(\d+)", p):
            name = {"cc_mean": "cc_mean_transforms", "cc_scale": "cc_scale_transforms",
                    "lrp": "lrp_transforms"}[m.group(1)]
            out.extend([name, m.group(2)])
        elif m := re.fullmatch(r"conv_(a|b)(\d)", p):
            out.extend([f"conv_{m.group(1)}", m.group(2)])
        elif p == "conv_b_out":
            out.extend(["conv_b", "3"])
        elif p == "mlp1":
            out.extend(["mlp", "0"])
        elif p == "mlp2":
            out.extend(["mlp", "2"])
        elif p == "subpel" or p == "upsample":
            # SubpelConv3x3 = Sequential(conv, PixelShuffle) in torch;
            # compressai's ResidualBlockUpsample names the main branch
            # "subpel_conv" (the skip stays "upsample")
            out.extend(["subpel_conv" if p == "subpel" else p, "0"])
            i += 1  # consume the inner Conv wrapper ("conv")
            if i < len(parts) - 1 and parts[i] == "conv":
                i += 1  # consume nn.Conv child too
            i -= 1  # realign (loop will i += 1)
        elif p == "conv" and i + 1 < len(parts) - 1 and parts[i + 1] == "conv":
            # SubpelConv3x3 placed directly in a Sequential: torch wraps the
            # conv in Sequential(conv, PixelShuffle) -> "<idx>.0.weight";
            # ambiguous with ResidualBlockUpsample's mid conv ("<idx>.conv")
            amb.append(len(out))
            out.append("0")
            i += 1  # skip inner nn.Conv wrapper
        elif re.fullmatch(r"conv[123]?", p) and i + 1 < len(parts) - 1 and parts[i + 1] == "conv":
            # my Conv wrapper: <name>/conv/kernel -> torch <name>.weight
            # ResidualUnit convs map conv1/conv2/conv3 -> conv.0/.2/.4
            parent = parts[i - 1] if i > 0 else ""
            if re.fullmatch(r"conv_(a|b)\d", parent):
                idx = {"conv1": "0", "conv2": "2", "conv3": "4"}[p]
                out.extend(["conv", idx])
            else:
                out.append(p)
            i += 1  # skip inner "conv"
        elif p == "conv" and parts[min(i + 1, len(parts) - 1)] in ("kernel", "bias"):
            # bare Conv module directly in a Sequential: g_a.9.weight
            pass
        else:
            out.append(p)
        i += 1

    if leaf == "kernel":
        suffix = ".weight"
        transform = _t_deconv if tuple(path[:-1]) in deconv_paths else None
    elif leaf == "bias" and not re.fullmatch(r"bias\d", parts[-2] if len(parts) > 1 else ""):
        suffix = ".bias"
    elif leaf == "scale":
        suffix = ".weight"
    else:
        suffix = None
    if suffix is None:
        tkey = ".".join(out + [leaf])
        alts = []
    else:
        tkey = ".".join(out) + suffix
        alts = []
        for j in amb:
            alt = list(out)
            alt[j] = "conv"
            alts.append(".".join(alt) + suffix)
    return tkey, transform, alts


def convert_state_dict(state_dict: Dict[str, np.ndarray], params: Any,
                       model: str = "tcm", verbose: bool = False):
    """Fill a linen params template from a torch state dict.

    Returns (new_params, report) where report lists unmatched keys on both
    sides. Shapes decide the tensor transform: 4-D weights get the conv (or
    deconv, if the target path is a Deconv kernel) layout mapping, 2-D Linear
    weights transpose, everything else copies.
    """
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    used = set()
    missing = []
    new_leaves = {}

    # Deconv kernels in my tree: paths whose module stores "kernel" directly
    # (ops.layers.Deconv) — identified by leaf name 'kernel' with no 'conv'
    # wrapper parent and 4-D shape whose torch twin is ConvTranspose2d.
    deconv_paths = set()
    for path, leaf in flat:
        names = tuple(getattr(k, "key", str(k)) for k in path)
        if names[-1] == "kernel" and len(names) >= 2 and names[-2] != "conv":
            deconv_paths.add(names[:-1])

    # entropy bottleneck chain renames: matrix0 -> _matrix0 etc. The stanh
    # EB shares the torch-side name "entropy_bottleneck" (reference
    # balle18_stanh.py:26), so a CompressAI zoo checkpoint warm-starts its
    # chain exactly as the reference's strict=False load does
    # (reference models/__init__.py:81-90).
    def finalize_key(k: str) -> str:
        k = re.sub(r"\bentropy_bottleneck(?:_stanh)?\.(matrix|bias|factor)(\d)",
                   r"entropy_bottleneck._\1\2", k)
        k = k.replace("entropy_bottleneck_stanh.", "entropy_bottleneck.")
        return k

    for path, leaf in flat:
        names = tuple(getattr(k, "key", str(k)) for k in path)
        tkey, transform, alts = _translate_path(names, deconv_paths)
        tkey = finalize_key(tkey)
        if tkey not in state_dict:
            for alt in alts:
                alt = finalize_key(alt)
                if alt in state_dict:
                    tkey = alt
                    break
        if tkey not in state_dict:
            missing.append((".".join(names), tkey))
            new_leaves[names] = leaf
            continue
        w = state_dict[tkey]
        used.add(tkey)
        if names[-1] == "kernel" and w.ndim == 4:
            w = _t_deconv(w) if transform is _t_deconv else _t_conv(w)
        elif names[-1] == "kernel" and w.ndim == 2:
            w = _t_linear(w)
        if w.shape != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch {'.'.join(names)}: torch {w.shape} vs {leaf.shape} (key {tkey})"
            )
        new_leaves[names] = jnp.asarray(w)

    unused = [k for k in state_dict if k not in used
              and not k.endswith(_SKIP_SUFFIXES)]

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new_leaves[prefix]

    report = {"missing": missing, "unused": unused}
    if verbose:
        for m, t in missing:
            print(f"  missing: {m} (wanted {t})")
        for u in unused:
            print(f"  unused torch key: {u}")
    return rebuild(params), report


def warm_start_codec(codec, path: str, verbose: bool = False) -> dict:
    """Warm-start a codec from a PyTorch state-dict file, non-strictly.

    The TPU-native equivalent of the reference's CompressAI-zoo warm start
    (reference models/__init__.py:81-90 + train.py:57-67): CDF buffers
    (_quantized_cdf/_offset/_cdf_length/scale_table) are derived state and
    ignored, and key mismatches are tolerated on both sides — so a
    bmshj2018_hyperprior checkpoint loads into a ScaleHyperpriorStanh
    (transforms + EB chain warmed; stanh params keep their init), matching
    the reference's delete_keys + load_state_dict(strict=False) semantics.

    Mutates codec.variables in place; returns the converter report.
    """
    sd = load_torch_state_dict(path)
    params, report = convert_state_dict(sd, codec.params, verbose=verbose)
    n_loaded = sum(1 for _ in _iter_leaves(params)) - len(report["missing"])
    if verbose or report["missing"] or report["unused"]:
        print(f"warm start from {path}: {n_loaded} leaves loaded, "
              f"{len(report['missing'])} kept init, "
              f"{len(report['unused'])} torch keys unused")
    codec.variables = {"params": params}
    return report


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree
