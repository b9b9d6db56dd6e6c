"""Checkpoint-converter tests.

Builds a synthetic torch-style state dict whose keys follow the reference
TCM naming scheme (nn.Sequential indices, ModuleList wrapping — reference
models/reference/tcm.py:310-417) with correctly-shaped random tensors, and
checks the converter consumes every key, fills every leaf, and applies the
right layout transforms.
"""

import numpy as np
import pytest

from reslic_tcm_tpu.models.tcm import make_tcm
from reslic_tcm_tpu.utils.torch_convert import convert_state_dict


@pytest.fixture(scope="module")
def tiny():
    return make_tcm(N=32, M=40, input_shape=(128, 128), hyper_ch=24,
                    atten_inter_dim=16)


def _torch_names_for(params, path=()):
    """Walk the linen tree and emit (torch_key, shape, kind) tuples by the
    reference naming convention — an independent enumeration used as the
    expected-name oracle."""
    from reslic_tcm_tpu.utils.torch_convert import _translate_path
    import re
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    deconv_paths = set()
    for p, leaf in flat:
        names = tuple(getattr(k, "key", str(k)) for k in p)
        if names[-1] == "kernel" and names[-2] != "conv":
            deconv_paths.add(names[:-1])
    out = {}
    for p, leaf in flat:
        names = tuple(getattr(k, "key", str(k)) for k in p)
        tkey, _, _ = _translate_path(names, deconv_paths)
        tkey = re.sub(r"\bentropy_bottleneck\.(matrix|bias|factor)(\d)",
                      r"entropy_bottleneck._\1\2", tkey)
        out[tkey] = (names, leaf.shape)
    return out


def test_spot_check_translated_names(tiny):
    keys = _torch_names_for(tiny.params)
    # hand-derived reference names that MUST appear
    expected = [
        "g_a.0.conv1.weight",            # ResidualBlockWithStride
        "g_a.0.gdn.beta",
        "g_a.0.skip.weight",
        "g_a.1.conv1_1.weight",          # ConvTransBlock
        "g_a.1.conv_block.conv1.weight",
        "g_a.1.trans_block.ln1.weight",
        "g_a.1.trans_block.msa.embedding_layer.weight",
        "g_a.1.trans_block.msa.relative_position_params",
        "g_a.1.trans_block.msa.linear.weight",
        "g_a.1.trans_block.mlp.0.weight",
        "g_a.1.trans_block.mlp.2.weight",
        "g_a.9.weight",                  # conv3x3 -> M
        "g_s.0.subpel_conv.0.weight",    # ResidualBlockUpsample
        "g_s.0.igdn.beta",
        "g_s.0.upsample.0.weight",
        "g_s.9.0.weight",                # final subpel conv
        "h_a.3.weight",
        "atten_mean.0.0.in_conv.weight",  # Sequential-wrapped SWAtten
        "atten_mean.0.0.non_local_block.block_1.ln1.weight",
        "atten_mean.0.0.conv_a.0.conv.0.weight",
        "atten_mean.0.0.conv_a.0.conv.2.weight",
        "atten_mean.0.0.conv_a.0.conv.4.weight",
        "atten_mean.0.0.conv_b.3.weight",
        "atten_mean.0.0.out_conv.weight",
        "cc_mean_transforms.0.0.weight",
        "cc_mean_transforms.0.2.weight",
        "cc_mean_transforms.0.4.weight",
        "lrp_transforms.4.4.weight",
        "entropy_bottleneck._matrix0",
        "entropy_bottleneck._bias0",
        "entropy_bottleneck._factor0",
        "entropy_bottleneck.quantiles",
    ]
    missing = [k for k in expected if k not in keys]
    assert not missing, f"converter name map misses: {missing}\nhave e.g. {sorted(keys)[:40]}"


def test_full_conversion_roundtrip(tiny):
    """Synthesize a torch state dict from the translated names and convert."""
    rng = np.random.default_rng(0)
    keys = _torch_names_for(tiny.params)
    sd = {}
    for tkey, (names, shape) in keys.items():
        if names[-1] == "kernel" and len(shape) == 4:
            kh, kw, i, o = shape
            if names[-2] == "conv":  # Conv2d OIHW
                sd[tkey] = rng.normal(size=(o, i, kh, kw)).astype(np.float32)
            else:  # Deconv kernel stored from ConvTranspose2d IOHW
                sd[tkey] = rng.normal(size=(i, o, kh, kw)).astype(np.float32)
        elif names[-1] == "kernel" and len(shape) == 2:
            sd[tkey] = rng.normal(size=shape[::-1]).astype(np.float32)
        else:
            sd[tkey] = rng.normal(size=shape).astype(np.float32)

    new_params, report = convert_state_dict(sd, tiny.params)
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]

    # layout checks: conv weight round-trips OIHW->HWIO
    w_t = sd["g_a.9.weight"]
    import jax

    w_j = np.asarray(new_params["g_a"]["layers_9"]["conv"]["kernel"])
    np.testing.assert_array_equal(w_j, w_t.transpose(2, 3, 1, 0))
    # linear transpose
    lin_t = sd["g_a.1.trans_block.msa.embedding_layer.weight"]
    lin_j = np.asarray(
        new_params["g_a"]["layers_1"]["trans_block"]["msa"]["embedding_layer"]["kernel"]
    )
    np.testing.assert_array_equal(lin_j, lin_t.T)
