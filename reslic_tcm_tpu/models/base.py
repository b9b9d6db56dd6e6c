"""Channel-autoregressive codec base: shared forward/compress/decompress.

The reference's TCM and WACNN models (reference models/reference/tcm.py:425-635,
wacnn.py:141-330) share one structure: hyperprior (g_a/h_a + factorized z) and
a channel-AR Gaussian conditional over `num_slices` latent slices with
support-conditioned (mu, sigma) transforms and latent-residual prediction.

TPU-native split:
  * device programs — the full forward (training estimate) and the encoder
    side are each ONE jit-compiled XLA program; the 5/10-slice AR loop is
    unrolled at trace time (static), so XLA fuses the whole thing. The
    decoder compiles one program per slice step (the only true sequential
    dependency) and keeps rANS state host-side.
  * host codec — C++ rANS behind the same
    {"strings": [y_strings, z_strings], "shape": (h, w)} API as the
    reference (tcm.py:568, 590).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import factorized as fz
from ..entropy.gaussian import GaussianConditional
from ..ops.math import get_scale_table, gaussian_likelihood, build_indexes, ste_round


class ChannelARModule(nn.Module):
    """Abstract linen module for channel-AR codecs.

    Subclasses implement setup() creating:
      g_a, g_s, h_a, h_mean_s, h_scale_s : callables
      entropy_bottleneck : EntropyBottleneck
      cc_mean_transforms, cc_scale_transforms, lrp_transforms : lists
      atten_mean, atten_scale : lists (or None for no attention)
    and class attrs num_slices, max_support_slices, M.
    """

    def slice_support(self, y_hat_slices: list):
        if self.max_support_slices < 0:
            return list(y_hat_slices)
        return y_hat_slices[: self.max_support_slices]

    def _mu_sigma(self, i: int, latent_means, latent_scales, support, y_shape):
        """(mu, sigma, mean_support) for slice i (reference tcm.py:443-454)."""
        mean_support = jnp.concatenate([latent_means] + support, axis=-1)
        if getattr(self, "atten_mean", None) is not None:
            mean_support = self.atten_mean[i](mean_support)
        mu = self.cc_mean_transforms[i](mean_support)
        mu = mu[:, : y_shape[0], : y_shape[1], :]

        scale_support = jnp.concatenate([latent_scales] + support, axis=-1)
        if getattr(self, "atten_scale", None) is not None:
            scale_support = self.atten_scale[i](scale_support)
        sigma = self.cc_scale_transforms[i](scale_support)
        sigma = sigma[:, : y_shape[0], : y_shape[1], :]
        return mu, sigma, mean_support

    def _lrp(self, i: int, mean_support, y_hat_slice):
        """Latent residual prediction refinement (reference tcm.py:461-464)."""
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self.lrp_transforms[i](lrp_support)
        return y_hat_slice + 0.5 * jnp.tanh(lrp)

    # ------------------------- entropy hooks -------------------------
    # Overridden by the STanH variants (models/stanh/*): they route slice
    # quantization through the learnable quantizer and add gap outputs.

    def slice_entropy(self, i, y_slice, sigma, mu, training, beta, lv):
        """(y_hat_slice, likelihood) for one slice; default = uniform-noise
        likelihood + STE-round reconstruction (reference tcm.py:455-457)."""
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y_slice.shape, y_slice.dtype, -0.5, 0.5
            )
            lik_point = y_slice + noise
        else:
            lik_point = jnp.round(y_slice - mu) + mu
        lik = gaussian_likelihood(lik_point, sigma, mu)
        y_hat_slice = ste_round(y_slice - mu) + mu
        return y_hat_slice, lik

    def extra_outputs(self, y, training, beta, lv):
        return {}

    def apply_synthesis(self, y_hat, lv):
        return self.g_s(y_hat)

    # Gain-unit hooks (identity by default; the gain variants scale the
    # latents by per-level channel gain vectors, models/gain/*).
    def gain_y(self, y, lv):
        return y

    def gain_z(self, z, lv):
        return z

    def inv_gain_z(self, z_hat, lv):
        return z_hat

    def inv_gain_y(self, y_hat, lv):
        return y_hat

    def __call__(self, x, training: bool = True, lv: int = 0, beta=None):
        """Full rate-distortion forward (reference tcm.py:425-478). NHWC.
        lv selects the rate level (static int; only stanh/gain variants use
        it), beta is the stanh temperature (traced scalar)."""
        y = self.gain_y(self.g_a(x), lv)
        y_shape = y.shape[1:3]
        z = self.gain_z(self.h_a(y), lv)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)

        z_offset = self.entropy_bottleneck.medians_nhwc()
        z_hat = self.inv_gain_z(ste_round(z - z_offset) + z_offset, lv)

        latent_scales = self.h_scale_s(z_hat)
        latent_means = self.h_mean_s(z_hat)

        y_slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices, y_lik, mu_list, scale_list = [], [], [], []
        for i, y_slice in enumerate(y_slices):
            support = self.slice_support(y_hat_slices)
            mu, sigma, mean_support = self._mu_sigma(
                i, latent_means, latent_scales, support, y_shape
            )
            mu_list.append(mu)
            scale_list.append(sigma)

            y_hat_slice, lik = self.slice_entropy(
                i, y_slice, sigma, mu, training, beta, lv
            )
            y_lik.append(lik)
            y_hat_slice = self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = self.inv_gain_y(jnp.concatenate(y_hat_slices, axis=-1), lv)
        x_hat = self.apply_synthesis(y_hat, lv)
        out = {
            "x_hat": x_hat,
            "likelihoods": {
                "y": jnp.concatenate(y_lik, axis=-1),
                "z": z_likelihoods,
            },
            "para": {
                "means": jnp.concatenate(mu_list, axis=-1),
                "scales": jnp.concatenate(scale_list, axis=-1),
                "y": y,
            },
        }
        out.update(self.extra_outputs(y, training, beta, lv))
        return out

    # ----------------------- codec-path device programs -----------------------

    def encode(self, x, scale_table, lv: int = 0):
        """Encoder-side compute as ONE program: symbols + indexes for all
        slices (reference tcm.py:502-565 without the host coder)."""
        y = self.gain_y(self.g_a(x), lv)
        y_shape = y.shape[1:3]
        z = self.gain_z(self.h_a(y), lv)
        z_offset = self.entropy_bottleneck.medians_nhwc()
        # identical to what the decoder reconstructs from the z bitstream
        z_hat = self.inv_gain_z(jnp.round(z - z_offset) + z_offset, lv)

        latent_scales = self.h_scale_s(z_hat)
        latent_means = self.h_mean_s(z_hat)

        y_slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices, symbols, indexes = [], [], []
        for i, y_slice in enumerate(y_slices):
            support = self.slice_support(y_hat_slices)
            mu, sigma, mean_support = self._mu_sigma(
                i, latent_means, latent_scales, support, y_shape
            )
            sym = jnp.round(y_slice - mu)
            idx = build_indexes(sigma, scale_table)
            # transfer-minimal dtypes: symbols fit int16 for any sane model,
            # scale-table indexes fit uint8 (64 levels)
            symbols.append(sym.astype(jnp.int16))
            indexes.append(idx.astype(jnp.uint8))
            y_hat_slice = self._lrp(i, mean_support, sym + mu)
            y_hat_slices.append(y_hat_slice)

        # Pack everything into ONE int16 buffer: the device->host link has a
        # large fixed cost per transfer, so one transfer beats three.
        # Layout: [ symbols int16 | indexes (as int16) | z bitcast to 2xint16 ]
        sym_flat = jnp.stack(symbols, axis=0).transpose(1, 0, 4, 2, 3).reshape(
            x.shape[0], -1
        )  # [B, S*C/S*h*w] slice-major, channel-major within slice
        idx_flat = jnp.stack(indexes, axis=0).transpose(1, 0, 4, 2, 3).reshape(
            x.shape[0], -1
        ).astype(jnp.int16)
        z_flat = jax.lax.bitcast_convert_type(z, jnp.int16).reshape(x.shape[0], -1)
        return jnp.concatenate([sym_flat, idx_flat, z_flat], axis=-1)

    def hyper_synthesis(self, z_hat, lv: int = 0):
        z_hat = self.inv_gain_z(z_hat, lv)
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat)

    def analysis(self, x, lv: int = 0):
        """(y, z, z_hat) — the encoder-side transform; z_hat equals exactly
        what the decoder reconstructs from the z bitstream."""
        y = self.gain_y(self.g_a(x), lv)
        z = self.gain_z(self.h_a(y), lv)
        z_offset = self.entropy_bottleneck.medians_nhwc()
        z_hat = jnp.round(z - z_offset) + z_offset
        return y, z, z_hat

    def quantize_slice(self, i: int, y, mu):
        """int16 symbols for slice i of y (round(y_i - mu))."""
        c = self.M // self.num_slices
        y_slice = jax.lax.slice_in_dim(y, i * c, (i + 1) * c, axis=-1)
        return jnp.round(y_slice - mu).astype(jnp.int16)

    def pack_for_host(self, syms, idxs, z):
        """Single int16 transfer buffer: [symbols | indexes | z bitcast]."""
        b = z.shape[0]
        sym_flat = jnp.stack(syms, 0).transpose(1, 0, 4, 2, 3).reshape(b, -1)
        idx_flat = (
            jnp.stack(idxs, 0).transpose(1, 0, 4, 2, 3).reshape(b, -1).astype(jnp.int16)
        )
        z_flat = jax.lax.bitcast_convert_type(
            z.astype(jnp.float32), jnp.int16
        ).reshape(b, -1)
        return jnp.concatenate([sym_flat, idx_flat, z_flat], axis=-1)

    def pack_for_host_i8(self, syms, idxs, z):
        """Half-width transfer buffer for the trained-symbol regime:
        [symbols int8 | indexes uint8-as-int8 | z bitcast 4xint8], plus the
        max |symbol| so the host can detect (rare) int8 overflow and fall
        back to the int16 pack. Trained latent symbols are overwhelmingly in
        [-128, 127] (published rates top out below 1 bpp), so this halves
        the dominant device->host transfer."""
        b = z.shape[0]
        sym16 = jnp.stack(syms, 0).transpose(1, 0, 4, 2, 3).reshape(b, -1)
        overflow = (jnp.max(jnp.abs(sym16.astype(jnp.int32))) > 127).astype(
            jnp.int8
        )
        sym_flat = sym16.astype(jnp.int8)
        idx_flat = (
            jnp.stack(idxs, 0).transpose(1, 0, 4, 2, 3).reshape(b, -1)
            .astype(jnp.int8)
        )
        z_flat = jax.lax.bitcast_convert_type(
            z.astype(jnp.float32), jnp.int8
        ).reshape(b, -1)
        # overflow flag rides as the last column (no separate scalar transfer)
        flag = jnp.broadcast_to(overflow, (b, 1))
        return jnp.concatenate([sym_flat, idx_flat, z_flat, flag], axis=-1)

    def decode_slice_params(self, i: int, latent_means, latent_scales,
                            y_hat_slices: Sequence, y_shape, scale_table):
        """Per-slice decode step, device side (reference tcm.py:607-619)."""
        support = self.slice_support(list(y_hat_slices))
        mu, sigma, mean_support = self._mu_sigma(
            i, latent_means, latent_scales, support, y_shape
        )
        idx = build_indexes(sigma, scale_table).astype(jnp.uint8)
        return mu, idx, mean_support

    def decode_slice_params_sigma(self, i: int, latent_means, latent_scales,
                                  y_hat_slices: Sequence, y_shape):
        """Per-slice (mu, sigma, mean_support) for the analytic device coder
        (continuous sigma; no scale-table quantization)."""
        support = self.slice_support(list(y_hat_slices))
        return self._mu_sigma(i, latent_means, latent_scales, support, y_shape)

    def decode_slice_finish(self, i: int, mean_support, y_hat_slice):
        return self._lrp(i, mean_support, y_hat_slice)

    def decode_slice_dequant_finish(self, i: int, mean_support, symbols, mu):
        """Fused dequantize + LRP: takes raw int16 symbols so the host->device
        transfer is 2 bytes/element."""
        y_hat_slice = symbols.astype(mu.dtype) + mu
        return self._lrp(i, mean_support, y_hat_slice)

    def synthesize(self, y_hat, lv: int = 0):
        y_hat = self.inv_gain_y(y_hat, lv)
        return jnp.clip(self.apply_synthesis(y_hat, lv), 0.0, 1.0)

    def synthesize_raw_u8(self, y_hat, lv: int = 0):
        """g_s with the final depth-to-space left to the host: returns the
        pre-shuffle [B, H/r, W/r, 3 r^2] tensor quantized to uint8. The
        serving profile uses this because a [B,H,W,3] image tensor is
        lane-padded 3->128 on TPU (~26 ms to even touch at 8x768x512) and
        uint8 quarters the device->host transfer."""
        from ..ops.layers import SubpelConv3x3

        y_hat = self.inv_gain_y(y_hat, lv)
        layers = self.g_s.layers
        assert isinstance(layers[-1], SubpelConv3x3), "packed output needs a subpel tail"
        h = y_hat
        for lyr in layers[:-1]:
            h = lyr(h)
        h = layers[-1](h, shuffle=False)
        return jnp.round(jnp.clip(h, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ChannelARCodec:
    """Host-side wrapper pairing a ChannelARModule + params with the native
    rANS coder. Mirrors the reference model API: update() / compress() /
    decompress() / forward (reference models/base.py:79-133)."""

    def __init__(self, module: ChannelARModule, variables,
                 matmul_precision: str | None = None):
        self.module = module
        self.variables = variables
        self.gaussian_conditional = GaussianConditional()
        self.eb_tables: fz.CodingTables | None = None
        self._jit_cache: dict = {}
        # MXU precision for every codec device program. fp32 convs lower to
        # the 3-pass MXU path (~20 TFLOP/s on v5e); "bfloat16" uses the
        # single-pass MXU path (~90-100 TFLOP/s measured, probe_precision2).
        # Encoder and decoder share executables, so enc/dec bit-identity
        # holds at ANY precision; only RD quality is (slightly) affected.
        self.matmul_precision = matmul_precision

    # -------------------------------- state --------------------------------

    @property
    def params(self):
        return self.variables["params"]

    def update(self, scale_table=None):
        """Rebuild integer CDF tables (must run before real coding;
        reference tcm.py:418-423)."""
        if scale_table is None:
            scale_table = np.asarray(get_scale_table())
        self.gaussian_conditional.update_scale_table(scale_table)
        eb_params = self.params["entropy_bottleneck"]
        filters = getattr(self.module, "eb_filters", (3, 3, 3, 3))
        self.eb_tables = fz.build_tables(eb_params, filters)
        # derived-state caches must follow the params
        for key in ("_eb_medians_np", "_eb_medians_dev"):
            self._jit_cache.pop(key, None)
        self._jit_cache.pop(("dev_tables", 0), None)
        return True

    def _eb_medians(self) -> np.ndarray:
        # cached: the device->host fetch costs a full RTT on tunneled hosts
        # and this is called on every compress/decompress
        med = self._jit_cache.get("_eb_medians_np")
        if med is None:
            med = np.asarray(
                self.params["entropy_bottleneck"]["quantiles"][:, 0, 1]
            )
            self._jit_cache["_eb_medians_np"] = med
        return med

    def _eb_medians_dev(self):
        med = self._jit_cache.get("_eb_medians_dev")
        if med is None:
            med = jnp.asarray(self._eb_medians())
            self._jit_cache["_eb_medians_dev"] = med
        return med

    def set_matmul_precision(self, precision: str | None):
        """MXU precision for the codec device programs ("bfloat16" ~4x faster
        convs on v5e, see docs/PERFORMANCE.md). Clears compiled programs;
        enc/dec bit-identity holds because both sides share executables."""
        self.matmul_precision = precision
        self._jit_cache.clear()

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            from ..ops.layers import fused_conv_compiler_options

            # flags are read at trace time; the matching compiler options
            # (e.g. the scoped-vmem cap the fused conv kernels need on the
            # current toolchain) must follow the SAME enable state. Cache
            # clears (bench's composed fallback) retrace with fresh options.
            opts = fused_conv_compiler_options() or None
            prec = self.matmul_precision
            if prec is not None:
                def wrapped(*a, _fn=fn, _p=prec, **kw):
                    with jax.default_matmul_precision(_p):
                        return _fn(*a, **kw)
                self._jit_cache[name] = jax.jit(wrapped,
                                                compiler_options=opts)
            else:
                self._jit_cache[name] = jax.jit(fn, compiler_options=opts)
        return self._jit_cache[name]

    def _make_params_fn(self, i: int, y_shape):
        def _params_fn(v, lm, ls, st, *sl, _i=i, _ys=y_shape):
            return self.module.apply(
                v, _i, lm, ls, list(sl), _ys, st,
                method=ChannelARModule.decode_slice_params,
            )

        return _params_fn

    def _make_finish_fn(self, i: int):
        def _finish_fn(v, ms, sy, m, _i=i):
            return self.module.apply(
                v, _i, ms, sy, m,
                method=ChannelARModule.decode_slice_dequant_finish,
            )

        return _finish_fn

    # ------------------------------- forward -------------------------------

    def forward(self, x, training: bool = False, rng=None, lv: int = 0):
        if training:
            rngs = {"noise": rng if rng is not None else jax.random.PRNGKey(0)}
            return self.module.apply(self.variables, x, training=True, lv=lv,
                                     rngs=rngs)
        fn = self._jit(
            f"fwd_eval_{lv}",
            lambda v, xx: self.module.apply(v, xx, training=False, lv=lv),
        )
        return fn(self.variables, x)

    # -------------------------------- codec --------------------------------

    def compress(self, x, lv: int = 0) -> dict:
        """x: NHWC in [0,1], batch 1 (matching the reference contract)."""
        assert x.shape[0] == 1, "compress() codes one image per call"
        return self.compress_batch(x, lv)[0]

    def compress_batch(self, x, lv: int = 0) -> list[dict]:
        """Batched encode mirroring the decoder's compiled programs.

        The per-slice (mu, sigma, index) math runs through the SAME jitted
        executables the decoder uses, so scale indexes are bit-identical
        between encode and decode (different XLA fusions of the same math
        can differ by an ulp — enough to flip an index at a table boundary).
        All intermediates stay device-resident; ONE packed device->host
        transfer at the end, then per-image host rANS (threaded). Symbol
        order per image matches the reference's per-slice channel-major
        flatten (tcm.py:551-552)."""
        staged, meta = self._compress_device_stage(x, lv)
        return self._compress_host_stage(staged, meta)

    def compress_pipelined(self, batches, lv: int = 0) -> list[dict]:
        """Stream encode a sequence of NHWC batches, overlapping stages.

        JAX dispatch is asynchronous: the device programs for batch i+1 are
        enqueued before we block on batch i's single packed transfer, and
        batch i's host rANS coding runs while the TPU is busy with batch
        i+1's transforms. Hides most of the host-coder + transfer cost
        behind device compute (the reference encodes strictly serially,
        tcm.py:529-575)."""
        from concurrent.futures import ThreadPoolExecutor

        futs = []
        with ThreadPoolExecutor(max_workers=2) as pool:
            for x in batches:
                staged, meta = self._compress_device_stage(x, lv)
                futs.append(
                    pool.submit(
                        lambda p=staged, m=meta: self._compress_host_stage(p, m)
                    )
                )
            results: list[dict] = []
            for f in futs:
                results.extend(f.result())
        return results

    def roundtrip_pipelined(self, batches, lv: int = 0,
                            decode_workers: int = 2) -> list[dict]:
        """Full-duplex serving pipeline: encode+decode a stream of NHWC
        batches with the two directions overlapped across batches.

        Encode is device-compute-bound (transforms) while decode is
        host-link-bound (per-slice index/symbol round trips), so decoding
        batch i while the TPU runs batch i+1's analysis hides most of the
        decode wall time. All device programs are the same executables the
        serial paths use; outputs are batch-ordered [{"strings", "shape",
        "x_hat"}, ...] with x_hat batched per input batch.

        The reference runs encode and decode strictly serially per image
        (reference eval.py:101-126)."""
        from concurrent.futures import ThreadPoolExecutor

        enc_futs = []
        with ThreadPoolExecutor(max_workers=2) as enc_pool, \
                ThreadPoolExecutor(max_workers=decode_workers) as dec_pool:
            for x in batches:
                staged, meta = self._compress_device_stage(x, lv)
                enc_futs.append(
                    enc_pool.submit(
                        lambda p=staged, m=meta: self._compress_host_stage(p, m)
                    )
                )
            dec_futs = []
            for f in enc_futs:
                encs = f.result()
                dec_futs.append(
                    dec_pool.submit(
                        lambda e=encs: (
                            e,
                            self.decompress_batch(
                                [d["strings"] for d in e], e[0]["shape"], lv
                            ),
                        )
                    )
                )
            out = []
            for f in dec_futs:
                encs, dec = f.result()
                out.append({
                    "encs": encs,
                    "x_hat": dec["x_hat"],
                })
        return out

    def shard_for_inference(self, mesh) -> None:
        """Data-parallel serving over a device mesh: replicate the weights,
        and shard every batch passed to the codec APIs over the 'data' axis.

        The jitted codec executables are sharding-polymorphic — XLA SPMD
        partitions each program over the mesh and keeps all per-slice
        intermediates device-resident, so compress/decompress scale with
        the data axis without any per-device Python loop (the reference
        scales inference only by nn.DataParallel on the forward pass,
        helper.py:106-113; its codec path is strictly single-GPU)."""
        from ..parallel.mesh import replicate, shard_batch

        self.variables = replicate(mesh, self.variables)
        self._inference_mesh = mesh
        self._shard_batch = lambda x: shard_batch(mesh, x)

    def _maybe_shard(self, x):
        fn = getattr(self, "_shard_batch", None)
        if fn is not None and x.shape[0] % self._inference_mesh.devices.size == 0:
            return fn(x)
        return x

    def _compress_device_stage(self, x, lv: int = 0):
        """Enqueue every device program for one batch; returns the packed
        (still device-resident, async) buffer plus host metadata. Does not
        block on the TPU."""
        assert self.eb_tables is not None, "call update() first"
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        b = x.shape[0]
        y_shape = (x.shape[1] // 16, x.shape[2] // 16)

        analysis = self._jit(
            f"analysis_{lv}",
            lambda v, xx, _lv=lv: self.module.apply(
                v, xx, _lv, method=ChannelARModule.analysis
            ),
        )
        y, z, z_hat = analysis(self.variables, self._maybe_shard(x))

        # same executable as decompress_batch's hyper step
        def _hyper(v, zz, _lv=lv):
            return self.module.apply(v, zz, _lv, method=ChannelARModule.hyper_synthesis)

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )

        syms, idxs = [], []
        y_hat_slices = []
        for i in range(self.module.num_slices):
            step = self._jit(
                f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
            )
            mu, indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )
            quant = self._jit(
                f"quant_{i}",
                lambda v, yy, m, _i=i: self.module.apply(
                    v, _i, yy, m, method=ChannelARModule.quantize_slice
                ),
            )
            sym = quant(self.variables, y, mu)
            finish = self._jit(f"dec_finish_{i}_{b}", self._make_finish_fn(i))
            y_hat_slices.append(finish(self.variables, mean_support, sym, mu))
            syms.append(sym)
            idxs.append(indexes)

        pack8 = self._jit(
            "pack_i8",
            lambda v, s, ii, zz: self.module.apply(
                v, list(s), list(ii), zz, method=ChannelARModule.pack_for_host_i8
            ),
        )
        packed8 = pack8(self.variables, tuple(syms), tuple(idxs), z)
        staged = (packed8, (tuple(syms), tuple(idxs), z))
        return staged, (x.shape[0], x.shape[1], x.shape[2])

    def _compress_host_stage(self, staged, meta) -> list[dict]:
        """Block on the packed transfer, unpack, run per-image host rANS.

        Optimistically uses the half-width int8 buffer; if the device-side
        max |symbol| check trips (untrained weights / extreme content), the
        int16 pack program re-runs on the still-device-resident tensors."""
        b, H, W = meta
        n = (H // 16) * (W // 16) * self.module.M
        zh, zw = H // 64, W // 64
        zc = getattr(self.module, "hyper_ch", None) or self.module.N
        packed8, dev_tensors = staged
        packed = np.asarray(packed8)
        if packed[0, -1] == 0:
            symbols = packed[:, :n].astype(np.int32)
            indexes = packed[:, n : 2 * n].view(np.uint8).astype(np.int32)
            z = (
                np.ascontiguousarray(packed[:, 2 * n : -1])
                .reshape(b, zh, zw, zc, 4)
                .view(np.float32)[..., 0]
            )
        else:
            pack16 = self._jit(
                "pack_i16",
                lambda v, s, ii, zz: self.module.apply(
                    v, list(s), list(ii), zz, method=ChannelARModule.pack_for_host
                ),
            )
            syms, idxs, zdev = dev_tensors
            packed = np.asarray(pack16(self.variables, syms, idxs, zdev))
            symbols = packed[:, :n].astype(np.int32)
            indexes = packed[:, n : 2 * n].astype(np.int32)
            z = (
                np.ascontiguousarray(packed[:, 2 * n :])
                .reshape(b, zh, zw, zc, 2)
                .view(np.float32)[..., 0]
            )

        from concurrent.futures import ThreadPoolExecutor

        from ..coding.rans import encode_with_indexes

        t = self.gaussian_conditional.tables
        med = self._eb_medians()

        def encode_one(i):
            y_string = encode_with_indexes(
                symbols[i], indexes[i], t.quantized_cdf, t.cdf_length, t.offset
            )
            z_strings = fz.compress(z[i : i + 1], med, self.eb_tables)
            return {
                "strings": [[y_string], z_strings],
                "shape": (int(zh), int(zw)),
            }

        if b == 1:
            return [encode_one(0)]
        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            return list(pool.map(encode_one, range(b)))

    def decompress(self, strings, shape, lv: int = 0) -> dict:
        out = self.decompress_batch([strings], shape, lv)
        return {"x_hat": out["x_hat"][:1]}

    def decompress_batch(self, strings_list, shape, lv: int = 0) -> dict:
        """Decode B bitstreams together: the per-slice device programs and
        host<->device transfers are batched (one fixed transfer cost per
        slice for the whole batch), while each image keeps its own rANS
        decoder state."""
        assert self.eb_tables is not None, "call update() first"
        from ..coding.rans import RansDecoder

        z_hat = np.concatenate(
            [
                fz.decompress(s[1], shape, self._eb_medians(), self.eb_tables)
                for s in strings_list
            ],
            axis=0,
        )
        z_hat = self._maybe_shard(jnp.asarray(z_hat))

        def _hyper(v, zz, _lv=lv):
            return self.module.apply(
                v, zz, _lv, method=ChannelARModule.hyper_synthesis
            )

        hyper = self._jit(f"hyper_{lv}", _hyper)
        latent_means, latent_scales = hyper(self.variables, z_hat)

        y_shape = (shape[0] * 4, shape[1] * 4)
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        t = self.gaussian_conditional.tables
        b = len(strings_list)

        decoders = []
        for s in strings_list:
            d = RansDecoder()
            d.set_stream(s[0][0])
            decoders.append(d)

        from concurrent.futures import ThreadPoolExecutor

        y_hat_slices = []
        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            for i in range(self.module.num_slices):
                step = self._jit(
                    f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
                )
                mu, indexes, mean_support = step(
                    self.variables, latent_means, latent_scales, scale_table,
                    *y_hat_slices,
                )
                idx_np = np.asarray(indexes)  # [B, h, w, c] single D2H
                c = idx_np.shape[-1]
                sym = np.empty((b, c, y_shape[0], y_shape[1]), np.int16)

                def dec_one(j, _idx=idx_np, _sym=sym, _c=c):
                    # per-image decoder state; rANS is serial per stream but
                    # independent across images (the C call drops the GIL)
                    rv = decoders[j].decode_stream(
                        _idx[j].transpose(2, 0, 1).reshape(-1),
                        t.quantized_cdf, t.cdf_length, t.offset,
                    )
                    _sym[j] = rv.reshape(_c, y_shape[0], y_shape[1]).astype(
                        np.int16
                    )

                if b == 1:
                    dec_one(0)
                else:
                    list(pool.map(dec_one, range(b)))
                sym_d = jnp.asarray(sym.transpose(0, 2, 3, 1))  # single H2D

                finish = self._jit(f"dec_finish_{i}_{b}", self._make_finish_fn(i))
                y_hat_slices.append(
                    finish(self.variables, mean_support, sym_d, mu)
                )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)

        def _synth(v, yy, _lv=lv):
            return self.module.apply(v, yy, _lv, method=ChannelARModule.synthesize)

        synth = self._jit(f"synth_{lv}", _synth)
        return {"x_hat": synth(self.variables, y_hat)}

    def aux_loss(self):
        return self.module.apply(
            self.variables, method=lambda m: m.aux_loss()
        )

    # --------------------- device-coder profile (TPU) ---------------------
    # Entropy coding runs ON the device (interleaved rANS, coding/device_rans)
    # so the channel-AR decode chains as device programs with no per-slice
    # host round trips. Stream format is NOT CompressAI-compatible — use
    # compress()/decompress() for interchange with the reference.

    def _device_tables(self, lv: int = 0):
        """Device-resident coding tables incl. the direct-lookup inverse and
        packed start|freq tables (cached)."""
        from ..coding import device_rans as dr

        key = ("dev_tables", lv)
        if key not in self._jit_cache:
            t = self.gaussian_conditional.tables
            e = self.eb_tables
            self._jit_cache[key] = (
                (jnp.asarray(t.quantized_cdf), jnp.asarray(t.cdf_length),
                 jnp.asarray(t.offset),
                 jnp.asarray(dr.build_inverse_table(t.quantized_cdf, t.cdf_length)),
                 jnp.asarray(dr.build_packed_table(t.quantized_cdf, t.cdf_length))),
                (jnp.asarray(e.quantized_cdf), jnp.asarray(e.cdf_length),
                 jnp.asarray(e.offset),
                 jnp.asarray(dr.build_inverse_table(e.quantized_cdf, e.cdf_length)),
                 jnp.asarray(dr.build_packed_table(e.quantized_cdf, e.cdf_length))),
            )
        return self._jit_cache[key]

    def compress_device(self, x, lv: int = 0, k: int = 1024,
                        cap: int | None = None) -> dict:
        """Fully device-side encode. Batched inputs produce ONE batch
        container stream (images decode together); use the host profile for
        per-image bitstreams. Returns numpy word streams."""
        from ..coding import device_rans as dr

        assert self.eb_tables is not None, "call update() first"
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        y_shape = (x.shape[1] // 16, x.shape[2] // 16)
        b = x.shape[0]
        n_slice = y_shape[0] * y_shape[1] * (self.module.M // self.module.num_slices)
        assert (b * n_slice) % k == 0, (b, n_slice, k)
        (yt_all, et_all) = self._device_tables(lv)
        yt, y_inv, y_packed = yt_all[:3], yt_all[3], yt_all[4]
        et, e_inv, e_packed = et_all[:3], et_all[3], et_all[4]

        analysis = self._jit(
            f"analysis_{lv}",
            lambda v, xx, _lv=lv: self.module.apply(
                v, xx, _lv, method=ChannelARModule.analysis
            ),
        )
        y, z, z_hat = analysis(self.variables, self._maybe_shard(x))

        def _hyper(v, zz, _lv=lv):
            return self.module.apply(v, zz, _lv, method=ChannelARModule.hyper_synthesis)

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )

        syms, idxs = [], []
        y_hat_slices = []
        for i in range(self.module.num_slices):
            step = self._jit(
                f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
            )
            mu, indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )
            quant = self._jit(
                f"quant_{i}",
                lambda v, yy, m, _i=i: self.module.apply(
                    v, _i, yy, m, method=ChannelARModule.quantize_slice
                ),
            )
            sym = quant(self.variables, y, mu)
            finish = self._jit(f"dec_finish_{i}_{b}", self._make_finish_fn(i))
            y_hat_slices.append(finish(self.variables, mean_support, sym, mu))
            syms.append(sym.reshape(-1).astype(jnp.int32))
            idxs.append(indexes.reshape(-1).astype(jnp.int32))

        n_total = b * self.module.num_slices * n_slice
        if cap is None:
            cap = max(64, n_total // k)  # ~16 bits/symbol budget

        sym_cat = jnp.concatenate(syms)
        idx_cat = jnp.concatenate(idxs)
        for attempt in range(4):
            enc_y = self._jit(
                f"dev_enc_y_{k}_{cap}",
                lambda s, ii, _cap=cap: dr.encode_interleaved(
                    s, ii, *yt, k=k, cap=_cap, packed=y_packed
                ),
            )
            y_words, y_counts, y_ovf = enc_y(sym_cat, idx_cat)
            if not bool(y_ovf):
                break
            cap *= 2  # retry with a bigger per-lane budget (recompiles once)

        # z stream: symbols = round(z - medians), per-channel CDF rows
        zc = z.shape[-1]
        med = self._eb_medians_dev()
        z_idx = jnp.broadcast_to(
            jnp.arange(zc, dtype=jnp.int32), z.shape
        ).reshape(-1)
        z_cap = max(64, z_idx.shape[0] // max(k // 4, 1))
        kz = math_gcd_pow2(z_idx.shape[0], k)
        enc_z = self._jit(
            f"dev_enc_z_{kz}_{z_cap}_{b}",
            lambda zz, ii: dr.encode_interleaved(
                jnp.round(
                    zz.astype(jnp.float32).reshape(-1)
                    - jnp.tile(med, zz.shape[0] * zz.shape[1] * zz.shape[2])
                ).astype(jnp.int32),
                ii, *et, k=kz, cap=z_cap, packed=e_packed,
            ),
        )
        z_words, z_counts, z_ovf = enc_z(z, z_idx)

        if bool(y_ovf) or bool(z_ovf):
            raise RuntimeError(
                "device-coder cap overflow; raise `cap` (symbol entropy higher"
                " than the 16 bits/symbol budget)"
            )
        return {
            "device_streams": {
                "y": (np.asarray(y_words), np.asarray(y_counts)),
                "z": (np.asarray(z_words), np.asarray(z_counts)),
            },
            "shape": (int(z.shape[1]), int(z.shape[2])),
            "k": k,
            "batch": b,
            "nbytes": int(np.asarray(y_counts).sum() + np.asarray(z_counts).sum()) * 2,
        }

    def decompress_device(self, enc: dict, lv: int = 0) -> dict:
        """Fully device-side decode: the only host->device transfer is the
        compressed words; the slice loop chains decoder state on device."""
        from ..coding import device_rans as dr

        (yt_all, et_all) = self._device_tables(lv)
        yt, y_inv, y_packed = yt_all[:3], yt_all[3], yt_all[4]
        et, e_inv, e_packed = et_all[:3], et_all[3], et_all[4]
        k = enc["k"]
        zh, zw = enc["shape"]
        y_shape = (zh * 4, zw * 4)
        b = enc.get("batch", 1)
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)

        # --- z ---
        z_words = jnp.asarray(enc["device_streams"]["z"][0])
        z_counts = jnp.asarray(enc["device_streams"]["z"][1])
        zc = et[0].shape[0]
        med = self._eb_medians_dev()
        n_z = b * zh * zw * zc
        kz = z_words.shape[0]

        def _zdec(w, c):
            idx = jnp.broadcast_to(
                jnp.arange(zc, dtype=jnp.int32), (b, zh, zw, zc)
            ).reshape(-1)
            syms = dr.decode_interleaved(w, c, idx, *et, n=n_z, k=kz,
                                         inverse=e_inv, packed=e_packed)
            zf = syms.astype(jnp.float32).reshape(b, zh, zw, zc)
            return zf + med[None, None, None, :]

        z_hat = self._jit(f"dev_dec_z_{kz}_{n_z}", _zdec)(z_words, z_counts)

        def _hyper(v, zz, _lv=lv):
            return self.module.apply(v, zz, _lv, method=ChannelARModule.hyper_synthesis)

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )

        # --- y: chained per-slice decode, all on device ---
        y_words = jnp.asarray(enc["device_streams"]["y"][0])
        y_counts = jnp.asarray(enc["device_streams"]["y"][1])
        carry = self._jit(
            "dev_dec_init", lambda w, c: dr.decoder_init(w, c)
        )(y_words, y_counts)

        y_hat_slices = []
        for i in range(self.module.num_slices):
            step = self._jit(
                f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
            )
            mu, indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )

            def _seg(w, cry, idx):
                cry, syms = dr.decode_segment(
                    cry, w, idx.reshape(-1).astype(jnp.int32), *yt, k=k,
                    inverse=y_inv, packed=y_packed,
                )
                return cry, syms.reshape(idx.shape).astype(jnp.int16)

            carry, sym = self._jit(f"dev_dec_seg_{y_shape}_{k}", _seg)(
                y_words, carry, indexes
            )
            # dequant+LRP through the SAME executable the encoder used —
            # y_hat feeds the next slice's sigma, so it must be bit-identical
            finish = self._jit(f"dec_finish_{i}_{b}", self._make_finish_fn(i))
            y_hat_slices.append(finish(self.variables, mean_support, sym, mu))

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)

        def _synth(v, yy, _lv=lv):
            return self.module.apply(v, yy, _lv, method=ChannelARModule.synthesize)

        return {"x_hat": self._jit(f"synth_{lv}", _synth)(self.variables, y_hat)}


    # ------------------- fused one-program device codec -------------------
    # The split device-coder path above dispatches ~20 programs per batch;
    # on hosts where per-call dispatch is expensive (tunneled devices) that
    # overhead rivals the compute. These variants trace the ENTIRE encode
    # (analysis -> hyper -> slice loop -> interleaved-rANS scans) and the
    # ENTIRE decode into ONE XLA program each. Bit-identity of the (mu,
    # sigma, index) math between the two programs is validated by the
    # on-chip roundtrip test (tests/test_device_codec.py + bench).

    def _fused_encode_fn(self, lv: int, b: int, y_shape, k: int, cap: int,
                         kz: int, z_cap: int):
        from ..coding import device_rans as dr

        module = self.module

        def fn(v, x, scale_table, y_cdf, y_len, y_off, y_packed,
               e_cdf, e_len, e_off, e_packed, med):
            y, z, z_hat = module.apply(v, x, lv, method=ChannelARModule.analysis)
            latent_means, latent_scales = module.apply(
                v, z_hat, lv, method=ChannelARModule.hyper_synthesis
            )
            syms, idxs, y_hat_slices = [], [], []
            for i in range(module.num_slices):
                mu, indexes, mean_support = module.apply(
                    v, i, latent_means, latent_scales, list(y_hat_slices),
                    y_shape, scale_table,
                    method=ChannelARModule.decode_slice_params,
                )
                sym = module.apply(
                    v, i, y, mu, method=ChannelARModule.quantize_slice
                )
                y_hat_slices.append(
                    module.apply(
                        v, i, mean_support, sym, mu,
                        method=ChannelARModule.decode_slice_dequant_finish,
                    )
                )
                syms.append(sym.reshape(-1).astype(jnp.int32))
                idxs.append(indexes.reshape(-1).astype(jnp.int32))
            y_words, y_counts, y_ovf = dr.encode_interleaved(
                jnp.concatenate(syms), jnp.concatenate(idxs),
                y_cdf, y_len, y_off, k=k, cap=cap, packed=y_packed,
            )
            z_idx = jnp.broadcast_to(
                jnp.arange(z.shape[-1], dtype=jnp.int32), z.shape
            ).reshape(-1)
            z_sym = jnp.round(
                z.astype(jnp.float32) - med[None, None, None, :]
            ).reshape(-1).astype(jnp.int32)
            z_words, z_counts, z_ovf = dr.encode_interleaved(
                z_sym, z_idx, e_cdf, e_len, e_off, k=kz, cap=z_cap,
                packed=e_packed,
            )
            return y_words, y_counts, y_ovf, z_words, z_counts, z_ovf

        return fn

    def _fused_decode_fn(self, lv: int, b: int, zh: int, zw: int, k: int,
                         kz: int):
        from ..coding import device_rans as dr

        module = self.module
        y_shape = (zh * 4, zw * 4)

        def fn(v, y_words, y_counts, z_words, z_counts, scale_table,
               y_cdf, y_len, y_off, y_inv, y_packed,
               e_cdf, e_len, e_off, e_inv, e_packed, med):
            zc = e_cdf.shape[0]
            n_z = b * zh * zw * zc
            z_idx = jnp.broadcast_to(
                jnp.arange(zc, dtype=jnp.int32), (b, zh, zw, zc)
            ).reshape(-1)
            z_syms = dr.decode_interleaved(
                z_words, z_counts, z_idx, e_cdf, e_len, e_off, n=n_z, k=kz,
                inverse=e_inv, packed=e_packed,
            )
            z_hat = (
                z_syms.astype(jnp.float32).reshape(b, zh, zw, zc)
                + med[None, None, None, :]
            )
            latent_means, latent_scales = module.apply(
                v, z_hat, lv, method=ChannelARModule.hyper_synthesis
            )
            carry = dr.decoder_init(y_words, y_counts)
            y_hat_slices = []
            for i in range(module.num_slices):
                mu, indexes, mean_support = module.apply(
                    v, i, latent_means, latent_scales, list(y_hat_slices),
                    y_shape, scale_table,
                    method=ChannelARModule.decode_slice_params,
                )
                carry, syms = dr.decode_segment(
                    carry, y_words, indexes.reshape(-1).astype(jnp.int32),
                    y_cdf, y_len, y_off, k=k, inverse=y_inv, packed=y_packed,
                )
                sym = syms.reshape(indexes.shape).astype(jnp.int16)
                y_hat_slices.append(
                    module.apply(
                        v, i, mean_support, sym, mu,
                        method=ChannelARModule.decode_slice_dequant_finish,
                    )
                )
            y_hat = jnp.concatenate(y_hat_slices, axis=-1)
            return module.apply(
                v, y_hat, lv, method=ChannelARModule.synthesize
            )

        return fn

    def compress_device_fused(self, x, lv: int = 0, k: int = 1024,
                              cap: int | None = None) -> dict:
        """Fully device-side encode as ONE XLA program (transforms + scans).
        Same stream format as compress_device."""
        from ..coding import device_rans as dr  # noqa: F401

        assert self.eb_tables is not None, "call update() first"
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        b = x.shape[0]
        y_shape = (x.shape[1] // 16, x.shape[2] // 16)
        n_slice = y_shape[0] * y_shape[1] * (self.module.M // self.module.num_slices)
        n_total = b * self.module.num_slices * n_slice
        assert n_total % k == 0, (b, n_slice, k)
        if cap is None:
            cap = max(64, n_total // k)

        (yt_all, et_all) = self._device_tables(lv)
        yt, y_packed = yt_all[:3], yt_all[4]
        et, e_packed = et_all[:3], et_all[4]
        med = self._eb_medians_dev()

        zh, zw = x.shape[1] // 64, x.shape[2] // 64
        zc = int(et[0].shape[0])
        n_z = b * zh * zw * zc
        kz = math_gcd_pow2(n_z, k)
        z_cap = max(64, n_z // max(k // 4, 1))

        x = self._maybe_shard(x)
        for _attempt in range(4):
            fn = self._jit(
                f"fenc_{lv}_{b}_{y_shape}_{k}_{cap}",
                self._fused_encode_fn(lv, b, y_shape, k, cap, kz, z_cap),
            )
            y_words, y_counts, y_ovf, z_words, z_counts, z_ovf = fn(
                self.variables, x, scale_table, *yt, y_packed, *et, e_packed,
                med,
            )
            if not bool(y_ovf):
                break
            cap *= 2
        if bool(y_ovf) or bool(z_ovf):
            raise RuntimeError(
                "device-coder cap overflow; raise `cap` (symbol entropy "
                "higher than the 16 bits/symbol budget)"
            )
        y_counts_h = np.asarray(y_counts)
        z_counts_h = np.asarray(z_counts)
        return {
            "device_streams": {
                "y": (np.asarray(y_words), y_counts_h),
                "z": (np.asarray(z_words), z_counts_h),
            },
            "shape": (zh, zw),
            "k": k,
            "batch": b,
            "nbytes": int(y_counts_h.sum() + z_counts_h.sum()) * 2,
        }

    def decompress_device_fused(self, enc: dict, lv: int = 0) -> dict:
        """Fully device-side decode as ONE XLA program."""
        (yt_all, et_all) = self._device_tables(lv)
        yt, y_inv, y_packed = yt_all[:3], yt_all[3], yt_all[4]
        et, e_inv, e_packed = et_all[:3], et_all[3], et_all[4]
        k = enc["k"]
        zh, zw = enc["shape"]
        b = enc.get("batch", 1)
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        med = self._eb_medians_dev()

        y_words = jnp.asarray(enc["device_streams"]["y"][0])
        y_counts = jnp.asarray(enc["device_streams"]["y"][1])
        z_words = jnp.asarray(enc["device_streams"]["z"][0])
        z_counts = jnp.asarray(enc["device_streams"]["z"][1])
        kz = int(z_words.shape[0])

        fn = self._jit(
            f"fdec_{lv}_{b}_{zh}_{zw}_{k}_{kz}",
            self._fused_decode_fn(lv, b, zh, zw, k, kz),
        )
        x_hat = fn(
            self.variables, y_words, y_counts, z_words, z_counts, scale_table,
            *yt, y_inv, y_packed, *et, e_inv, e_packed, med,
        )
        return {"x_hat": x_hat}

    # ----------------- analytic (table-free) fused device codec -----------------
    # The flagship TPU-native serving profile: Gaussian CDF boundaries are
    # computed from sigma in closed form (erf) inside the coding scans, so
    # the y stream needs ZERO per-symbol table gathers (coding/analytic_rans).
    # Continuous sigma (no 64-level scale table) also improves rate over the
    # reference's quantized-scale coding. One XLA program per direction.

    def _analytic_encode_fn(self, lv: int, b: int, y_shape, k: int, cap: int,
                            kz: int, z_cap: int, y_flat_cap: int,
                            z_flat_cap: int):
        from ..coding import analytic_rans as ar
        from ..coding import device_rans as dr

        module = self.module

        def fn(v, x, e_cdf, e_len, e_off, e_packed, med):
            y, z, z_hat = module.apply(v, x, lv, method=ChannelARModule.analysis)
            latent_means, latent_scales = module.apply(
                v, z_hat, lv, method=ChannelARModule.hyper_synthesis
            )
            syms, pars, y_hat_slices = [], [], []
            for i in range(module.num_slices):
                mu, sigma, mean_support = module.apply(
                    v, i, latent_means, latent_scales, list(y_hat_slices),
                    y_shape, method=ChannelARModule.decode_slice_params_sigma,
                )
                p = ar.coder_params(sigma)
                sym32 = module.apply(
                    v, i, y, mu, method=ChannelARModule.quantize_slice
                ).astype(jnp.int32)
                sym32 = ar.clamp_symbols(sym32, p["c"])
                y_hat_slices.append(
                    module.apply(
                        v, i, mean_support, sym32.astype(jnp.int16), mu,
                        method=ChannelARModule.decode_slice_dequant_finish,
                    )
                )
                syms.append(sym32.reshape(-1))
                pars.append({kk: vv.reshape(-1) for kk, vv in p.items()})
            par_cat = {
                kk: jnp.concatenate([pp[kk] for pp in pars]) for kk in pars[0]
            }
            # grouped (decode-read-order) stream: single pointer on decode,
            # no per-lane counts; budget-sized, stays within y_flat_cap
            y_hdr, y_flat, y_total, y_ovf = ar.encode_gaussian_grouped(
                jnp.concatenate(syms), par_cat, k=k, cap=y_flat_cap
            )
            # the decoder's contiguous window read needs k words of headroom
            y_ovf = y_ovf | (y_total > y_flat_cap - k)
            z_idx = jnp.broadcast_to(
                jnp.arange(z.shape[-1], dtype=jnp.int32), z.shape
            ).reshape(-1)
            z_sym = jnp.round(
                z.astype(jnp.float32) - med[None, None, None, :]
            ).reshape(-1).astype(jnp.int32)
            z_words, z_counts, z_ovf = dr.encode_interleaved(
                z_sym, z_idx, e_cdf, e_len, e_off, k=kz, cap=z_cap,
                packed=e_packed,
            )
            z_flat, z_fovf = ar.compact_stream(z_words, z_counts, z_flat_cap)
            # ONE uint16 container so the host pays a single D2H fetch
            # (each transfer has ~30 ms fixed cost on tunneled devices):
            # [ovf, total_lo, total_hi, y_header(2k), y_flat,
            #  zc_lo(kz), zc_hi(kz), z_flat]
            ovf = (y_ovf | z_ovf | z_fovf).astype(jnp.uint16)
            tot = y_total.astype(jnp.uint32)
            zc = z_counts.astype(jnp.uint32)
            return jnp.concatenate([
                ovf[None],
                (tot & 0xFFFF).astype(jnp.uint16)[None],
                (tot >> 16).astype(jnp.uint16)[None],
                y_hdr.reshape(-1),
                y_flat,
                (zc & 0xFFFF).astype(jnp.uint16),
                (zc >> 16).astype(jnp.uint16),
                z_flat,
            ])

        return fn

    def _analytic_decode_fn(self, lv: int, b: int, zh: int, zw: int, k: int,
                            kz: int, y_flat_cap: int = 0,
                            raw_u8: bool = False, with_psnr: bool = False):
        from ..coding import analytic_rans as ar
        from ..coding import device_rans as dr

        module = self.module
        y_shape = (zh * 4, zw * 4)

        def fn(v, packed, e_cdf, e_len, e_off, e_inv, e_packed, med,
               x_pk=None):
            # parse the single-container stream (see _analytic_encode_fn)
            y_hdr = packed[3 : 3 + 2 * k].reshape(k, 2)
            o = 3 + 2 * k
            y_words = packed[o : o + y_flat_cap]
            o += y_flat_cap
            z_counts = (packed[o : o + kz].astype(jnp.int32)
                        | (packed[o + kz : o + 2 * kz].astype(jnp.int32) << 16))
            o += 2 * kz
            z_words = packed[o:]
            z_off = ar.lane_offsets(z_counts)
            zc = e_cdf.shape[0]
            n_z = b * zh * zw * zc
            z_idx = jnp.broadcast_to(
                jnp.arange(zc, dtype=jnp.int32), (b, zh, zw, zc)
            ).reshape(-1)
            z_syms = dr.decode_interleaved(
                z_words, z_counts, z_idx, e_cdf, e_len, e_off, n=n_z, k=kz,
                inverse=e_inv, packed=e_packed, lane_offsets=z_off,
            )
            z_hat = (
                z_syms.astype(jnp.float32).reshape(b, zh, zw, zc)
                + med[None, None, None, :]
            )
            latent_means, latent_scales = module.apply(
                v, z_hat, lv, method=ChannelARModule.hyper_synthesis
            )
            carry = ar.decode_gaussian_grouped_init(y_hdr)
            y_hat_slices = []
            for i in range(module.num_slices):
                mu, sigma, mean_support = module.apply(
                    v, i, latent_means, latent_scales, list(y_hat_slices),
                    y_shape, method=ChannelARModule.decode_slice_params_sigma,
                )
                p = ar.coder_params(sigma)
                carry, vals = ar.decode_gaussian_grouped_segment(
                    carry, y_words,
                    {kk: vv.reshape(-1) for kk, vv in p.items()}, k=k,
                )
                sym = vals.reshape(sigma.shape).astype(jnp.int16)
                y_hat_slices.append(
                    module.apply(
                        v, i, mean_support, sym, mu,
                        method=ChannelARModule.decode_slice_dequant_finish,
                    )
                )
            y_hat = jnp.concatenate(y_hat_slices, axis=-1)
            if raw_u8:
                raw = module.apply(
                    v, y_hat, lv, method=ChannelARModule.synthesize_raw_u8
                )
                if not with_psnr:
                    return raw
                # On-device PSNR vs the packed source rows [B, H, 3W] — the
                # reference's eval computes metrics on-device and fetches
                # scalars (reference eval.py:101-159). Permute the decoded
                # pre-shuffle u8 back to packed rows (dense rank-3; avoids
                # the lane-padded NHWC image) and reduce.
                bb, hh2, ww2, crr = raw.shape
                r = 2
                c = crr // (r * r)
                d = raw.reshape(bb, hh2, ww2, c, r, r)
                d = d.transpose(0, 1, 4, 2, 5, 3)  # (b, hh, i, ww, j, c)
                d = d.reshape(bb, hh2 * r, ww2 * r * c).astype(jnp.float32)
                mse = jnp.mean(
                    (d / 255.0 - x_pk.astype(jnp.float32)) ** 2, axis=(1, 2)
                )
                psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
                return raw, psnr
            return module.apply(
                v, y_hat, lv, method=ChannelARModule.synthesize
            )

        return fn

    def compress_device_analytic(self, x, lv: int = 0, k: int = 1024,
                                 cap: int | None = None,
                                 keep_source: bool = False) -> dict:
        """Table-free fully-device encode as ONE XLA program.

        x: NHWC [B,H,W,3] or packed RGB rows [B,H,3W] (preferred for
        serving: uploads dense and skips the lane-padded image layout).
        keep_source=True stashes the device-resident source under
        enc["x_dev"] for decompress(psnr_vs=...); off by default — it pins
        ~12 bytes/px of HBM for the container's lifetime."""
        assert self.eb_tables is not None, "call update() first"
        b = x.shape[0]
        if x.ndim == 4:
            H, W = x.shape[1], x.shape[2]
            x = x.reshape(b, H, W * 3)
        else:
            H, W = x.shape[1], x.shape[2] // 3
        y_shape = (H // 16, W // 16)
        n_slice = y_shape[0] * y_shape[1] * (self.module.M // self.module.num_slices)
        n_total = b * self.module.num_slices * n_slice
        assert n_total % k == 0, (b, n_slice, k)
        if cap is None:
            cap = max(64, n_total // k)

        (_, et_all) = self._device_tables(lv)
        et, e_packed = et_all[:3], et_all[4]
        med = self._eb_medians_dev()
        zh, zw = H // 64, W // 64
        zc = int(et[0].shape[0])
        n_z = b * zh * zw * zc
        kz = math_gcd_pow2(n_z, k)
        z_cap = max(64, n_z // max(k // 4, 1))

        x = self._maybe_shard(x)
        # transfer budget: ~2 bits/symbol flat stream (trained models code
        # 0.2-1.5 bits/sym; overflow retries recompile with 4x, cached);
        # the padded per-lane buffer keeps the generous 16 bits/sym budget
        # device-side to absorb lane skew
        y_flat_cap = max(4 * k, n_total // 8)
        z_flat_cap = max(4 * kz, n_z // 2)
        for _attempt in range(4):
            fn = self._jit(
                f"aenc_{lv}_{b}_{y_shape}_{k}_{cap}_{y_flat_cap}",
                self._analytic_encode_fn(lv, b, y_shape, k, cap, kz, z_cap,
                                         y_flat_cap, z_flat_cap),
            )
            packed = np.asarray(fn(self.variables, x, *et, e_packed, med))
            if packed[0] == 0:
                break
            cap *= 2
            z_cap *= 2
            y_flat_cap *= 4
            z_flat_cap *= 2
        if packed[0] != 0:
            raise RuntimeError("device-coder cap overflow; raise `cap`")
        y_total = int(packed[1]) | (int(packed[2]) << 16)
        o = 3 + 2 * k + y_flat_cap
        zc = (packed[o : o + kz].astype(np.int64)
              | (packed[o + kz : o + 2 * kz].astype(np.int64) << 16))
        yc = np.asarray([y_total + 2 * k])  # + per-lane final-state header
        out = {
            "packed": packed,
            "shape": (zh, zw),
            "k": k,
            "kz": kz,
            "y_flat_cap": y_flat_cap,
            "z_flat_cap": z_flat_cap,
            "batch": b,
            "coder": "analytic",
            "nbytes": int(yc.sum() + zc.sum()) * 2,
        }
        if keep_source:
            out["x_dev"] = x
        return out

    def decompress_device_analytic(self, enc: dict, lv: int = 0,
                                   raw_u8: bool = False,
                                   psnr_vs=None) -> dict:
        """Table-free fully-device decode as ONE XLA program.

        raw_u8=True returns {"rgb_raw": uint8 [B, H/2, W/2, 12]} — the
        pre-depth-to-space pixels; finish with `unshuffle_u8` on the host.
        Quarter the transfer bytes and no lane-padded image tensor.
        psnr_vs=<packed source [B,H,3W]> additionally computes per-image
        PSNR on device (requires raw_u8) and adds {"psnr": [B]}."""
        (_, et_all) = self._device_tables(lv)
        et, e_inv, e_packed = et_all[:3], et_all[3], et_all[4]
        k = enc["k"]
        kz = enc["kz"]
        zh, zw = enc["shape"]
        b = enc.get("batch", 1)
        y_flat_cap = enc["y_flat_cap"]
        med = self._eb_medians_dev()

        packed = jnp.asarray(enc["packed"])  # single H2D upload
        with_psnr = psnr_vs is not None
        assert raw_u8 or not with_psnr, "psnr_vs requires raw_u8"

        fn = self._jit(
            f"adec_{lv}_{b}_{zh}_{zw}_{k}_{kz}_{packed.shape}_{raw_u8}_{with_psnr}",
            self._analytic_decode_fn(lv, b, zh, zw, k, kz, y_flat_cap,
                                     raw_u8, with_psnr),
        )
        args = (self.variables, packed, *et, e_inv, e_packed, med)
        if with_psnr:
            raw, psnr = fn(*args, psnr_vs)
            return {"rgb_raw": raw, "psnr": psnr}
        out = fn(*args)
        return {"rgb_raw": out} if raw_u8 else {"x_hat": out}

    @staticmethod
    def fetch_multistream(dev_array, pool, n_streams: int = 4):
        """Fetch a device array as n concurrent chunk transfers.

        The tunneled device->host link is per-stream windowed (~36 MB/s one
        stream, ~51 MB/s aggregate at 4); a production PCIe DMA doesn't need
        this but isn't hurt by it. Returns a future resolving to the
        assembled np array."""
        n = dev_array.shape[0]
        n_streams = max(1, min(n_streams, n))
        # uneven split (jnp.split demands equal division): ceil-sized
        # leading chunks, like np.array_split
        bounds = [round(i * n / n_streams) for i in range(n_streams + 1)]
        chunks = [dev_array[lo:hi] for lo, hi in zip(bounds, bounds[1:])
                  if hi > lo] if n_streams > 1 else [dev_array]
        futs = [pool.submit(np.asarray, c) for c in chunks]

        def assemble():
            return np.concatenate([f.result() for f in futs], axis=0)

        return assemble

    def serve_roundtrip_pipelined(self, batches, lv: int = 0, k: int = 4096,
                                  fetch_workers: int = 6) -> list:
        """Staged serving pipeline over the analytic fused codec: encode
        dispatch+container-fetch, decode dispatch, and rgb fetches run in
        separate threads, so host<->device transfers hide behind the next
        batch's device programs (the device executes its queue FIFO while
        any one transfer is in flight). Returns
        [{"enc": container dict, "rgb_raw": uint8 np}, ...] in order;
        finish with unshuffle_u8."""
        from concurrent.futures import ThreadPoolExecutor

        results: list = [None] * len(batches)
        with ThreadPoolExecutor(max_workers=1) as enc_pool, \
                ThreadPoolExecutor(max_workers=1) as dec_pool, \
                ThreadPoolExecutor(max_workers=fetch_workers) as fetch_pool:
            enc_futs = [
                enc_pool.submit(self.compress_device_analytic, x, lv, k)
                for x in batches
            ]

            def dec_dispatch(ef):
                enc = ef.result()
                d = self.decompress_device_analytic(enc, raw_u8=True)
                return enc, d["rgb_raw"]

            dec_futs = [dec_pool.submit(dec_dispatch, ef) for ef in enc_futs]
            assembles = []
            for i, df in enumerate(dec_futs):
                enc, dev_rgb = df.result()
                # multi-stream fetch: the tunnel link aggregates ~1.4x over
                # a single stream; chunk transfers also interleave with the
                # next batch's container fetch instead of blocking it
                assembles.append(
                    (i, enc, self.fetch_multistream(dev_rgb, fetch_pool, 4))
                )
            for i, enc, assemble in assembles:
                results[i] = {"enc": enc, "rgb_raw": assemble()}
        return results

    def serve_roundtrip_metrics(self, batches, lv: int = 0,
                                k: int = 4096) -> list:
        """Roundtrip pipeline with ON-DEVICE verification: decode computes
        per-image PSNR against the encoder's device-resident source and only
        the bitstream container + PSNR scalars cross the link — the same
        measurement semantics as the reference's eval loop, which keeps
        x_hat on the accelerator and fetches metric scalars (reference
        eval.py:101-159). This is the device-program-bound serving profile;
        use serve_roundtrip_pipelined when the decoded pixels themselves
        must be delivered to the host.

        Returns [{"enc": container dict, "psnr": np [B]} ...] in order."""
        from concurrent.futures import ThreadPoolExecutor

        results: list = [None] * len(batches)
        with ThreadPoolExecutor(max_workers=1) as enc_pool, \
                ThreadPoolExecutor(max_workers=2) as dec_pool:
            enc_futs = [
                enc_pool.submit(self.compress_device_analytic, x, lv, k,
                                keep_source=True)
                for x in batches
            ]

            def dec_dispatch(ef):
                enc = ef.result()
                # drop the pinned source as soon as decode consumed it
                d = self.decompress_device_analytic(
                    enc, raw_u8=True, psnr_vs=enc.pop("x_dev")
                )
                return enc, d["psnr"]

            dec_futs = [dec_pool.submit(dec_dispatch, ef) for ef in enc_futs]
            for i, df in enumerate(dec_futs):
                enc, psnr = df.result()
                results[i] = {"enc": enc, "psnr": np.asarray(psnr)}
        return results

    def roundtrip_device_pipelined(self, batches, lv: int = 0,
                                   k: int = 1024) -> list:
        """Encode+decode a stream of batches through the fused device
        programs, overlapping host-side stream handling with device compute
        (JAX async dispatch pipelines consecutive batches)."""
        encs = [self.compress_device_fused(x, lv, k=k) for x in batches]
        return [
            {"enc": e, "x_hat": self.decompress_device_fused(e, lv)["x_hat"]}
            for e in encs
        ]


def unshuffle_u8(raw: np.ndarray, r: int = 2) -> np.ndarray:
    """Host-side depth-to-space for decompress_device_analytic(raw_u8=True):
    uint8 [B, H/r, W/r, 3 r^2] (torch PixelShuffle channel order
    c*r^2 + i*r + j) -> uint8 [B, H, W, 3]."""
    b, h, w, crr = raw.shape
    c = crr // (r * r)
    x = raw.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return np.ascontiguousarray(x.reshape(b, h * r, w * r, c))


def math_gcd_pow2(n: int, k: int) -> int:
    """Largest power-of-two lane count <= k that divides n."""
    kk = k
    while kk > 1 and n % kk != 0:
        kk //= 2
    return max(kk, 1)
