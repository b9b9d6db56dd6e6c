"""Interleaved rANS entropy coding ON the accelerator.

The host coder (coding/rans.py) is the CompressAI-stream-compatible path;
this module is the TPU-native profile: K independent rANS lanes coded as a
`lax.scan`, so encoding and decoding run as device programs and the only
host<->device traffic is the compressed words themselves. That removes the
per-slice symbol/index round trips that dominate the channel-AR decode on
hosts with slow device links (docs/PERFORMANCE.md).

Scheme (32-bit states, 16-bit renormalization words, 16-bit probability
precision — the rans32 variant of Duda's ANS as popularized by ryg_rans):

* symbol position p is coded by lane p % K at step p // K;
* encoding walks steps in reverse so decoding walks them forward;
* each Put emits at most ONE 16-bit word (state invariant [2^16, 2^32));
* out-of-table symbols use an escape bin followed by exactly two 16-bit
  raw words (the symbol value biased by 2^15 as uint32... stored as two
  16-bit halves), so the per-step emission count is bounded by 3;
* every lane flushes its final state as 2 words.

Stream layout (host side): per-lane word counts + concatenated lane words.
NOT CompressAI-compatible by construction — use the host coder when
bitstream interchange with the reference matters.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

PROB_BITS = 16
RANS_L = 1 << 16
MASK16 = 0xFFFF


class DeviceStream(NamedTuple):
    words: np.ndarray  # uint16 [K, cap] (valid prefix per lane)
    counts: np.ndarray  # int32 [K]
    n_symbols: int


def build_inverse_table(cdf: np.ndarray, cdf_length: np.ndarray) -> np.ndarray:
    """Direct cf -> symbol lookup, uint16 [R, 2^16].

    Turns the decoder's per-symbol binary search (log2(L) gathers) into ONE
    gather. 8 MB for 64 rows — the standard table-ANS trade."""
    r = cdf.shape[0]
    inv = np.zeros((r, 1 << PROB_BITS), np.uint16)
    cfs = np.arange(1 << PROB_BITS, dtype=np.int64)
    for i in range(r):
        row = cdf[i, : int(cdf_length[i])].astype(np.int64)
        inv[i] = np.searchsorted(row, cfs, side="right") - 1
    return inv


def build_packed_table(cdf: np.ndarray, cdf_length: np.ndarray) -> np.ndarray:
    """(start << 16 | freq) uint32 [R, L]: one gather per encoded symbol."""
    cdf = cdf.astype(np.uint32)
    packed = np.zeros_like(cdf)
    packed[:, :-1] = (cdf[:, :-1] << 16) | (cdf[:, 1:] - cdf[:, :-1])
    return packed


# --------------------------- numpy reference ---------------------------


def encode_interleaved_np(symbols, indexes, cdf, cdf_length, offset, k=8):
    """Reference implementation (slow, exact semantics for tests)."""
    symbols = np.asarray(symbols, np.int64).reshape(-1)
    indexes = np.asarray(indexes, np.int64).reshape(-1)
    n = symbols.shape[0]
    pad = (-n) % k
    if pad:
        # padded positions code symbol == offset (bin 0) of index 0
        symbols = np.concatenate([symbols, np.full(pad, offset[0], np.int64)])
        indexes = np.concatenate([indexes, np.zeros(pad, np.int64)])
    total = symbols.shape[0]
    steps = total // k

    states = np.full(k, RANS_L, np.uint64)
    out = [[] for _ in range(k)]

    def put(lane, start, freq):
        x = int(states[lane])
        if x >= (freq << 16):
            out[lane].append(x & MASK16)
            x >>= 16
        states[lane] = (x // freq) << 16 | ((x % freq) + start)

    def put_bits(lane, val):
        x = int(states[lane])
        # invariant x >= 2^16 -> always renormalize for 16-bit payload
        out[lane].append(x & MASK16)
        x >>= 16
        states[lane] = (x << 16) | val

    for s in range(steps - 1, -1, -1):
        for lane in range(k - 1, -1, -1):
            p = s * k + lane
            idx = indexes[p]
            max_value = int(cdf_length[idx]) - 2
            val = int(symbols[p]) - int(offset[idx])
            if val < 0 or val >= max_value:
                raw = np.uint32(np.int64(symbols[p]) & 0xFFFFFFFF)
                # decode order: [escape bin, hi, lo] -> encode reversed
                put_bits(lane, int(raw) & MASK16)
                put_bits(lane, (int(raw) >> 16) & MASK16)
                val = max_value
            start = int(cdf[idx, val])
            freq = int(cdf[idx, val + 1]) - start
            put(lane, start, freq)

    for lane in range(k):
        x = int(states[lane])
        out[lane].append(x & MASK16)
        out[lane].append((x >> 16) & MASK16)

    counts = np.array([len(o) for o in out], np.int32)
    cap = int(counts.max())
    words = np.zeros((k, cap), np.uint16)
    for lane in range(k):
        words[lane, : counts[lane]] = out[lane]
    return DeviceStream(words, counts, n)


def decode_interleaved_np(stream: DeviceStream, indexes, cdf, cdf_length, offset, k=8):
    indexes = np.asarray(indexes, np.int64).reshape(-1)
    n = stream.n_symbols
    pad = (-n) % k
    total = n + pad
    if pad:
        indexes = np.concatenate([indexes, np.zeros(pad, np.int64)])
    steps = total // k

    rp = stream.counts.astype(np.int64).copy()  # read backwards from the end
    states = np.zeros(k, np.uint64)
    words = stream.words

    def read(lane):
        rp[lane] -= 1
        return int(words[lane, rp[lane]])

    for lane in range(k):
        hi = read(lane)
        lo = read(lane)
        states[lane] = (hi << 16) | lo

    def get_bits(lane):
        x = int(states[lane])
        val = x & MASK16
        x >>= 16
        if x < RANS_L:
            x = (x << 16) | read(lane)
        states[lane] = x
        return val

    out = np.zeros(total, np.int64)
    for s in range(steps):
        for lane in range(k):
            p = s * k + lane
            idx = indexes[p]
            row = cdf[idx]
            max_value = int(cdf_length[idx]) - 2
            x = int(states[lane])
            cf = x & MASK16
            # find bin: cdf[sym] <= cf < cdf[sym+1]
            sym = int(np.searchsorted(row[: int(cdf_length[idx])], cf, "right")) - 1
            start = int(row[sym])
            freq = int(row[sym + 1]) - start
            x = freq * (x >> 16) + cf - start
            if x < RANS_L:
                x = (x << 16) | read(lane)
            states[lane] = x
            if sym == max_value:
                hi = get_bits(lane)
                lo = get_bits(lane)
                raw = (hi << 16) | lo
                out[p] = raw - (1 << 32) if raw >= (1 << 31) else raw
            else:
                out[p] = sym + int(offset[idx])
    return out[:n]


# ------------------------------ JAX (device) ------------------------------


def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def encode_interleaved(symbols, indexes, cdf, cdf_length, offset,
                       k: int = 256, cap: int | None = None, packed=None,
                       compact: str | None = None):
    """Device-side encode. symbols/indexes int32 [n]; tables device arrays.

    Returns (words uint16 [k, cap], counts int32 [k], overflow bool). cap
    bounds the words per lane; overflow=True means cap was too small (caller
    retries with a bigger cap or falls back to the host coder).

    compact: 'scatter' (default) lets XLA lower the slot scatter through a
    full sort of the steps*3*k emission slots; 'gather' inverts the
    slot->position map with a vectorized per-lane bisection plus one
    minor-axis take_along_axis. Measured on the v5e (probe_enc_compact,
    n=524k, k=256): scatter 26.3 ms vs gather 105.2 ms — TPU per-element
    gathers are rate-bound (~85M elem/s), so log2(rows) gather passes lose
    badly to one sort. Env RESLIC_ENC_COMPACT overrides.
    """
    jax, jnp = _jax()

    if compact is None:
        import os

        compact = os.environ.get("RESLIC_ENC_COMPACT", "scatter")

    symbols = symbols.reshape(-1).astype(jnp.int32)
    indexes = indexes.reshape(-1).astype(jnp.int32)
    n = symbols.shape[0]
    pad = (-n) % k
    if pad:
        symbols = jnp.concatenate([symbols, jnp.full(pad, offset[0], jnp.int32)])
        indexes = jnp.concatenate([indexes, jnp.zeros(pad, jnp.int32)])
    steps = symbols.shape[0] // k
    if cap is None:
        cap = steps * 3 + 2  # absolute worst case

    sym_g = symbols.reshape(steps, k)
    idx_g = indexes.reshape(steps, k)

    cdf = cdf.astype(jnp.uint32)
    cdf_length = cdf_length.astype(jnp.int32)
    offset = offset.astype(jnp.int32)

    # Words leave the scan as per-step OUTPUTS (up to 3 per lane per step:
    # escape lo, escape hi, renorm word — in encode order); one vectorized
    # scatter compacts them per lane afterwards. A words-buffer scatter in
    # the scan carry costs ~65 us/step (artifacts/probe_enc_scan.py).
    def step_fn(x, inp):
        sym, idx = inp
        max_value = (cdf_length[idx] - 2).astype(jnp.uint32)
        val = (sym - offset[idx]).astype(jnp.int32)
        esc = (val < 0) | (val >= max_value.astype(jnp.int32))

        raw = sym.astype(jnp.uint32)
        # escape emissions (invariant guarantees renorm when active)
        w0 = (x & MASK16).astype(jnp.uint16)
        x = jnp.where(esc, ((x >> 16) << 16) | (raw & MASK16), x)
        w1 = (x & MASK16).astype(jnp.uint16)
        x = jnp.where(esc, ((x >> 16) << 16) | ((raw >> 16) & MASK16), x)

        val_u = jnp.where(esc, max_value, val.astype(jnp.uint32))
        if packed is not None:
            sf = packed[idx, val_u]
            start, freq = sf >> 16, sf & MASK16
        else:
            start = cdf[idx, val_u]
            freq = cdf[idx, val_u + 1] - start
        need = x >= (freq << 16)
        w2 = (x & MASK16).astype(jnp.uint16)
        x = jnp.where(need, x >> 16, x)
        # div-free x//freq, x%freq: uint32 division lowers to a slow software
        # loop on TPU; an f32 estimate is within +-1 of the true quotient for
        # x < freq<<16 (q < 2^16, rel. err < 2^-23), so two bounded
        # corrections make it exact — all cheap VPU selects.
        q = (x.astype(jnp.float32) / freq.astype(jnp.float32)).astype(jnp.uint32)
        r = (x - q * freq).astype(jnp.int32)
        fi = freq.astype(jnp.int32)
        for _ in range(2):
            neg = r < 0
            q = jnp.where(neg, q - 1, q)
            r = jnp.where(neg, r + fi, r)
            ge = r >= fi
            q = jnp.where(ge, q + 1, q)
            r = jnp.where(ge, r - fi, r)
        x = (q << 16) | (r.astype(jnp.uint32) + start)
        return x, (w0, esc, w1, esc, w2, need)

    x0 = jnp.full((k,), RANS_L, jnp.uint32)
    x, (w0, d0, w1, d1, w2, d2) = jax.lax.scan(
        step_fn, x0, (sym_g[::-1], idx_g[::-1])
    )

    # per-lane compaction over the (step, slot) emission sequence; the two
    # flush words (lo, hi — decoder_init reads hi at counts-1) ride along
    # as two always-active trailing rows
    ws = jnp.stack([w0, w1, w2], axis=1).reshape(steps * 3, k)
    dos = jnp.stack([d0, d1, d2], axis=1).reshape(steps * 3, k)
    ws = jnp.concatenate([
        ws,
        (x & MASK16).astype(jnp.uint16)[None],
        ((x >> 16) & MASK16).astype(jnp.uint16)[None],
    ])
    dos_i = jnp.concatenate(
        [dos.astype(jnp.int32), jnp.ones((2, k), jnp.int32)]
    )
    r_rows = steps * 3 + 2

    if compact == "gather":
        # buf[lane, c] = ws[src, lane] where src is the row of lane's c-th
        # active emission: first row with inclusive-cumsum >= c+1, found by
        # branch-free bisection (log2 rows iterations of one minor-axis
        # take_along_axis each). The scatter formulation below lowers
        # through a full sort of the r_rows*k slots on TPU.
        csum_t = jnp.cumsum(dos_i, axis=0).T  # [k, r_rows], inclusive
        counts = csum_t[:, -1]
        target = (jnp.arange(cap, dtype=jnp.int32) + 1)[None, :]  # [1, cap]
        lo = jnp.zeros((k, cap), jnp.int32)
        hi = jnp.full((k, cap), r_rows, jnp.int32)
        for _ in range(int(np.ceil(np.log2(r_rows + 1)))):
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(
                csum_t, jnp.minimum(mid, r_rows - 1), axis=1
            )
            ge = v >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        src = jnp.minimum(lo, r_rows - 1)
        buf = jnp.take_along_axis(ws.T, src, axis=1)  # [k, cap]
        valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
        buf = jnp.where(valid, buf, jnp.zeros((), jnp.uint16))
        overflow = jnp.any(counts > cap)
        return buf, counts, overflow

    pos = jnp.cumsum(dos_i, axis=0) - dos_i
    counts = pos[-1] + dos_i[-1]
    buf = jnp.zeros((k, cap + 1), jnp.uint16)
    lanes_b = jnp.broadcast_to(jnp.arange(k)[None], (r_rows, k))
    col = jnp.where(dos_i > 0, jnp.minimum(pos, cap), cap)
    buf = buf.at[lanes_b.reshape(-1), col.reshape(-1)].set(ws.reshape(-1))
    overflow = jnp.any(counts > cap)
    return buf[:, :cap], counts, overflow


def emit_final(buf, ptr, x, k, cap):
    import jax.numpy as jnp

    lanes = jnp.arange(k)
    col = jnp.minimum(ptr, cap)
    buf = buf.at[lanes, col].set((x & MASK16).astype(jnp.uint16))
    ptr = ptr + 1
    col = jnp.minimum(ptr, cap)
    buf = buf.at[lanes, col].set(((x >> 16) & MASK16).astype(jnp.uint16))
    return buf, ptr + 1


def decoder_init(words, counts, offsets=None):
    """Initial decoder carry (per-lane states + read pointers) from a
    device-resident stream. words uint16 [k, cap], or a flat uint16 [n]
    stream read at offsets[lane] + j (see analytic_rans.compact_stream)."""
    _, jnp = _jax()

    words = words.astype(jnp.uint32)
    rp = counts.astype(jnp.int32) - 1

    if offsets is not None:
        def read_at(rp_):
            return words[offsets + jnp.maximum(rp_, 0)]
    else:
        k = words.shape[0]
        lanes = jnp.arange(k)

        def read_at(rp_):
            return words[lanes, jnp.maximum(rp_, 0)]

    hi = read_at(rp)
    rp = rp - 1
    lo = read_at(rp)
    rp = rp - 1
    x = (hi << 16) | lo
    return (x, rp)


def decode_segment(carry, words, indexes, cdf, cdf_length, offset, k: int,
                   inverse=None, packed=None, lane_offsets=None):
    """Decode len(indexes) symbols (must be a multiple of k), carrying the
    per-lane decoder state — the channel-AR slice loop chains segments
    without leaving the device. With lane_offsets, `words` is a flat
    compacted stream (analytic_rans.compact_stream)."""
    jax, jnp = _jax()

    indexes = indexes.reshape(-1).astype(jnp.int32)
    steps = indexes.shape[0] // k
    idx_g = indexes.reshape(steps, k)

    cdf_u = cdf.astype(jnp.uint32)
    cdf_length = cdf_length.astype(jnp.int32)
    offset = offset.astype(jnp.int32)
    max_len = cdf_u.shape[1]
    search_iters = int(np.ceil(np.log2(max_len))) + 1

    words = words.astype(jnp.uint32)
    lanes = jnp.arange(k)

    if lane_offsets is not None:
        def read(rp):
            return words[lane_offsets + jnp.maximum(rp, 0)], rp - 1
    else:
        def read(rp):
            w = words[lanes, jnp.maximum(rp, 0)]
            return w, rp - 1

    def get_bits16(x, rp, do):
        val = x & MASK16
        x2 = x >> 16
        need = x2 < RANS_L
        w, rp2 = read(rp)
        x2 = jnp.where(need, (x2 << 16) | w, x2)
        rp2 = jnp.where(need, rp2, rp)
        return jnp.where(do, val, 0), jnp.where(do, x2, x), jnp.where(do, rp2, rp)

    def find_bin(idx, cf):
        lo_ = jnp.zeros((k,), jnp.int32)
        hi_ = cdf_length[idx] - 1  # valid row prefix

        def body(_, lohi):
            lo_, hi_ = lohi
            mid = (lo_ + hi_ + 1) >> 1
            go_right = cdf_u[idx, mid] <= cf
            return (jnp.where(go_right, mid, lo_), jnp.where(go_right, hi_, mid - 1))

        lo_, hi_ = jax.lax.fori_loop(0, search_iters, body, (lo_, hi_))
        return lo_

    def step_fn(carry, idx):
        x, rp = carry
        cf = x & MASK16
        if inverse is not None:
            s = inverse[idx, cf].astype(jnp.int32)
        else:
            s = find_bin(idx, cf)
        if packed is not None:
            sf = packed[idx, s]
            start, freq = sf >> 16, sf & MASK16
        else:
            start = cdf_u[idx, s]
            freq = cdf_u[idx, s + 1] - start
        x = freq * (x >> 16) + cf - start
        need = x < RANS_L
        w, rp2 = read(rp)
        x = jnp.where(need, (x << 16) | w, x)
        rp = jnp.where(need, rp2, rp)

        esc = s == (cdf_length[idx] - 2)

        def do_escape(args):
            x, rp = args
            hi, x, rp = get_bits16(x, rp, esc)
            lo, x, rp = get_bits16(x, rp, esc)
            return x, rp, ((hi << 16) | lo).astype(jnp.int32)

        def no_escape(args):
            x, rp = args
            return x, rp, jnp.zeros((k,), jnp.int32)

        x, rp, raw = jax.lax.cond(jnp.any(esc), do_escape, no_escape, (x, rp))
        sym = jnp.where(esc, raw, s.astype(jnp.int32) + offset[idx])
        return (x, rp), sym

    carry, syms = jax.lax.scan(step_fn, carry, idx_g)
    return carry, syms.reshape(-1)


def decode_interleaved(words, counts, indexes, cdf, cdf_length, offset,
                       n: int, k: int = 256, inverse=None, packed=None,
                       lane_offsets=None):
    """Device-side decode of a full stream. Returns int32 [n]."""
    _, jnp = _jax()

    indexes = indexes.reshape(-1).astype(jnp.int32)
    pad = (-n) % k
    if pad:
        indexes = jnp.concatenate([indexes, jnp.zeros(pad, jnp.int32)])
    carry = decoder_init(words, counts, offsets=lane_offsets)
    _, syms = decode_segment(carry, words, indexes, cdf, cdf_length, offset, k,
                             inverse=inverse, packed=packed,
                             lane_offsets=lane_offsets)
    return syms[:n]
