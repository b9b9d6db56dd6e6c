"""Analytic (table-free) Gaussian rANS coding on the accelerator.

The table-driven device coder (device_rans.py) spends nearly all its time in
per-symbol HBM gathers: inverse-table lookup, packed start|freq lookup, and
the renorm word read (~14 us per 1024-lane step each, measured in
artifacts/probe_scan_cost.py). On TPU, transcendental vector math is two
orders of magnitude cheaper than random gathers (9 erf evaluations cost
1.8 us/step). So for the Gaussian-conditional y stream we compute the
quantized CDF boundaries *analytically* from sigma at every step instead of
looking anything up:

    bin s of nb = 2c+1 bins (c = ceil(6 sigma), capped) covers latent value
    v = s - c;   boundary B(s) = min(floor((Phi((s-c-0.5)/sigma) - G0)
                                     * scale_inv), A) + s,  B(nb) = 2^16
    with G0 = Phi((-c-0.5)/sigma), A = 2^16 - nb - 1... (A = m - nb),
    scale_inv = A / (Phi((c+0.5)/sigma) - G0).

  * The "+ s" term guarantees freq >= 1 for every bin (the same job as the
    C++ CDF quantizer's mass stealing, but in closed form).
  * Symbols are CLAMPED to [-c, c] at encode time, so the stream needs no
    escape path at all — the lax.cond and its extra word reads disappear
    from the scan. Clamping is part of the device-profile contract: the
    encoder's own reconstruction path uses the clamped symbols, so
    encode/decode stay bit-identical (P(|v| > 6 sigma) < 1e-9 per symbol
    for trained models).
  * sigma is used CONTINUOUSLY (clamped to [SCALES_MIN, 256]) — no 64-level
    scale quantization, which also improves rate over the table path.
  * Encode evaluates 2 boundaries (2 erf); decode binary-searches 11 fixed
    iterations (11 erf) — all VPU-vectorized, zero gathers.

Determinism: encoder and decoder evaluate the SAME closed-form f32
expression on the SAME sigma bits (sigma comes from mirrored/fused device
programs), and elementwise f32 ops round per-op IEEE inside XLA fusions, so
the boundaries agree bit-exactly. Validated by on-chip roundtrip tests.

State machine: identical rans32 variant to device_rans.py (32-bit states,
16-bit renorm words, k interleaved lanes, encode walks reversed), so
decoder_init/stream layout are shared.

Reference parity note: this is the TPU-native profile; the reference's
entropy coding (CompressAI rANS over quantized CDF tables,
reference src/entropy_models/coder.py) is matched by coding/rans.py.
"""

from __future__ import annotations

import numpy as np

PROB_BITS = 16
M_TOTAL = 1 << PROB_BITS
RANS_L = 1 << 16
MASK16 = 0xFFFF
CMAX = 511          # max one-sided support -> nb <= 1023, 11 search iters
SIGMA_MULT = 6.0    # support radius = ceil(6 sigma)
SEARCH_ITERS = 11


def _jnp():
    import jax  # noqa: F401
    import jax.numpy as jnp

    return jnp


# ------------------------- per-symbol parameters -------------------------


def coder_params(sigma, scales_min: float = 0.11, scales_max: float = 256.0):
    """Vectorized per-symbol coding parameters from continuous sigma.

    Returns a dict of arrays shaped like sigma (computed OUTSIDE the coding
    scan): c (int32 support radius), coff (c+0.5), inv_sigma, g0, scale_inv,
    a (float32 bin budget A = m - nb)."""
    jnp = _jnp()
    import jax

    sigma = jnp.clip(sigma.astype(jnp.float32), scales_min, scales_max)
    c = jnp.minimum(
        jnp.ceil(sigma * SIGMA_MULT), float(CMAX)
    ).astype(jnp.int32)
    nb = 2 * c + 1
    coff = c.astype(jnp.float32) + 0.5
    inv_sigma = 1.0 / sigma
    g0 = _phi(-coff * inv_sigma)
    g1 = _phi(coff * inv_sigma)
    a = (M_TOTAL - nb).astype(jnp.float32)
    scale_inv = a / (g1 - g0)
    return {
        "c": c,
        "nb": nb,
        "coff": coff,
        "inv_sigma": inv_sigma,
        "g0": g0,
        "scale_inv": scale_inv,
        "a": a,
    }


def _phi(z):
    jnp = _jnp()
    import jax

    return 0.5 * (1.0 + jax.lax.erf(z * np.float32(0.7071067811865476)))


def _boundary(s_i32, p):
    """B(s) for s in [0, nb]; B(nb) == M_TOTAL exactly. Shared verbatim by
    encode and decode so the f32 bits agree."""
    jnp = _jnp()

    s_f = s_i32.astype(jnp.float32)
    d = _phi((s_f - p["coff"]) * p["inv_sigma"]) - p["g0"]
    raw = jnp.floor(d * p["scale_inv"])
    raw = jnp.minimum(raw, p["a"])
    raw = jnp.maximum(raw, 0.0)
    b = raw.astype(jnp.uint32) + s_i32.astype(jnp.uint32)
    return jnp.where(s_i32 >= p["nb"], jnp.uint32(M_TOTAL), b)


def clamp_symbols(sym, c):
    jnp = _jnp()

    return jnp.clip(sym, -c, c)


# ------------------------------ encode scan ------------------------------


def encode_gaussian(symbols, params, k: int = 1024, cap: int | None = None):
    """Device encode of clamped Gaussian symbols under analytic boundaries.

    symbols int32 [n] (pre-clamped to +-c), params arrays [n] from
    coder_params. Returns (words uint16 [k, cap], counts int32 [k],
    overflow bool)."""
    jnp = _jnp()
    import jax

    n = symbols.shape[0]
    assert n % k == 0, (n, k)
    steps = n // k
    if cap is None:
        cap = steps + 2

    # The encoder knows every symbol upfront, so the erf-heavy CDF
    # boundaries hoist OUT of the scan as one fused vectorized pass over
    # all n symbols; the serial scan body shrinks to the rANS state update
    # (the decoder can't do this — its boundary search depends on the
    # symbol being decoded).
    s_all = (symbols + params["c"]).astype(jnp.int32)
    start_all = _boundary(s_all, params)
    freq_all = _boundary(s_all + 1, params) - start_all
    start_g = start_all.reshape(steps, k)
    freq_g = freq_all.reshape(steps, k)

    # Words leave the scan as per-step OUTPUTS; a single vectorized scatter
    # compacts them per lane afterwards. A words-buffer scatter in the scan
    # CARRY costs ~65 us/step on TPU (the buffer update serializes the
    # step); the out-emit design is ~25x cheaper (artifacts/probe_enc_scan).
    # Works because the no-escape analytic scheme emits at most ONE word
    # per lane per step.
    def step_fn(x, inp):
        start, freq = inp

        need = x >= (freq << 16)
        w_out = (x & MASK16).astype(jnp.uint16)
        x = jnp.where(need, x >> 16, x)
        # div-free x//freq, x%freq (see device_rans.put)
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
        return x, (w_out, need)

    x0 = jnp.full((k,), RANS_L, jnp.uint32)
    rev = lambda t: t[::-1]  # noqa: E731
    # unroll: the scan body is ~30 vector ops on [k] lanes — per-step loop
    # overhead dominates at k=1024-4096 (encode scans traced at 39 ms vs
    # the decode segment scans' 7 ms); unrolling amortizes it 8x.
    x, (ws, needs) = jax.lax.scan(
        step_fn, x0, (rev(start_g), rev(freq_g)), unroll=8
    )

    needs_i = needs.astype(jnp.int32)
    pos = jnp.cumsum(needs_i, axis=0) - needs_i  # [steps, k] dest columns
    counts = pos[-1] + needs_i[-1]
    buf = jnp.zeros((k, cap + 1), jnp.uint16)
    lanes_b = jnp.broadcast_to(jnp.arange(k)[None], needs.shape)
    col = jnp.where(needs, jnp.minimum(pos, cap), cap)
    buf = buf.at[lanes_b.reshape(-1), col.reshape(-1)].set(ws.reshape(-1))

    from .device_rans import emit_final

    buf, counts = emit_final(buf, counts, x, k, cap)
    overflow = jnp.any(counts > cap)
    return buf[:, :cap], counts, overflow


def compact_stream(buf, counts, flat_cap: int):
    """Device-side compaction of per-lane ragged words [k, cap] into ONE
    flat uint16 buffer: the padded [k, cap] buffer is a transfer-budget
    blowup (lane budget must absorb per-lane skew), while sum(counts) is
    the actual stream size. Returns (flat [flat_cap], overflow bool).
    Decoders read via flat[offset[lane] + j] (offsets = exclusive cumsum of
    counts, rebuilt device-side from counts).

    Formulated as a GATHER: each output position p finds its source lane
    by binary search over the (tiny, [k]) inclusive count cumsum, then its
    column as p - lane_offset. The scatter formulation XLA lowers through
    a full sort of k*cap slots on TPU; the gather is bandwidth-bound."""
    jnp = _jnp()

    k, cap = buf.shape
    csum = jnp.cumsum(counts)  # inclusive, [k]
    total = csum[-1]
    p = jnp.arange(flat_cap, dtype=jnp.int32)
    lane = jnp.searchsorted(csum, p + 1, side="left").astype(jnp.int32)
    lane_c = jnp.minimum(lane, k - 1)
    col = p - (csum[lane_c] - counts[lane_c])
    col = jnp.clip(col, 0, cap - 1)
    flat = buf[lane_c, col]
    flat = jnp.where(p < total, flat, jnp.zeros((), jnp.uint16))
    overflow = total > flat_cap
    return flat, overflow


def lane_offsets(counts):
    jnp = _jnp()

    return (jnp.cumsum(counts) - counts).astype(jnp.int32)


# -------------------- streamed-read (grouped) layout --------------------
# The per-lane ragged layout forces a RANDOM words-gather every decode step
# (~55 us per 4096-lane step — the decode scan's dominant cost). But the
# renorm pattern is mirrored between encoder and decoder, so the encoder
# can store words in EXACT decode-read order (grouped by symbol step, lane
# ascending within a group). The decoder then keeps ONE global stream
# pointer: each step reads a contiguous [k] dynamic slice and distributes
# words to renormalizing lanes by prefix-sum rank — a tiny in-register
# gather instead of an HBM random access.


def encode_gaussian_grouped(symbols, params, k: int = 1024,
                            cap: int | None = None):
    """Encode with the grouped stream layout.

    Returns (header uint16 [k, 2] — final lane states lo|hi,
             flat uint16 [cap] — words in decode-read order,
             total int32 — words actually used,
             overflow bool)."""
    jnp = _jnp()
    import jax

    n = symbols.shape[0]
    assert n % k == 0, (n, k)
    steps = n // k
    if cap is None:
        cap = steps * k  # absolute worst case: one word per symbol

    # boundaries hoisted out of the scan (see encode_gaussian)
    s_all = (symbols + params["c"]).astype(jnp.int32)
    start_all = _boundary(s_all, params)
    freq_all = _boundary(s_all + 1, params) - start_all
    start_g = start_all.reshape(steps, k)
    freq_g = freq_all.reshape(steps, k)

    def step_fn(x, inp):
        start, freq = inp
        need = x >= (freq << 16)
        w_out = (x & MASK16).astype(jnp.uint16)
        x = jnp.where(need, x >> 16, x)
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
        return x, (w_out, need)

    x0 = jnp.full((k,), RANS_L, jnp.uint32)
    rev = lambda t: t[::-1]  # noqa: E731
    # unroll: the scan body is ~30 vector ops on [k] lanes — per-step loop
    # overhead dominates at k=1024-4096 (encode scans traced at 39 ms vs
    # the decode segment scans' 7 ms); unrolling amortizes it 8x.
    x, (ws, needs) = jax.lax.scan(
        step_fn, x0, (rev(start_g), rev(freq_g)), unroll=8
    )

    # decode-read order: groups t = S-1-s_enc (so reverse rows back), lane
    # ascending within a group
    ws_d = ws[::-1]
    needs_d = needs[::-1].astype(jnp.int32)
    flatn = needs_d.reshape(-1)
    csum = jnp.cumsum(flatn)  # inclusive
    total = csum[-1]
    # GATHER compaction: output word p comes from the unique slot whose
    # inclusive emission-cumsum first reaches p+1. The previous scatter
    # formulation (slots -> positions) lowers through a full sort of
    # steps*k slots on TPU (~26 ms at 3.9M slots); this binary-search
    # gather is bandwidth-bound (log2(n) gather rounds over csum).
    p = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.searchsorted(csum, p + 1, side="left").astype(jnp.int32)
    src = jnp.minimum(src, flatn.shape[0] - 1)
    flat = jnp.where(p < total, ws_d.reshape(-1)[src],
                     jnp.zeros((), jnp.uint16))
    header = jnp.stack(
        [(x & MASK16).astype(jnp.uint16), (x >> 16).astype(jnp.uint16)],
        axis=-1,
    )
    overflow = total > cap
    return header, flat[:cap], total.astype(jnp.int32), overflow


def decode_gaussian_grouped_init(header):
    jnp = _jnp()

    x = (header[:, 1].astype(jnp.uint32) << 16) | header[:, 0].astype(
        jnp.uint32
    )
    return (x, jnp.zeros((), jnp.int32))


def decode_gaussian_grouped_segment(carry, flat, params, k: int):
    """Decode len(params) symbols chaining (states, stream pointer).
    `flat` must be padded with >= k trailing zeros (the contiguous window
    read may overrun at stream end)."""
    jnp = _jnp()
    import jax

    n = params["c"].shape[0]
    steps = n // k
    par_g = {kk: v.reshape(steps, k) for kk, v in params.items()}

    def step_fn(carry, p):
        x, g = carry
        cf = (x & MASK16).astype(jnp.uint32)
        lo = jnp.zeros((k,), jnp.int32)
        hi = p["nb"] - 1
        for _ in range(SEARCH_ITERS):
            mid = (lo + hi + 1) >> 1
            go_right = _boundary(mid, p) <= cf
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid - 1)
        s = lo
        start = _boundary(s, p)
        freq = _boundary(s + 1, p) - start

        x = freq * (x >> 16) + cf - start
        need = (x < RANS_L).astype(jnp.int32)
        rank = jnp.cumsum(need) - need
        window = jax.lax.dynamic_slice(flat, (g,), (k,)).astype(jnp.uint32)
        w = window[rank]
        x = jnp.where(need > 0, (x << 16) | w, x)
        g = g + jnp.sum(need)
        return (x, g), (s - p["c"]).astype(jnp.int32)

    carry, vals = jax.lax.scan(step_fn, carry, par_g)
    return carry, vals.reshape(-1)


def decode_gaussian_grouped(header, flat, params, k: int):
    carry = decode_gaussian_grouped_init(header)
    _, vals = decode_gaussian_grouped_segment(carry, flat, params, k)
    return vals


# ------------------------------ decode scan ------------------------------


def decode_gaussian_segment(carry, words, params, k: int, offsets=None):
    """Decode len(params) symbols (multiple of k), chaining per-lane decoder
    state across channel-AR slices. Returns (carry, values int32 [n]).
    With offsets, `words` is a flat compacted stream (compact_stream)."""
    jnp = _jnp()
    import jax

    n = params["c"].shape[0]
    steps = n // k
    par_g = {kk: v.reshape(steps, k) for kk, v in params.items()}

    words = words.astype(jnp.uint32)
    lanes = jnp.arange(k)

    def step_fn(carry, p):
        x, rp = carry
        cf = (x & MASK16).astype(jnp.uint32)

        # binary search bins [0, nb-1] over analytic boundaries — UNROLLED:
        # a lax.fori_loop nested inside the scan step compiles to a real TPU
        # loop with per-iteration overhead; unrolled it is pure vector math.
        lo = jnp.zeros((k,), jnp.int32)
        hi = p["nb"] - 1
        for _ in range(SEARCH_ITERS):
            mid = (lo + hi + 1) >> 1
            go_right = _boundary(mid, p) <= cf
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid - 1)
        s = lo
        start = _boundary(s, p)
        freq = _boundary(s + 1, p) - start

        x = freq * (x >> 16) + cf - start
        need = x < RANS_L
        if offsets is not None:
            w = words[offsets + jnp.maximum(rp, 0)]
        else:
            w = words[lanes, jnp.maximum(rp, 0)]
        x = jnp.where(need, (x << 16) | w, x)
        rp = jnp.where(need, rp - 1, rp)
        return (x, rp), (s - p["c"]).astype(jnp.int32)

    carry, vals = jax.lax.scan(step_fn, carry, par_g)
    return carry, vals.reshape(-1)


def decode_gaussian(words, counts, params, k: int, offsets=None):
    from .device_rans import decoder_init

    carry = decoder_init(words, counts, offsets=offsets)
    _, vals = decode_gaussian_segment(carry, words, params, k, offsets=offsets)
    return vals


# --------------------------- numpy reference ---------------------------


def _phi_np(z):
    import scipy.special

    return (0.5 * (1.0 + scipy.special.erf(
        np.float32(z) * np.float32(0.7071067811865476)
    ).astype(np.float32))).astype(np.float32)


def coder_params_np(sigma, scales_min=0.11, scales_max=256.0):
    sigma = np.clip(np.asarray(sigma, np.float32), scales_min, scales_max)
    c = np.minimum(np.ceil(sigma * SIGMA_MULT), CMAX).astype(np.int32)
    nb = 2 * c + 1
    coff = c.astype(np.float32) + np.float32(0.5)
    inv_sigma = (np.float32(1.0) / sigma).astype(np.float32)
    g0 = _phi_np(-coff * inv_sigma)
    g1 = _phi_np(coff * inv_sigma)
    a = (M_TOTAL - nb).astype(np.float32)
    scale_inv = (a / (g1 - g0)).astype(np.float32)
    return {"c": c, "nb": nb, "coff": coff, "inv_sigma": inv_sigma,
            "g0": g0, "scale_inv": scale_inv, "a": a}


def _boundary_np(s, p):
    s = np.asarray(s, np.int32)
    d = (_phi_np((s.astype(np.float32) - p["coff"]) * p["inv_sigma"])
         - p["g0"]).astype(np.float32)
    raw = np.floor((d * p["scale_inv"]).astype(np.float32))
    raw = np.minimum(raw, p["a"])
    raw = np.maximum(raw, 0.0)
    b = raw.astype(np.uint32) + s.astype(np.uint32)
    return np.where(s >= p["nb"], np.uint32(M_TOTAL), b)


def encode_gaussian_np(symbols, sigma, k=8):
    """Reference encoder (slow): returns (words [k, cap], counts, n)."""
    p = coder_params_np(sigma)
    symbols = np.clip(np.asarray(symbols, np.int64), -p["c"], p["c"])
    n = symbols.shape[0]
    assert n % k == 0
    steps = n // k
    states = np.full(k, RANS_L, np.uint64)
    out = [[] for _ in range(k)]
    for st in range(steps - 1, -1, -1):
        for lane in range(k - 1, -1, -1):
            i = st * k + lane
            pp = {kk: v[i] for kk, v in p.items()}
            s = int(symbols[i] + pp["c"])
            start = int(_boundary_np(np.int32(s), pp))
            freq = int(_boundary_np(np.int32(s + 1), pp)) - start
            x = int(states[lane])
            if x >= (freq << 16):
                out[lane].append(x & MASK16)
                x >>= 16
            states[lane] = ((x // freq) << 16) | ((x % freq) + start)
    for lane in range(k):
        x = int(states[lane])
        out[lane].append(x & MASK16)
        out[lane].append((x >> 16) & MASK16)
    counts = np.array([len(o) for o in out], np.int32)
    cap = int(counts.max())
    words = np.zeros((k, cap), np.uint16)
    for lane in range(k):
        words[lane, : counts[lane]] = out[lane]
    return words, counts, n


def decode_gaussian_np(words, counts, sigma, k=8):
    p = coder_params_np(sigma)
    n = p["c"].shape[0]
    steps = n // k
    rp = counts.astype(np.int64).copy()
    states = np.zeros(k, np.uint64)

    def read(lane):
        rp[lane] -= 1
        return int(words[lane, rp[lane]])

    for lane in range(k):
        hi = read(lane)
        lo = read(lane)
        states[lane] = (hi << 16) | lo

    out = np.zeros(n, np.int64)
    for st in range(steps):
        for lane in range(k):
            i = st * k + lane
            pp = {kk: v[i] for kk, v in p.items()}
            x = int(states[lane])
            cf = x & MASK16
            lo_, hi_ = 0, int(pp["nb"]) - 1
            for _ in range(SEARCH_ITERS):
                mid = (lo_ + hi_ + 1) >> 1
                if int(_boundary_np(np.int32(mid), pp)) <= cf:
                    lo_ = mid
                else:
                    hi_ = mid - 1
            s = lo_
            start = int(_boundary_np(np.int32(s), pp))
            freq = int(_boundary_np(np.int32(s + 1), pp)) - start
            x = freq * (x >> 16) + cf - start
            if x < RANS_L:
                x = (x << 16) | read(lane)
            states[lane] = x
            out[i] = s - int(pp["c"])
    return out
