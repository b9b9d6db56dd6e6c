"""Independent pure-Python model of the rANS bitstream format.

This is a from-first-principles implementation of the public ryg_rans 64-bit
coding scheme (state in [2^31, 2^63), 32-bit renormalization words emitted in
reverse, 16-bit probability precision) with the indexed-CDF symbol protocol
and the 4-bit bypass escape used by CompressAI-style learned-image-compression
coders (reference entropy_models/coder.py:10-56). It shares NO code with
`reslic_tcm_tpu/coding/csrc/rans.cpp`; it exists to cross-check that the C++
coder's stream format is, and stays, the canonical one: the golden tests
assert byte-for-byte equality between the two and decode each other's
streams. A format drift in either implementation breaks the tests.

Kept deliberately simple and slow (pure Python ints) — it is a specification,
not a production path.
"""

from __future__ import annotations

PROB_BITS = 16
BYPASS_BITS = 4
MAX_BYPASS = (1 << BYPASS_BITS) - 1
RANS_L = 1 << 31
MASK32 = (1 << 32) - 1


def _plan_symbols(symbols, indexes, cdfs, cdf_lengths, offsets):
    """Forward pass: map coded values to (start, freq) slots plus bypass
    chunks, in the order the decoder will consume them."""
    plan = []  # ("sym", start, freq) | ("bits", value, nbits)
    for sym, idx in zip(symbols, indexes):
        cdf = cdfs[idx]
        max_value = cdf_lengths[idx] - 2
        value = int(sym) - int(offsets[idx])

        raw_val = 0
        if value < 0:
            raw_val = -2 * value - 1
            value = max_value
        elif value >= max_value:
            raw_val = 2 * (value - max_value)
            value = max_value

        plan.append(("sym", int(cdf[value]), int(cdf[value + 1] - cdf[value])))

        if value == max_value:
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_BITS)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS:
                plan.append(("bits", MAX_BYPASS, BYPASS_BITS))
                val -= MAX_BYPASS
            plan.append(("bits", val, BYPASS_BITS))
            for j in range(n_bypass):
                chunk = (raw_val >> (j * BYPASS_BITS)) & MAX_BYPASS
                plan.append(("bits", chunk, BYPASS_BITS))
    return plan


def encode(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    plan = _plan_symbols(symbols, indexes, cdfs, cdf_lengths, offsets)

    x = RANS_L
    words = []  # collected in reverse emission order; reversed at the end
    for kind, a, b in reversed(plan):
        if kind == "sym":
            start, freq = a, b
            x_max = ((RANS_L >> PROB_BITS) << 32) * freq
            if x >= x_max:
                words.append(x & MASK32)
                x >>= 32
            x = ((x // freq) << PROB_BITS) + (x % freq) + start
        else:
            val, nbits = a, b
            freq = 1 << (PROB_BITS - nbits)
            x_max = ((RANS_L >> PROB_BITS) << 32) * freq
            if x >= x_max:
                words.append(x & MASK32)
                x >>= 32
            x = (x << nbits) | val

    # Final state flush: low word then high word at the stream head.
    head = [x & MASK32, (x >> 32) & MASK32]
    stream_words = head + list(reversed(words))
    out = bytearray()
    for w in stream_words:
        out += int(w).to_bytes(4, "little")
    return bytes(out)


class _Reader:
    def __init__(self, data: bytes):
        n_words = len(data) // 4
        self.words = [
            int.from_bytes(data[4 * i : 4 * i + 4], "little") for i in range(n_words)
        ]
        self.pos = 0

    def next(self) -> int:
        if self.pos < len(self.words):
            w = self.words[self.pos]
            self.pos += 1
            return w
        return 0


def decode(data: bytes, indexes, cdfs, cdf_lengths, offsets):
    r = _Reader(data)
    x = r.next() | (r.next() << 32)

    out = []
    for idx in indexes:
        cdf = cdfs[idx]
        cdf_len = cdf_lengths[idx]
        max_value = cdf_len - 2
        offset = int(offsets[idx])

        cum = x & ((1 << PROB_BITS) - 1)
        s = 0
        while s < cdf_len - 1 and int(cdf[s + 1]) <= cum:
            s += 1
        start = int(cdf[s])
        freq = int(cdf[s + 1]) - start

        x = freq * (x >> PROB_BITS) + (x & ((1 << PROB_BITS) - 1)) - start
        if x < RANS_L:
            x = (x << 32) | r.next()

        value = s
        if value == max_value:
            def get_bits(x):
                val = x & MAX_BYPASS
                x >>= BYPASS_BITS
                if x < RANS_L:
                    x = (x << 32) | r.next()
                return val, x

            val, x = get_bits(x)
            n_bypass = val
            while val == MAX_BYPASS:
                val, x = get_bits(x)
                n_bypass += val
            raw_val = 0
            for j in range(n_bypass):
                val, x = get_bits(x)
                if j * BYPASS_BITS < 32:
                    raw_val |= val << (j * BYPASS_BITS)
            value = raw_val >> 1
            if raw_val & 1:
                value = -value - 1
            else:
                value += max_value
        out.append(value + offset)
    return out
