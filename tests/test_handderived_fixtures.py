"""Hand-derived rANS bitstream fixtures.

The stream format's provenance must not rest solely on two same-author
implementations agreeing (coding/csrc/rans.cpp and tests/rans64_model.py):
these fixtures derive expected bytes BY HAND from the published ryg_rans
64-bit scheme + the CompressAI indexed-CDF symbol protocol (reference
entropy_models/coder.py:10-56), with every state transition spelled out so
a reviewer can recheck the arithmetic on paper. The C++ coder must produce
exactly these bytes and decode them back.

Scheme constants (public ryg_rans rans64 + CompressAI):
  RANS_L = 2^31 (state lower bound), PROB_BITS = 16, 32-bit renorm words,
  final flush writes the 64-bit state as [low32, high32] at the stream
  head, renorm words follow in reverse emission order, all little-endian.
Encode transition for a slot (start, freq):
  x_max = ((RANS_L >> 16) << 32) * freq = freq * 2^47
  if x >= x_max: emit (x & 0xffffffff), x >>= 32        # renormalize
  x' = floor(x / freq) * 2^16 + (x mod freq) + start
Bypass transition for nbits raw bits of value v:
  behaves like freq = 2^(16 - nbits), then x' = x * 2^nbits + v
Symbols are coded in REVERSE order (rANS is LIFO), so the decoder reads
them forward.
Symbol protocol per coded value (given cdf row, cdf_length, offset):
  value = symbol - offset; max_value = cdf_length - 2
  in-range (0 <= value < max_value): slot (cdf[value], cdf[value+1]-cdf[value])
  out-of-range: code the escape slot value = max_value, then raw_val =
  -2*value-1 (if value < 0) or 2*(value-max_value) (if >= max_value) in
  4-bit bypass chunks: first the chunk COUNT in base-15 (emit 15 while
  count >= 15, then the remainder), then the chunks least-significant-first.
"""

from __future__ import annotations

import numpy as np
import pytest

from reslic_tcm_tpu.coding.rans import RansDecoder, encode_with_indexes


def _le32(*words: int) -> bytes:
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def test_hand_derived_single_uniform_symbol():
    """One symbol, 2-entry uniform CDF [0, 32768, 65536], offset 0.

    Derivation (all powers of two — checkable at a glance):
      slot: value 0 -> start = cdf[0] = 0, freq = 32768 = 2^15
      x0 = RANS_L = 2^31
      x_max = 2^15 * 2^47 = 2^62; x0 < x_max -> no renorm word
      x1 = floor(2^31 / 2^15) * 2^16 + (2^31 mod 2^15) + 0
         = 2^16 * 2^16 + 0 = 2^32
      flush: [x1 & 0xffffffff, x1 >> 32] = [0, 1]
      stream = le32(0) + le32(1) = 00 00 00 00  01 00 00 00
    """
    cdfs = [[0, 32768, 65536]]
    expected = _le32(0, 1)

    got = encode_with_indexes([0], [0], cdfs, [3], [0])
    assert got == expected, got.hex()

    dec = RansDecoder()
    out = dec.decode_with_indexes(expected, [0], cdfs, [3], [0])
    assert list(out) == [0]


def test_hand_derived_renormalization():
    """Two freq-1 symbols force one renormalization word.

    CDF [0, 1, 65536] (symbol 0 has freq 1 = probability 2^-16), offset 0,
    cdf_length 3, max_value 1; coded values [0, 0] are both in range.

    Derivation (encoder processes the two identical slots in reverse):
      slot: start = 0, freq = 1; x_max = 1 * 2^47 = 2^47
      step 1 (last symbol): x = 2^31 < 2^47 -> no renorm
        x = floor(2^31 / 1) * 2^16 + 0 + 0 = 2^47
      step 2 (first symbol): x = 2^47 >= x_max -> emit word
        word = 2^47 & 0xffffffff = 0; x >>= 32 -> x = 2^15
        x = 2^15 * 2^16 + 0 + 0 = 2^31
      flush: [2^31 & 0xffffffff, 2^31 >> 32] = [0x80000000, 0]
      stream = le32(0x80000000) + le32(0) + le32(renorm word 0)
    """
    cdfs = [[0, 1, 65536]]
    expected = _le32(0x80000000, 0, 0)

    got = encode_with_indexes([0, 0], [0, 0], cdfs, [3], [0])
    assert got == expected, got.hex()

    dec = RansDecoder()
    out = dec.decode_with_indexes(expected, [0, 0], cdfs, [3], [0])
    assert list(out) == [0, 0]


def test_hand_derived_bypass_escape():
    """One out-of-range symbol exercising the 4-bit bypass escape, with the
    whole transition chain re-derived inline from the spec prose in the
    module docstring (stdlib ints only — shares no code with the coder).

    CDF [0, 32768, 49152, 65536]: two in-range values (freq 2^15, 2^14)
    plus the escape slot (start 49152, freq 2^14 = 16384). offset 0,
    cdf_length 4, max_value 2. Coded symbol: 5.
      value = 5 >= max_value -> escape: raw_val = 2*(5-2) = 6
      chunks of 4 bits: 6 -> one chunk [6]; count = 1 (< 15)
      plan (decoder order): sym(49152, 16384), bits(1, 4), bits(6, 4)
    Encoder runs the plan REVERSED from x = 2^31:
      bits(6,4):  bypass freq = 2^12, x_max = 2^59; no renorm
                  x = 2^31 * 2^4 + 6 = 2^35 + 6
      bits(1,4):  x < 2^59; x = (2^35 + 6) * 2^4 + 1 = 2^39 + 97
      sym:        freq 16384 = 2^14, x_max = 2^61; x < x_max
                  q = floor((2^39 + 97) / 2^14) = 2^25  (97 < 2^14)
                  r = 97
                  x = 2^25 * 2^16 + 97 + 49152 = 2^41 + 49249
      flush: low = (2^41 + 49249) & 0xffffffff = 49249 = 0xC061
             high = (2^41 + 49249) >> 32 = 2^9 = 512
      stream = le32(49249) + le32(512)
    """
    cdfs = [[0, 32768, 49152, 65536]]
    expected = _le32(49249, 512)

    got = encode_with_indexes([5], [0], cdfs, [4], [0])
    assert got == expected, got.hex()

    dec = RansDecoder()
    out = dec.decode_with_indexes(expected, [0], cdfs, [4], [0])
    assert list(out) == [5]


def test_hand_derived_negative_escape_and_offset():
    """Negative out-of-range value with a nonzero offset.

    Same CDF [0, 32768, 49152, 65536], offset -1. Coded symbol: -3.
      value = -3 - (-1) = -2 < 0 -> escape: raw_val = -2*(-2) - 1 = 3
      one 4-bit chunk [3], count 1
      plan: sym(49152, 16384), bits(1, 4), bits(3, 4)
    Encode reversed from x = 2^31:
      bits(3,4): x = 2^35 + 3
      bits(1,4): x = (2^35 + 3) * 2^4 + 1 = 2^39 + 49
      sym:       q = floor((2^39 + 49) / 2^14) = 2^25, r = 49
                 x = 2^41 + 49 + 49152 = 2^41 + 49201
      flush: [49201, 512]
    """
    cdfs = [[0, 32768, 49152, 65536]]
    expected = _le32(49201, 512)

    got = encode_with_indexes([-3], [0], cdfs, [4], [-1])
    assert got == expected, got.hex()

    dec = RansDecoder()
    out = dec.decode_with_indexes(expected, [0], cdfs, [4], [-1])
    assert list(out) == [-3]


def test_hand_derived_two_symbol_mixed_stream():
    """Two symbols through DIFFERENT cdf rows — checks interleaving order
    (decoder-forward, encoder-reverse) and per-index row selection.

    Row 0: [0, 32768, 65536] (uniform halves), offset 0, max_value 1.
    Row 1: [0, 16384, 65536], offset 2, max_value 1.
    Coded [0, 2] with indexes [0, 1]:
      symbol 0, row 0: value 0 -> slot (0, 32768 = 2^15)
      symbol 2, row 1: value 0 -> slot (0, 16384 = 2^14)
    Encode reversed from x = 2^31:
      row-1 slot: x_max = 2^14 * 2^47 = 2^61; no renorm
        x = floor(2^31 / 2^14) * 2^16 + 0 + 0 = 2^17 * 2^16 = 2^33
      row-0 slot: x_max = 2^62; no renorm
        x = floor(2^33 / 2^15) * 2^16 + 0 + 0 = 2^18 * 2^16 = 2^34
      flush: [0, 4]
    """
    cdfs = [[0, 32768, 65536], [0, 16384, 65536]]
    expected = _le32(0, 4)

    got = encode_with_indexes([0, 2], [0, 1], cdfs, [3, 3], [0, 2])
    assert got == expected, got.hex()

    dec = RansDecoder()
    out = dec.decode_with_indexes(expected, [0, 1], cdfs, [3, 3], [0, 2])
    assert list(out) == [0, 2]
