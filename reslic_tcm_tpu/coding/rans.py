"""ctypes binding to the native rANS coder (csrc/rans.cpp).

Provides the same five-argument indexed-CDF API as the reference's coder
proxy (reference entropy_models/coder.py:10-56) but with numpy arrays instead
of Python lists, plus the buffered-encoder / streaming-decoder pair used by
the channel-autoregressive models (reference models/reference/tcm.py:522-565,
604-628).

The shared library is built on first import with g++ -O3 (cached next to the
source); no pip-installable extension machinery required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SRC = os.path.join(_SRC_DIR, "rans.cpp")
_LIB = os.path.join(_SRC_DIR, "librans.so")

_build_lock = threading.Lock()
_lib = None

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)

        lib.pmf_to_quantized_cdf.restype = ctypes.c_int
        lib.pmf_to_quantized_cdf.argtypes = [_f32p, ctypes.c_int, ctypes.c_int, _u32p]

        lib.rans_encode_with_indexes.restype = ctypes.c_int
        lib.rans_encode_with_indexes.argtypes = [
            _i32p, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p,
            _u8p, ctypes.c_int64,
        ]
        lib.rans_decode_with_indexes.restype = ctypes.c_int
        lib.rans_decode_with_indexes.argtypes = [
            _u8p, ctypes.c_int64, _i32p, ctypes.c_int, _i32p, ctypes.c_int,
            _i32p, _i32p, _i32p,
        ]

        lib.rans_encoder_new.restype = ctypes.c_void_p
        lib.rans_encoder_free.argtypes = [ctypes.c_void_p]
        lib.rans_encoder_push.argtypes = [
            ctypes.c_void_p, _i32p, _i32p, ctypes.c_int, _i32p, ctypes.c_int,
            _i32p, _i32p,
        ]
        lib.rans_encoder_flush.restype = ctypes.c_int
        lib.rans_encoder_flush.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int64]

        lib.rans_decoder_new.restype = ctypes.c_void_p
        lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
        lib.rans_decoder_set_stream.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int64]
        lib.rans_decoder_decode_stream.argtypes = [
            ctypes.c_void_p, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p,
            _i32p, _i32p,
        ]
        _lib = lib
    return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _as_cdf(cdfs) -> np.ndarray:
    c = np.ascontiguousarray(np.asarray(cdfs), dtype=np.int32)
    if c.ndim != 2:
        raise ValueError("cdfs must be a 2-D [num_indexes, max_len] array")
    return c


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Float pmf (tail-mass bin last) -> monotone integer CDF summing to 2^p."""
    lib = _load()
    p = np.ascontiguousarray(np.asarray(pmf, dtype=np.float32).reshape(-1))
    out = np.empty(p.shape[0] + 1, dtype=np.uint32)
    rc = lib.pmf_to_quantized_cdf(p, p.shape[0], precision, out)
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out.astype(np.int32)


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    lib = _load()
    sym = _as_i32(symbols)
    idx = _as_i32(indexes)
    if sym.shape != idx.shape:
        raise ValueError("symbols and indexes must have the same length")
    cdf = _as_cdf(cdfs)
    lens = _as_i32(cdf_lengths)
    offs = _as_i32(offsets)
    cap = 4 * (sym.shape[0] + 2) * 4 + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rans_encode_with_indexes(
        sym, idx, sym.shape[0], cdf, cdf.shape[1], lens, offs, out, cap
    )
    if n < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return out[:n].tobytes()


def decode_with_indexes(string: bytes, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    lib = _load()
    idx = _as_i32(indexes)
    cdf = _as_cdf(cdfs)
    lens = _as_i32(cdf_lengths)
    offs = _as_i32(offsets)
    data = np.frombuffer(string, dtype=np.uint8)
    data = np.ascontiguousarray(data)
    out = np.empty(idx.shape[0], dtype=np.int32)
    rc = lib.rans_decode_with_indexes(
        data, data.shape[0], idx, idx.shape[0], cdf, cdf.shape[1], lens, offs, out
    )
    if rc != 0:
        raise RuntimeError("rANS decode failed")
    return out


class BufferedRansEncoder:
    """Accumulate symbol batches, emit one stream on flush().

    Mirrors compressai.ans.BufferedRansEncoder (used at reference
    tcm.py:522-565) with array-based batching.
    """

    def __init__(self):
        self._lib = _load()
        self._h = self._lib.rans_encoder_new()
        self._count = 0

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        sym = _as_i32(symbols)
        idx = _as_i32(indexes)
        if sym.shape != idx.shape:
            raise ValueError("symbols and indexes must have the same length")
        cdf = _as_cdf(cdfs)
        self._lib.rans_encoder_push(
            self._h, sym, idx, sym.shape[0], cdf, cdf.shape[1],
            _as_i32(cdf_lengths), _as_i32(offsets),
        )
        self._count += sym.shape[0]

    def flush(self) -> bytes:
        cap = 4 * (self._count + 2) * 4 + 64
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.rans_encoder_flush(self._h, out, cap)
        if n < 0:
            raise RuntimeError("rANS encode buffer overflow")
        self._count = 0
        return out[:n].tobytes()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rans_encoder_free(self._h)
            self._h = None


class RansDecoder:
    """Streaming decoder for the sequential channel-AR decode loop
    (reference tcm.py:604-628)."""

    def __init__(self):
        self._lib = _load()
        self._h = self._lib.rans_decoder_new()

    def set_stream(self, string: bytes):
        data = np.ascontiguousarray(np.frombuffer(string, dtype=np.uint8))
        self._lib.rans_decoder_set_stream(self._h, data, data.shape[0])

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        idx = _as_i32(indexes)
        cdf = _as_cdf(cdfs)
        out = np.empty(idx.shape[0], dtype=np.int32)
        self._lib.rans_decoder_decode_stream(
            self._h, idx, idx.shape[0], cdf, cdf.shape[1],
            _as_i32(cdf_lengths), _as_i32(offsets), out,
        )
        return out

    def decode_with_indexes(self, string: bytes, indexes, cdfs, cdf_lengths, offsets):
        self.set_stream(string)
        return self.decode_stream(indexes, cdfs, cdf_lengths, offsets)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rans_decoder_free(self._h)
            self._h = None
