"""Tracing / timing helpers (SURVEY section 5: the reference only wall-clocks
around compress/decompress with cuda.synchronize, reference eval.py:110-118).

`trace(dir)` wraps jax.profiler for TensorBoard-viewable device traces;
`timed` measures host wall time with a device fence; `throughput_mp_s`
reports the north-star megapixels/sec metric.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None, sync=None):
    """Wall-clock a block; `sync` is an array/tree to block_until_ready on."""
    import jax

    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        elif "sync" in out:
            jax.block_until_ready(out["sync"])
        dt = time.perf_counter() - t0
        out["seconds"] = dt
        if results is not None:
            results[label] = dt
        if label:
            print(f"[timed] {label}: {dt * 1000:.2f} ms")


def throughput_mp_s(pixels: int, seconds: float) -> float:
    return pixels / 1e6 / seconds
