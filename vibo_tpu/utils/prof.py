"""Profiling / tracing support (SURVEY.md section 6 "Tracing / profiling").

The reference's only instrumentation is time.time() around inference; here:
- `trace(dir)` context manager wrapping jax.profiler (view in TensorBoard /
  Perfetto) around any region;
- `device_timer` for honest wall-clock brackets — forces a scalar host
  transfer, which is the only reliable completion barrier through the axon
  TPU relay (block_until_ready returns early there; see memory notes);
- `throughput_report` turning (cells, seconds) into the [B] metric.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(result_box: dict, key: str = "seconds"):
    """Times the enclosed block; call result_box['force'](array) on the final
    device value inside the block to insert the completion barrier."""
    forced = []

    def force(x):
        import numpy as np
        arr = np.asarray(x)  # host transfer == real barrier
        forced.append(True)
        return arr

    result_box["force"] = force
    t0 = time.perf_counter()
    try:
        yield result_box
    finally:
        result_box[key] = time.perf_counter() - t0
        result_box["forced"] = bool(forced)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache for this process.

    TPU first-compiles on this image run 20-40 s per program; the cache makes
    every later invocation of the same program (CLI re-runs, bench re-runs,
    serving restarts) start warm. Off by default upstream, so the CLI and
    bench.py call this at startup (opt out: VIBO_NO_COMPCACHE=1 or the CLI's
    --no-compilation-cache). Safe to call before or after backend init; keyed
    by HLO fingerprint + compile options, so sharding/mesh changes miss
    cleanly rather than colliding.

    Returns the cache dir in effect, or None if disabled via env.

    Known cosmetic issue: on the CPU backend this jaxlib logs a benign
    "machine feature ... not supported" error per cached-executable load
    (its compile-time feature string and host-detection string are formatted
    differently, so the comparison false-positives even on the same
    machine). Loads succeed and numerics are unchanged (the whole test
    suite runs through these loads); stdout (the CLI's JSON) is unaffected.
    """
    import os

    if os.environ.get("VIBO_NO_COMPCACHE"):
        return None
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "VIBO_COMPCACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "vibo_tpu",
                         "xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default 1-second floor skips exactly the tiny
    # eval/scoring programs a serving process re-creates most often.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def peak_hbm_bytes() -> int | None:
    """Peak device-memory high-water mark in bytes, or None if the backend
    doesn't expose `memory_stats` (CPU does not; TPU/axon does). Reported in
    the CLI train summary so at-scale runs (RESULTS.md six-figure demo)
    record their HBM footprint alongside throughput."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    for key in ("peak_bytes_in_use", "bytes_in_use"):
        if key in stats:
            return int(stats[key])
    return None


def throughput_report(num_cells: int, seconds: float) -> dict:
    return {"response_cells_per_sec": num_cells / max(seconds, 1e-12),
            "cells": num_cells, "seconds": seconds}
