"""Profiling and memory observability (SURVEY §5: the reference measures via
torch.cuda.max_memory_allocated + wall clock in a notebook; the TPU
equivalents are jax.profiler traces and device memory stats)."""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/kvpress_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto:

        with profile_trace("/tmp/trace"):
            jax.block_until_ready(prefill(params, ids))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Per-device memory stats (bytes_in_use / peak_bytes_in_use where the
    backend exposes them; CPU backends return {})."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def enable_compile_cache(path: str = "/tmp/kvpress_tpu_compile_cache",
                         min_compile_secs: float = 0.5):
    """Persistent XLA compilation cache: serving processes restart without
    re-paying the 20-40 s prefill/decode compiles (the serving-layer
    "persistent compile cache story"). Call once before the first jit.

    Caveat (measured in this repo's CI): a run killed mid-write can leave a
    truncated entry whose decompression crashes later readers — point each
    deployment at its own directory and clear it on crash-loop."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
