"""Persistent XLA compile-cache resolution, shared by the train/test CLIs.

Multi-scale training compiles one program per 64-px canvas bucket, and each
compile costs minutes on TPU platforms with remote compilation -- so the
cache defaults into OUTPUT_DIR and restarts/preemption-resumes skip all of
it. Resolution: TPU.COMPILE_CACHE_DIR "" -> OUTPUT_DIR/compile_cache when
OUTPUT_DIR is set; "off" -> disabled; any other value -> that path.
"""

from __future__ import annotations

import os
from typing import Optional


def resolve_compile_cache_dir(cfg) -> Optional[str]:
    """The effective cache directory, or None when caching is disabled."""
    cache_dir = cfg.TPU.COMPILE_CACHE_DIR
    if cache_dir == "off":
        return None
    if not cache_dir and cfg.OUTPUT_DIR:
        cache_dir = os.path.join(cfg.OUTPUT_DIR, "compile_cache")
    return cache_dir or None


def setup_compile_cache(cfg, min_compile_time_secs: float = 1.0) -> Optional[str]:
    """Point jax's persistent compilation cache at the resolved directory."""
    cache_dir = resolve_compile_cache_dir(cfg)
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
    return cache_dir
