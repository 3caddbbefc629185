"""Process-level environment setup.

Replaces the reference's iopath PathManager indirection (`utils/env.py:9-11`)
with plain filesystem access, and adds TPU-specific setup: the persistent
XLA compilation cache (Pallas/Mosaic compiles are expensive — ~minutes per
kernel through the remote-compile path in this environment — and fully
cacheable).
"""

from __future__ import annotations

import os

_CACHE_DIR = os.environ.get(
    "AICITY_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_compile")
)
_setup_done = False


def setup_environment() -> None:
    """Idempotent: enable the persistent compilation cache."""
    global _setup_done
    if _setup_done:
        return
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _setup_done = True
