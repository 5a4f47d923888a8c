"""Process-wide JAX configuration: persistent compilation cache.

The TPU analogue of the reference's session-reuse design (buffers and tables
persist across frames, gpujpeg_common.c:632-637) extended across *processes*:
jit-compiled pipeline programs are cached on disk so the first-frame
compilation cost (~seconds for large geometries) is paid once per
(geometry, capacity) configuration, not once per process.
"""

from __future__ import annotations

import os

_DONE = False


def ensure_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import jax

        cache_dir = (path
                     or os.environ.get("GPUJPEG_TPU_CACHE")
                     or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or os.path.expanduser("~/.cache/gpujpeg_tpu/jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
