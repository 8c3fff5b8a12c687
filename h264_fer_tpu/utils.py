"""Small runtime utilities shared by the CLI, bench and drivers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    The 1080p device programs take tens of seconds to compile (XLA traces
    the whole wavefront + entropy pipeline); without a persistent cache
    every fresh process pays that again — which is how the round-3 bench
    recorded 0.0 fps inside its subprocess budget. One call per process,
    before the first jit execution, makes reruns hit the disk cache.

    path: cache directory; default ``$H264_FER_TPU_CACHE`` or
    ``~/.cache/h264_fer_tpu/jax``. Returns the directory used.
    """
    import jax

    cache = path or os.environ.get(
        "H264_FER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "h264_fer_tpu",
                     "jax"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache everything: the default thresholds skip sub-second compiles,
    # but the bench's QCIF fallback metrics want warm starts too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # pragma: no cover — older jax
        pass
    return cache
