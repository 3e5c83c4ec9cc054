"""actionmesh_tpu: TPU-native video-to-4D animated mesh generation."""

import os

import jax

# Persistent compilation cache: full-size Stage I/II programs take minutes
# to compile; caching makes every later process launch near-instant.
if not getattr(jax.config, "jax_compilation_cache_dir", None):
    _cache_dir = os.environ.get(
        "ACTIONMESH_COMPILE_CACHE",
        os.path.expanduser("~/.cache/actionmesh_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # older jax without these flags
        pass
