"""Persistent XLA compilation cache.

Compiles go through a remote helper in this environment (2-4 min for a full
train step); caching the returned executables on local disk makes repeat CLI
invocations near-instant. Call early, before the first jit executes.
"""

import os


def enable(cache_dir: str = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "CONTRASTORS_TPU_COMPILE_CACHE", "/tmp/contrastors_tpu_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 2 s: every compile goes through the remote helper, so trivial
        # dispatch ops (convert_element_type, broadcasts) land at ~1 s with
        # jitter — a 1 s threshold persisted them nondeterministically
        # (run-to-run "extra cache entries"; cache KEYS were always stable).
        # Real model executables compile in minutes and always qualify.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax or read-only fs: not fatal
        print(f"[compile-cache] disabled ({e})")
