"""tpu_tests configuration: persistent XLA compilation cache — the
remote TPU compiler costs 30-90 s per kernel (the G2 Bermudan several
minutes); caching makes repeated suite runs compile-free."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

try:
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
