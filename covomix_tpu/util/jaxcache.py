"""Persistent XLA compilation cache setup.

Import (or call enable()) before the first jit compilation. Compiled
executables are memoized on disk so repeated CLI invocations / test runs skip
recompilation — important both for TPU (20-40 s first compiles) and for the
CPU test mesh."""

import os

import jax

_DEFAULT_DIR = os.environ.get("COVOMIX_JAX_CACHE", os.path.expanduser("~/.cache/covomix_jax"))
_enabled = False


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    _enabled = True


enable()

if os.environ.get("COVOMIX_FORCE_CPU"):
    # Every CLI imports this module before any device use. The axon jax
    # build ignores the JAX_PLATFORMS env var; this config update is the
    # only working CPU override (used by subprocess tests and TPU-less
    # machines).
    jax.config.update("jax_platforms", "cpu")
