import os
import sys

# 8 virtual CPU devices for multi-chip sharding tests. NOTE: this axon jax
# build IGNORES the JAX_PLATFORMS env var (the shell exports JAX_PLATFORMS=axon
# and even exec-time env overrides don't take) — the only working override is
# jax.config.update('jax_platforms', ...) before first backend use.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import covomix_tpu.util.jaxcache  # noqa: E402,F401  (persistent compile cache)

REFERENCE = "/root/reference"


# shared with verify_reference_ckpts.py (single implementation of the
# reference-import shim)
from covomix_tpu.util.reference_compat import (  # noqa: E402,F401
    load_reference_covomix,
    reference_available,
)
