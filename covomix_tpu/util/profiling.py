"""Tracing / profiling / numerics-debug helpers (SURVEY §5 aux subsystems).

TPU equivalents of the reference observability surface:
  * fairseq `--profile` emit_nvtx + record_function annotations
    (fairseq/dataclass/configs.py:228, fairseq_cli/train.py:328) ->
    jax.profiler traces (Perfetto/XPlane) + jax.named_scope
  * fairseq NanDetector (fairseq/nan_detector.py:14) -> jax.debug_nans /
    checkify wrappers
  * CUDA env pretty-print at startup (fairseq/trainer.py:156-164) ->
    device_report()
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/covomix_trace", enabled: bool = True):
    """Capture a profiler trace viewable in Perfetto / TensorBoard."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # annotate jitted regions: with profiling.scope("t2s_decode"): ...


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """NanDetector equivalent: raises at the op producing NaN/Inf under jit."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_call(fn, *args, **kwargs):
    """Run fn under checkify, returning (error, value); use in tests to
    localize NaN/OOB without aborting."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    return checked(*args, **kwargs)


def device_report() -> str:
    lines = [f"jax {jax.__version__}; backend {jax.default_backend()}"]
    for d in jax.devices():
        lines.append(f"  {d.id}: {d.device_kind} ({d.platform})")
    return "\n".join(lines)
