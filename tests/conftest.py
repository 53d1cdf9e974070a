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


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def load_reference_covomix():
    """Import the reference covomix_model modules (acoustic, text2semantic) for
    cross-framework parity tests.

    The reference imports torchdiffeq / torchode / beartype / torchaudio, none
    of which are needed for forward-pass parity (they gate the torch ODE
    sampling paths and runtime type checks). We install minimal module stubs so
    the import succeeds, then the real torch modules run the real math."""
    import types
    import typing
    import importlib.machinery

    def _stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    bm = _stub("beartype", beartype=lambda f=None, **kw: (f if f is not None else (lambda g: g)))
    bt = _stub("beartype.typing", **{n: getattr(typing, n) for n in dir(typing) if not n.startswith("_")})
    # is_bearable gates the "source is raw audio" / "target is List[str]"
    # branches (text2semantic.py:690, :888, :895) — implement the two hints used
    def _is_bearable(obj, hint, *a, **k):
        import torch

        if hint is torch.FloatTensor:
            return isinstance(obj, torch.Tensor) and obj.is_floating_point()
        if getattr(hint, "__origin__", None) is list:
            return isinstance(obj, list) and all(isinstance(x, str) for x in obj)
        return isinstance(obj, hint) if isinstance(hint, type) else False

    bd = _stub("beartype.door", is_bearable=_is_bearable)
    bm.typing, bm.door = bt, bd
    _stub("torchode", Tsit5=type("Tsit5", (), {}), AutoDiffAdjoint=type("AutoDiffAdjoint", (), {}),
          ODETerm=type("ODETerm", (), {}), IntegralController=type("IntegralController", (), {}),
          InitialValueProblem=type("InitialValueProblem", (), {}))
    _stub("torchdiffeq", odeint=None)
    ta = _stub("torchaudio")
    ta.transforms = _stub("torchaudio.transforms")
    ta.functional = _stub("torchaudio.functional", DB_to_amplitude=None)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from covomix.covomix_model import acoustic as ref_acoustic
    from covomix.covomix_model import text2semantic as ref_t2s
    return ref_acoustic, ref_t2s
