"""Import the reference torch modules for cross-framework parity checks.

Shared by tests/ (test_torch_parity.py) and verify_reference_ckpts.py: the
reference covomix_model modules import torchdiffeq / torchode / beartype /
torchaudio, none of which are needed for forward-pass parity (they gate the
torch ODE sampling paths and runtime type checks) — minimal module stubs let
the import succeed, then the real torch modules run the real math. The
reference code is EXECUTED at check time, never copied."""

from __future__ import annotations

import os
import sys

REFERENCE = os.environ.get("COVOMIX_REFERENCE", "/root/reference")


def reference_available(reference: str | None = None) -> bool:
    return os.path.isdir(reference or REFERENCE)


def load_reference_covomix(reference: str | None = None):
    """Returns (acoustic_module, text2semantic_module) from the reference."""
    import types
    import typing
    import importlib.machinery

    reference = reference or REFERENCE

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

    if reference not in sys.path:
        sys.path.insert(0, reference)
    from covomix.covomix_model import acoustic as ref_acoustic
    from covomix.covomix_model import text2semantic as ref_t2s
    return ref_acoustic, ref_t2s


def load_reference_vocoder(reference: str | None = None):
    """Returns the reference vocoder models module (covomix/vocoder/models.py,
    inference copy — Generator + remove_weight_norm)."""
    reference = reference or REFERENCE
    if reference not in sys.path:
        sys.path.insert(0, reference)
    from covomix.vocoder import models as ref_models
    return ref_models
