"""Device mesh construction and sharding rules (TPU-native parallelism layer).

Replaces the reference's entire torch.distributed surface (SURVEY §2.6):
DDP grad-allreduce, fairseq process groups, NCCL config — with one
`jax.sharding.Mesh` plus NamedSharding annotations; XLA emits the ICI
collectives. Axes:

  'dp'  — data parallel (batch axis; grads all-reduced by XLA psum)
  'tp'  — tensor parallel (attention heads / FFN hidden / vocab sharding)

FSDP is expressed as sharding parameters along 'dp' as well (zero-style),
available via `fsdp=True` in param_shardings."""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp >= 1, f"tp={tp} exceeds the {n} available devices (dp would be 0)"
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than the {n} available devices"
    if dp * tp < n:
        # an explicitly smaller mesh runs on a device subset (e.g. train.py
        # --dp 1 on a multi-chip host, or a serving batch not divisible by n);
        # say so — a typoed --dp/--tp silently training on fewer chips is a
        # costly surprise (round-2 ADVICE)
        print(f"note: mesh dp={dp} x tp={tp} uses {dp * tp} of {n} available devices")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# ---------------------------------------------------------------------------
# rule-based param sharding: regex on the flattened path -> PartitionSpec

# Shard big matmul weights over 'tp':
#  - qkv/attn projections: output dim (heads)   [d, h*dh] -> (fsdp, 'tp')
#  - attn out:             input dim            [h*dh, d] -> ('tp', fsdp)
#  - ff in  (w1/ff1/fc1/kv/q):                  [d, ff]   -> (fsdp, 'tp')
#  - ff out (w2/ff2/fc2/out):                   [ff, d]   -> ('tp', fsdp)
#  - embeddings / logit weights: vocab          [V, d]    -> ('tp', fsdp)
_TP_RULES = [
    (re.compile(r"(qkv|/q|/kv|ff1|fc1|w1|time_mlp)/w$"), lambda nd: P(*([None] * (nd - 1) + ["tp"]))),
    (re.compile(r"(attn_out|/out|ff2|fc2|w2)/w$"), lambda nd: P(*(["tp"] + [None] * (nd - 1)))),
    (re.compile(r"(phoneme_emb|text_emb|sem_emb)/w$"), lambda nd: P(*(["tp"] + [None] * (nd - 1)))),
    # hubert's kmeans centroids are a BARE leaf (no /w child): match the path end
    (re.compile(r"(^|/)kmeans$"), lambda nd: P(*(["tp"] + [None] * (nd - 1)))),
    (re.compile(r"(ff1|fc1|w1|qkv|/q|/kv|time_mlp)/b$"), lambda nd: P("tp")),
]


def _flat_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = []
    for kp, leaf in flat:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        paths.append(("/".join(parts), leaf))
    return paths, treedef


def param_shardings(mesh: Mesh, params: Any, *, tp: bool = True, fsdp: bool = False) -> Any:
    """NamedSharding tree for a param pytree. tp shards matmul weights over
    'tp'; fsdp additionally shards the largest remaining axis over 'dp'."""
    paths, treedef = _flat_paths(params)
    shardings = []
    tp_size = dict(mesh.shape).get("tp", 1)   # meshes without a 'tp' axis (pp/sp) -> replicate
    dp_size = dict(mesh.shape).get("dp", 1)
    for path, leaf in paths:
        nd = np.ndim(leaf)
        spec = None
        if tp and tp_size > 1:
            for rx, make in _TP_RULES:
                if rx.search(path):
                    cand = make(nd)
                    # only shard if the dim divides evenly
                    ok = True
                    for ax, name in enumerate(cand):
                        if name == "tp" and leaf.shape[ax] % tp_size != 0:
                            ok = False
                    if ok:
                        spec = cand
                    break
        if spec is None:
            spec = P(*([None] * nd))
        if fsdp and dp_size > 1 and nd >= 1:
            # shard the first un-sharded axis divisible by dp
            dims = list(spec)
            for ax in range(nd):
                if dims[ax] is None and leaf.shape[ax] % dp_size == 0 and leaf.shape[ax] >= dp_size:
                    dims[ax] = "dp"
                    break
            spec = P(*dims)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Shard the leading (batch) axis of every leaf over 'dp'."""
    def shard(leaf):
        nd = np.ndim(leaf)
        if nd == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*(["dp"] + [None] * (nd - 1))))

    return jax.tree_util.tree_map(shard, batch)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda leaf: NamedSharding(mesh, P()), tree)


def shard_tree(tree: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), tree, shardings)
