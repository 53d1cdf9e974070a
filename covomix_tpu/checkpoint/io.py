"""Native checkpoint format: orbax for training state, npz for plain params.

Two tiers:
  * save/load_params: a flat .npz of the param pytree — dependency-free,
    mmap-friendly, used by the CLIs for converted reference checkpoints.
  * save/load_train_state: orbax checkpointing for full training state
    (params, opt_state, EMA shadow, step), with async save support.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params: Any, meta: dict | None = None) -> None:
    """Save a param pytree as .npz (+ sidecar .json metadata). The '.npz'
    suffix is normalized up front: np.savez would silently append it, leaving
    the sidecar and load_params pointing at a nonexistent bare path."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = _flatten(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **flat)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_params(path: str, device=None) -> Any:
    """Load a .npz param pytree; arrays land as jnp on `device` (default
    device when None)."""
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten(flat)
    put = (lambda a: jax.device_put(a, device)) if device is not None else jnp.asarray
    return jax.tree_util.tree_map(put, tree)


def load_meta(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


# --------------------------------------------------------------------------
# orbax train-state checkpointing


def save_train_state(ckpt_dir: str, state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(ckpt_dir: str, step: int | None = None, abstract_state: Any = None) -> Any:
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(ckpt_dir) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = steps[-1]
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        if abstract_state is not None:
            return ckptr.restore(path, item=abstract_state)
        return ckptr.restore(path)



def _step_dirs(ckpt_dir: str):
    """step_NNNN dirs only — orbax leaves '<name>.orbax-checkpoint-tmp-<ts>'
    behind if a save is interrupted; those start with 'step_' too and must
    not crash auto-resume (int() would raise on them)."""
    out = []
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return out

def latest_step(ckpt_dir: str) -> int | None:
    """scan_checkpoint-style auto-resume helper (hifi-gan/train.py:44-59)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = _step_dirs(ckpt_dir)
    return max(steps) if steps else None


class TopKCheckpointer:
    """save_last + keep-top-K-by-metric checkpoint policy, matching the
    reference's ModelCheckpoint(save_last=True, save_top_k=10, monitor='l2')
    (/root/reference/train.py:72-76, lower is better).

    * `save(state, step)` — rolling "last" save; the previous unranked last is
      pruned so long runs don't fill the disk.
    * `save(state, step, metric=l2)` — ranked save; only the best `top_k`
      ranked checkpoints survive (plus the rolling last).
    The ranking persists in topk.json for resume; `best_step()` returns the
    current best ranked step."""

    def __init__(self, ckpt_dir: str, top_k: int = 10, mode: str = "min"):
        assert mode in ("min", "max")
        self.ckpt_dir = ckpt_dir
        self.top_k = top_k
        self.mode = mode
        self._index_path = os.path.join(ckpt_dir, "topk.json")
        self.ranked: dict[int, float] = {}
        self.last_step: int | None = None
        if os.path.isfile(self._index_path):
            with open(self._index_path) as f:
                idx = json.load(f)
            self.ranked = {int(k): float(v) for k, v in idx.get("ranked", {}).items()}
            self.last_step = idx.get("last_step")

    def _persist(self):
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(self._index_path, "w") as f:
            json.dump({"ranked": {str(k): v for k, v in self.ranked.items()},
                       "last_step": self.last_step,
                       "best_step": self.best_step()}, f, indent=2)

    def _delete(self, step: int):
        import shutil

        path = os.path.join(self.ckpt_dir, f"step_{step:08d}")
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)

    def _kept_steps(self) -> set:
        keep = set(self.ranked.keys())
        if self.last_step is not None:
            keep.add(self.last_step)
        return keep

    def save(self, state: Any, step: int, metric: float | None = None) -> None:
        prev_last = self.last_step
        save_train_state(self.ckpt_dir, state, step)
        self.last_step = step
        if metric is not None:
            self.ranked[step] = float(metric)
            if len(self.ranked) > self.top_k:
                order = sorted(self.ranked.items(), key=lambda kv: kv[1],
                               reverse=(self.mode == "max"))
                for s, _ in order[self.top_k:]:
                    del self.ranked[s]
        keep = self._kept_steps()
        if prev_last is not None and prev_last != step and prev_last not in keep:
            self._delete(prev_last)
        for s in _step_dirs(self.ckpt_dir):
            if s not in keep:
                self._delete(s)
        self._persist()

    def best_step(self) -> int | None:
        if not self.ranked:
            return None
        order = sorted(self.ranked.items(), key=lambda kv: kv[1],
                       reverse=(self.mode == "max"))
        return order[0][0]
