"""Multi-host distributed initialization + process-aware data feeding.

The reference ecosystem rendezvouses across nodes with torch.distributed —
tcp:// / file:// init methods, SLURM auto-detection, and a torch_xla path
(fairseq/distributed/utils.py:96-156, :273-300, :390-405). The TPU-native
equivalent is tiny by design: `jax.distributed.initialize()` once per host
process, after which `jax.devices()` is the GLOBAL device list and a single
`Mesh` over it replaces every process-group/collective wrapper in that file
(SURVEY §2.6 comm-backend row). What remains host-side is data feeding: each
process loads only its own shard of the global batch and assembles global
arrays with `jax.make_array_from_process_local_data`.

Single-process behavior is exactly degenerate (process_count()==1: initialize
is a no-op, the batch slice is the whole batch, global assembly ==
device_put) — asserted by tests/test_multihost.py, which is as far as this
rig can test (one host); the surface mirrors what fairseq's gloo-spawn tests
cover without a cluster (SURVEY §4)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    requested: bool = False,
) -> bool:
    """Bring up the JAX distributed runtime for multi-host training/serving.

    Resolution order (mirroring fairseq's rendezvous surface,
    distributed/utils.py:96-156):
      1. explicit args (the tcp://host:port equivalent — pass
         coordinator_address='host:port', num_processes, process_id);
      2. SLURM auto-detect (SLURM_PROCID / SLURM_NTASKS present and ntasks>1);
      3. auto-detect: bare `jax.distributed.initialize()` (JAX reads SLURM
         env / TPU-pod metadata — the torch_xla path's equivalent,
         utils.py:390-405), attempted whenever the caller explicitly asked
         for multi-host (`requested=True`) or the SLURM env indicates >1
         task.

    Returns True if the distributed runtime was initialized, False for the
    single-process degenerate case (nothing to do). MUST be called before any
    other JAX API that touches the backend (jax.distributed.initialize()
    raises once the XLA backend exists — which is why the already-initialized
    check reads jax.distributed, never jax.process_count(), whose
    jax.devices() call would itself initialize a single-host backend and
    poison the rendezvous)."""
    if jax.distributed.is_initialized():
        return True  # already initialized
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    slurm_n = int(os.environ.get("SLURM_NTASKS", "1"))
    if slurm_n > 1 or requested or (num_processes is not None and num_processes > 1):
        # jax's cluster auto-detect resolves coordinator + ids from the
        # SLURM_* env (the reference's _infer_slurm_init equivalent) or the
        # TPU-pod metadata. In a plain single-process environment there is
        # nothing to detect and initialize() raises — degrade to single-host
        # with a note rather than crashing a --multihost smoke run.
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:
            print(f"note: multi-host requested but no cluster detected "
                  f"({str(e)[:120]}); running single-host")
            return False
        return jax.process_count() > 1
    return False


def process_batch_slice(global_batch: int) -> slice:
    """The slice of the GLOBAL batch this host process must load.

    Each host feeds only its own rows (the DistributedSampler contract,
    hifi-gan/train.py:91, without any sampler object): global batch G over P
    processes -> process i loads rows [i*G/P, (i+1)*G/P)."""
    p = jax.process_count()
    i = jax.process_index()
    assert global_batch % p == 0, (
        f"global batch {global_batch} must divide by process count {p}")
    per = global_batch // p
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(mesh, local_batch: Any, global_batch_size: int) -> Any:
    """Assemble global sharded arrays from each host's local batch shard.

    `local_batch`: pytree of numpy arrays whose leading axis is this
    process's slice of the global batch (see process_batch_slice).
    Single-process this is exactly `shard_batch` (device_put with a 'dp'
    NamedSharding); multi-host it uses
    jax.make_array_from_process_local_data so no host ever materializes the
    full global batch.

    Multi-host, the non-batch dims are reconciled first: each collate buckets
    its OWN max sequence length, so hosts would otherwise disagree on the
    global shape (different compiled programs -> SPMD mismatch/hang). Every
    leaf is padded up to the cross-process max of each trailing dim with the
    training pad value for its key (mask False / mel -15 / codes 501 — the
    same semantics stack_microbatches uses)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from covomix_tpu.data.datasets import _STACK_PAD

        leaves, treedef = jax.tree_util.tree_flatten(local_batch)
        keys = sorted(local_batch.keys()) if isinstance(local_batch, dict) else None  # tree_flatten order
        shapes = np.array([list(np.shape(l)[1:]) + [0] * (4 - len(np.shape(l)[1:]))
                           for l in leaves], np.int64)
        gmax = np.max(np.asarray(multihost_utils.process_allgather(shapes)), axis=0)
        padded = []
        for li, leaf in enumerate(leaves):
            leaf = np.asarray(leaf)
            tgt = tuple(int(x) for x in gmax[li][: leaf.ndim - 1])
            if tgt != leaf.shape[1:]:
                pad_val = _STACK_PAD.get(keys[li], 0) if keys else 0
                pw = [(0, 0)] + [(0, t - s) for s, t in zip(leaf.shape[1:], tgt)]
                leaf = np.pad(leaf, pw, constant_values=pad_val)
            padded.append(leaf)
        local_batch = jax.tree_util.tree_unflatten(treedef, padded)

    def put(leaf):
        leaf = np.asarray(leaf)
        nd = leaf.ndim
        spec = P(*(["dp"] + [None] * (nd - 1))) if nd else P()
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(leaf, sharding)
        # 0-d leaves are replicated, not batch-sharded
        global_shape = ((global_batch_size,) + leaf.shape[1:]) if nd else ()
        return jax.make_array_from_process_local_data(sharding, leaf, global_shape)

    return jax.tree_util.tree_map(put, local_batch)


class ProcessShardDataset:
    """Rank-strided dataset view: process i of P sees items i, i+P, i+2P, ...
    (the DistributedSampler contract, hifi-gan/train.py:91). Degenerate for a
    single process (index 0 of 1 == identity)."""

    def __init__(self, dataset, index: Optional[int] = None, count: Optional[int] = None):
        self.dataset = dataset
        self.index = jax.process_index() if index is None else index
        self.count = jax.process_count() if count is None else count

    def __len__(self) -> int:
        # FLOOR for every rank (drop the remainder like DistributedSampler
        # drop_last): a rank-dependent length would desync steps_per_epoch /
        # total_steps / the LR schedule across processes — one process would
        # exit the loop while the rest block in the next step's collectives
        return len(self.dataset) // self.count

    def __getitem__(self, i: int):
        return self.dataset[i * self.count + self.index]


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs (rank-0
    convention, conditional on jax.process_index)."""
    return jax.process_index() == 0
