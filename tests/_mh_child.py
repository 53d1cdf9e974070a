"""Two-process multi-host rendezvous child (tests/test_multihost.py).

Usage: python _mh_child.py <coordinator host:port> <process_id> <num_processes> <out>

Forces the CPU backend (jax.config override — the JAX_PLATFORMS env var is
ignored by this jax build, CLAUDE.md), rendezvouses through
covomix_tpu.parallel.multihost.initialize (the explicit-coordinator path,
mirroring fairseq's tcp:// init method, fairseq/distributed/utils.py:96-156),
assembles a GLOBAL batch from per-process shards — including the
cross-process trailing-dim reconciliation (each process pads its 'aux' leaf
to the global max) — and runs two sharded Adam train steps on a
deterministic toy regression. Writes `<out>.<process_index>.json` with the
losses so the parent can assert multi-process == single-process math.

With num_processes == 1 this is the single-process reference run: no
rendezvous, same seed/model/data, mesh over the local devices.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    coord, pid, nprocs, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

    from covomix_tpu.parallel import multihost as MH
    from covomix_tpu.parallel.mesh import make_mesh
    from covomix_tpu.parallel.train_step import init_sharded_state, make_sharded_train_step
    from covomix_tpu.train.loop import TrainConfig

    if nprocs > 1:
        assert MH.initialize(coordinator_address=coord, num_processes=nprocs,
                             process_id=pid)
        assert jax.process_count() == nprocs, jax.process_count()
        assert MH.is_primary() == (pid == 0)

    mesh = make_mesh(dp=jax.device_count(), tp=1)

    # deterministic toy regression; every process derives the same GLOBAL
    # data from the shared seed, then loads only its own slice
    rng = np.random.RandomState(0)
    G = 8
    x = rng.randn(G, 16).astype(np.float32)
    w_true = rng.randn(16, 4).astype(np.float32)
    y = (x @ w_true + 0.01 * rng.randn(G, 4)).astype(np.float32)

    sl = MH.process_batch_slice(G)
    rows = sl.stop - sl.start
    # 'aux' trailing dim differs per process (6 on rank 0, 4 on rank 1):
    # exercises global_batch_from_local's cross-process shape reconciliation
    # (collates bucket their OWN max length; hosts must agree on the global
    # shape or SPMD hangs). Unused by the loss.
    aux_cols = 6 - 2 * (jax.process_index() % 2)
    local = {"x": x[sl], "y": y[sl],
             "aux": np.ones((rows, aux_cols), np.float32)}
    batch = MH.global_batch_from_local(mesh, local, G)
    assert batch["x"].shape == (G, 16), batch["x"].shape

    params = {"lin": {"w": (0.1 * rng.randn(16, 4)).astype(np.float32),
                      "b": np.zeros((4,), np.float32)}}

    def loss_fn(p, b, key):
        pred = b["x"] @ p["lin"]["w"] + p["lin"]["b"]
        return jnp.mean((pred - b["y"]) ** 2)

    cfg = TrainConfig(lr=1e-2)
    state, p_shard = init_sharded_state(params, cfg, mesh, tp=False)
    step = make_sharded_train_step(loss_fn, cfg, mesh, p_shard)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, key)
        # loss/grad_norm are fully replicated -> addressable on every process
        losses.append(float(jax.device_get(metrics["loss"])))

    with open(f"{out}.{jax.process_index()}.json", "w") as f:
        json.dump({"process_count": jax.process_count(),
                   "global_devices": jax.device_count(),
                   "local_devices": len(jax.local_devices()),
                   "aux_cols": int(batch["aux"].shape[1]),
                   "losses": losses}, f)


if __name__ == "__main__":
    main()
