"""Multi-host wiring (parallel/multihost.py): single-process degenerate
behavior + the rank-strided data-feeding contract.

The rig has one host, so these tests assert exactly what fairseq's
gloo-spawn tests assert without a cluster (SURVEY §4): the initialization
surface resolves correctly, the per-process data slicing is the
DistributedSampler contract, and the degenerate (P=1) path is bit-identical
to the single-host path. Ref: fairseq/distributed/utils.py:96-156, :273-300."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.parallel import multihost as MH
from covomix_tpu.parallel.mesh import make_mesh
from covomix_tpu.parallel.train_step import shard_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_single_process_noop():
    env_backup = {k: os.environ.pop(k) for k in ("SLURM_NTASKS",) if k in os.environ}
    try:
        assert MH.initialize() is False          # nothing to rendezvous with
        assert jax.process_count() == 1
        assert MH.is_primary()
    finally:
        os.environ.update(env_backup)


def test_initialize_requested_degrades_gracefully():
    """--multihost on a single host with no cluster env: the auto-detect
    attempt must not crash; it degrades to single-host and returns False.
    (The already-initialized check must read jax.distributed, NOT
    jax.process_count(), whose jax.devices() call would initialize a
    single-host backend and poison a real rendezvous.)"""
    env_backup = {k: os.environ.pop(k) for k in ("SLURM_NTASKS",) if k in os.environ}
    try:
        assert MH.initialize(requested=True) in (False, True)  # no raise
        assert jax.process_count() == 1
        assert MH.is_primary()
    finally:
        os.environ.update(env_backup)


def test_process_batch_slice_degenerate():
    s = MH.process_batch_slice(8)
    assert (s.start, s.stop) == (0, 8)


def test_process_shard_dataset_strides():
    data = list(range(10))
    # explicit 3-way split (simulating 3 hosts on one). Lengths FLOOR on every
    # rank (DistributedSampler drop_last semantics): a rank-dependent length
    # would desync steps_per_epoch / the LR schedule across processes.
    shards = [MH.ProcessShardDataset(data, index=i, count=3) for i in range(3)]
    assert [len(s) for s in shards] == [3, 3, 3]
    seen = sorted(x for s in shards for x in (s[i] for i in range(len(s))))
    assert seen == sorted(set(range(9)))          # disjoint; remainder dropped
    # degenerate: identity
    one = MH.ProcessShardDataset(data)
    assert len(one) == 10 and [one[i] for i in range(10)] == data


def test_global_batch_from_local_degenerate_equals_shard_batch():
    mesh = make_mesh(dp=jax.device_count(), tp=1)
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "ids": np.arange(8, dtype=np.int32)}
    a = MH.global_batch_from_local(mesh, batch, 8)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_two_process_rendezvous_train_step(tmp_path):
    """REAL 2-process rendezvous on one host (VERDICT r3 item 4): two CPU
    subprocesses meet at a live coordinator through multihost.initialize,
    build the GLOBAL 4-device mesh (2 local devices each), assemble a global
    batch from per-process shards — including cross-process trailing-dim
    reconciliation (rank 0 collates aux width 6, rank 1 width 4; both must
    land on the global max 6) — and run two sharded Adam steps whose losses
    must equal the single-process run bit-for-near-bit. This upgrades the
    §2.6 comm-backend claim from shape arithmetic to running collectives
    (the fairseq analogue: tests/distributed/utils.py:13-40 spawn_and_init)."""
    import socket

    child = os.path.join(REPO, "tests", "_mh_child.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    out = str(tmp_path / "mh")

    procs = [subprocess.Popen([sys.executable, child, coord, str(i), "2", out],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env) for i in range(2)]
    try:
        captured = [p.communicate(timeout=900) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, captured):
        assert p.returncode == 0, f"rc={p.returncode}\nstdout:{so[-2000:]}\nstderr:{se[-2000:]}"

    # single-process reference: same seed/model/data, same local device count
    r = subprocess.run([sys.executable, child, "unused", "0", "1", out + "_ref"],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    res = [json.load(open(f"{out}.{i}.json")) for i in range(2)]
    ref = json.load(open(out + "_ref.0.json"))
    for ri in res:
        assert ri["process_count"] == 2 and ri["global_devices"] == 4
        assert ri["local_devices"] == 2
        assert ri["aux_cols"] == 6          # padded up to the cross-process max
    # both processes observe the same replicated loss, and the multi-process
    # collectives reproduce the single-process math
    np.testing.assert_allclose(res[0]["losses"], res[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(res[0]["losses"], ref["losses"], rtol=1e-5, atol=1e-7)
    assert res[0]["losses"][1] < res[0]["losses"][0]   # the step actually optimizes


def test_train_cli_multihost_flag_degenerate(tmp_path):
    """--multihost on one process must behave exactly like a normal run
    (initialize no-ops, the process slice is the whole batch)."""
    rng = np.random.RandomState(2)
    data = tmp_path / "data"
    (data / "train").mkdir(parents=True)
    for i in range(4):
        t = 40 + 8 * i
        np.save(str(data / "train" / f"u{i}.mel.npy"), rng.randn(80, t).astype(np.float32))
        np.save(str(data / "train" / f"u{i}.hubert_code.npy"),
                rng.randint(0, 500, size=t).astype(str))
    logs = tmp_path / "logs"
    env = dict(os.environ, COVOMIX_FORCE_CPU="1")
    r = subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                        "--base_dir", str(data), "--format", "hubert_fisher",
                        "--log_dir", str(logs), "--run_name", "mh",
                        "--max_steps", "2", "--batch_size", "2", "--multihost",
                        "--CoVoMix_dim_transformer", "32", "--CoVoMix_depth", "2",
                        "--CoVoMix_heads", "2", "--CoVoMix_dim_head", "16",
                        "--ckpt_every", "2", "--eval_every", "1000", "--dp", "1",
                        "--log_every", "1"],
                       capture_output=True, text=True, timeout=1500, env=env,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2500:]
    lines = [json.loads(l) for l in open(logs / "mh" / "metrics.jsonl") if l.strip()]
    assert any("loss" in json.dumps(l) for l in lines)
