"""TopKCheckpointer: save_last + top-K-by-l2 pruning (ref train.py:72-76)."""

import os

import numpy as np

from covomix_tpu.checkpoint.io import TopKCheckpointer, latest_step


def _state(v):
    return {"params": {"w": np.full((2, 2), float(v))}}


def _steps_on_disk(d):
    return sorted(int(x.split("_")[1]) for x in os.listdir(d) if x.startswith("step_"))


def test_rolling_last_prunes_previous(tmp_path):
    d = str(tmp_path / "ck")
    mgr = TopKCheckpointer(d, top_k=2)
    for s in (10, 20, 30):
        mgr.save(_state(s), s)
    assert _steps_on_disk(d) == [30]
    assert latest_step(d) == 30


def test_topk_ranked_kept_and_pruned(tmp_path):
    d = str(tmp_path / "ck")
    mgr = TopKCheckpointer(d, top_k=2, mode="min")
    metrics = {10: 0.5, 20: 0.3, 30: 0.9, 40: 0.2, 50: 0.7}
    for s, m in metrics.items():
        mgr.save(_state(s), s, metric=m)
    # top-2 by l2: steps 40 (0.2) and 20 (0.3); plus last (50)
    assert _steps_on_disk(d) == [20, 40, 50]
    assert mgr.best_step() == 40


def test_unranked_last_survives_alongside_topk(tmp_path):
    d = str(tmp_path / "ck")
    mgr = TopKCheckpointer(d, top_k=1)
    mgr.save(_state(1), 10, metric=0.4)
    mgr.save(_state(2), 20)            # plain last, no metric
    mgr.save(_state(3), 30)            # replaces 20 as last
    assert _steps_on_disk(d) == [10, 30]


def test_index_persists_for_resume(tmp_path):
    d = str(tmp_path / "ck")
    mgr = TopKCheckpointer(d, top_k=2)
    mgr.save(_state(1), 10, metric=0.4)
    mgr.save(_state(2), 20, metric=0.1)
    mgr2 = TopKCheckpointer(d, top_k=2)
    assert mgr2.best_step() == 20
    assert mgr2.last_step == 20
    mgr2.save(_state(3), 30, metric=0.9)
    assert _steps_on_disk(d) == [10, 20, 30]  # 30 kept only as last
    mgr2.save(_state(4), 40, metric=0.05)
    assert 30 not in _steps_on_disk(d)
    assert mgr2.best_step() == 40


def test_latest_step_ignores_stale_orbax_tmp_dirs(tmp_path):
    """An interrupted orbax save leaves 'step_N.orbax-checkpoint-tmp-<ts>'
    behind; auto-resume must skip it instead of crashing on int()."""
    from covomix_tpu.checkpoint import io as cio

    d = tmp_path / "ckpts"
    d.mkdir()
    (d / "step_00000100").mkdir()
    (d / "step_00000200.orbax-checkpoint-tmp-1712345678").mkdir()
    assert cio.latest_step(str(d)) == 100


def test_save_params_normalizes_npz_extension(tmp_path):
    from covomix_tpu.checkpoint import io as cio

    p = {"w": np.ones((3,), np.float32)}
    bare = str(tmp_path / "acoustic")          # no .npz
    cio.save_params(bare, p, meta={"kind": "acoustic"})
    loaded = cio.load_params(bare)             # both spellings work
    np.testing.assert_array_equal(np.asarray(loaded["w"]), p["w"])
    assert cio.load_meta(bare + ".npz")["kind"] == "acoustic"
