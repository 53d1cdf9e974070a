"""Prefetch loaders: ordering, error propagation, shutdown."""

import time

import numpy as np
import pytest

from covomix_tpu.data.prefetch import PrefetchIterator, PrefetchSampler


def test_iterator_preserves_order_and_stops():
    it = PrefetchIterator(iter(range(50)), buffer_size=4)
    assert list(it) == list(range(50))


def test_iterator_transfer_runs_in_producer():
    seen = []
    it = PrefetchIterator(iter([1, 2, 3]), transfer=lambda x: (seen.append(x), x * 10)[1])
    assert list(it) == [10, 20, 30]
    assert seen == [1, 2, 3]


def test_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_sampler_yields_batches_from_workers():
    def make_batch(seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        return {"x": rng.randn(4, 8).astype(np.float32), "seed": seed}

    loader = PrefetchSampler(make_batch, num_workers=2, buffer_size=3, seed=7)
    seeds = set()
    for _ in range(10):
        b = next(loader)
        assert b["x"].shape == (4, 8)
        seeds.add(b["seed"])
    loader.close()
    assert len(seeds) == 10  # per-worker seed streams don't collide


def test_sampler_propagates_errors():
    def bad(seed):
        raise ValueError("nope")

    loader = PrefetchSampler(bad, num_workers=1)
    with pytest.raises(ValueError, match="nope"):
        next(loader)


def test_sampler_overlaps_slow_producer():
    """With 2 workers each taking ~50 ms, 8 batches should take well under
    8*50 ms serial time."""

    def slow(seed):
        time.sleep(0.05)
        return seed

    loader = PrefetchSampler(slow, num_workers=2, buffer_size=2)
    next(loader)  # warm-up
    t0 = time.time()
    for _ in range(8):
        next(loader)
    elapsed = time.time() - t0
    loader.close()
    assert elapsed < 8 * 0.05 * 0.9, elapsed
