"""Host-side input prefetching: overlap wav IO / numpy collate with device steps.

The reference feeds its trainers with torch DataLoader(num_workers=N)
(covomix/data_module.py:813-818; hifi-gan/train.py:86-97 + DistributedSampler).
On a 1-core host feeding a TPU, the equivalent is thread-based prefetch: disk
IO and numpy padding release the GIL, so producer threads fill a bounded queue
while the jitted step runs on device. Optionally each batch is `device_put`
(with a NamedSharding for dp meshes) from the producer thread, so the host->HBM
transfer also overlaps compute (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import numpy as np


class _Stop:
    pass


_STOP = _Stop()


class PrefetchIterator:
    """Wrap an iterator with one producer thread and a bounded buffer.

    Preserves order. `transfer` (e.g. a device_put closure) runs in the
    producer thread so transfers overlap consumer compute."""

    def __init__(self, it: Iterator, buffer_size: int = 2, transfer: Optional[Callable[[Any], Any]] = None):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, buffer_size))
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None

        def produce():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    if transfer is not None:
                        item = transfer(item)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                try:
                    self._q.put(_STOP, timeout=5)
                except queue.Full:
                    pass

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, _Stop):
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


class PrefetchSampler:
    """N worker threads each repeatedly call `make_batch(worker_seed)` into a
    bounded queue — the random-sampling analogue of DataLoader(num_workers=N)
    for datasets drawn i.i.d. per step (hifi-gan MelDataset with shuffle).

    Batch order is nondeterministic across workers (like a multi-worker torch
    DataLoader); per-worker RNG seeds keep each worker's stream reproducible."""

    def __init__(
        self,
        make_batch: Callable[[int], Any],
        num_workers: int = 1,
        buffer_size: int = 2,
        transfer: Optional[Callable[[Any], Any]] = None,
        seed: int = 0,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, buffer_size))
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._threads = []

        def work(worker_id: int):
            n = 0
            try:
                while not self._stop.is_set():
                    # collision-free per-(worker, n) seed stream: a linear
                    # combination like seed*K1 + worker*K2 + n overlaps across
                    # workers once n >= K2, silently replaying another
                    # worker's batches; SeedSequence hashes the tuple
                    batch = make_batch(int(np.random.SeedSequence(
                        (seed, worker_id, n)).generate_state(1)[0]))
                    n += 1
                    if transfer is not None:
                        batch = transfer(batch)
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:
                self._err = e
                self._stop.set()

        for w in range(max(1, num_workers)):
            t = threading.Thread(target=work, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=1.0)
                return item
            except queue.Empty:
                if self._err is not None:
                    raise self._err
                if self._stop.is_set():
                    raise StopIteration

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def device_put_transfer(sharding=None):
    """Returns a transfer fn moving every array leaf to device (optionally with
    a NamedSharding tree or single sharding applied to all leaves)."""
    import jax

    def transfer(batch):
        if sharding is None:
            return jax.device_put(batch)
        if isinstance(sharding, dict) or hasattr(sharding, "keys"):
            return jax.tree_util.tree_map(jax.device_put, batch, sharding)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    return transfer
