"""Batched, prefetching data loader.

Replaces torch DataLoader (reference src/data.py:291-299): shuffle on train,
drop_last=True on BOTH train and val (Appendix-B quirk preserved for metric
parity), per-worker seeding, background prefetch.

Worker model: ``worker_type="process"`` decodes samples in worker PROCESSES
(like the reference's nworkers=10 torch workers) — PIL/cv2 decode of 6
camera JPEGs per sample serializes under the GIL in thread mode, which
becomes the input wall on real nu-A2D data. Thread mode stays the default
for tests/synthetic data (no fork cost, trivially picklable everything).

TPU notes: the loader yields host numpy batches; `prefetch_to_device` overlaps
H2D transfer with compute. For multi-host meshes each host constructs a loader
over its own shard of indices (`host_shard`).
"""
from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

# Per-worker-process dataset (set once by the pool initializer so tasks ship
# only an integer index, not the dataset).
_WORKER_DS = None


def _worker_init(dataset, seed_base: int, counter):
    global _WORKER_DS
    _WORKER_DS = dataset
    # reference parity: worker_init_fn seeds numpy with `13 + worker_id`
    # (data.py:273-274). The worker ordinal comes from a shared counter — a
    # PID-derived seed (pre-r5) was non-reproducible across runs.
    with counter.get_lock():
        worker_id = counter.value
        counter.value += 1
    np.random.seed(seed_base + worker_id)


def _worker_get(i: int):
    return _WORKER_DS[i]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 13,
        host_shard: tuple = (0, 1),  # (host_index, host_count)
        prefetch: int = 2,
        worker_type: str = "thread",  # 'thread' | 'process'
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.host_index, self.host_count = host_shard
        self.prefetch = prefetch
        assert worker_type in ("thread", "process")
        self.worker_type = worker_type
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.host_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        # contiguous per-host shard
        per = n // self.host_count
        return idx[self.host_index * per : (self.host_index + 1) * per]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        if self.worker_type == "process":
            # NEVER fork: by loader time the parent is a multithreaded JAX
            # process and fork()ing it is a latent deadlock (os.fork warns).
            # forkserver forks workers from a clean single-threaded server
            # (cheap per-epoch restart); spawn is the portable fallback.
            # Datasets stay picklable and jax-free at import time by design.
            try:
                ctx = multiprocessing.get_context("forkserver")
            except ValueError:
                ctx = multiprocessing.get_context("spawn")
            pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=ctx,
                initializer=_worker_init,
                initargs=(self.dataset, self.seed, ctx.Value("i", 0)),
            )
            submit = lambda i: pool.submit(_worker_get, i)  # noqa: E731
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            submit = lambda i: pool.submit(self.dataset.__getitem__, i)  # noqa: E731

        def collate(items):
            return {
                k: np.stack([it[k] for it in items]) for k in items[0].keys()
            }

        def produce():
            try:
                futures = []
                for b in range(nb):
                    chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    futures.append([submit(int(i)) for i in chunk])
                for fs in futures:
                    out_q.put(collate([f.result() for f in fs]))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Move batches to device(s) ahead of compute. With a mesh, shards the
    batch dim across it."""
    import collections

    import jax

    from ..parallel.mesh import shard_batch

    buf = collections.deque()

    def put(b):
        if mesh is not None:
            return shard_batch(mesh, b)
        return jax.device_put(b)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
