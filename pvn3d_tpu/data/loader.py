"""Multiprocess batched data loading.

Replaces the reference's torch DataLoader with 60 worker processes
(train_ycb_pvn3d.py:425-438) with a small process-pool pipeline that
prefetches collated numpy batches; the jitted step consumes them via
``jax.device_put`` (or ``make_array_from_process_local_data`` multi-host).
"""
from __future__ import annotations

import multiprocessing as mp
from typing import Iterator, Optional

import numpy as np

from pvn3d_tpu.data.frame import collate

_WORKER_DS = None


def _init_worker(dataset_factory, seed):
    global _WORKER_DS
    _WORKER_DS = dataset_factory()
    # Decorrelate augmentation streams across workers.
    ident = mp.current_process()._identity
    wid = ident[0] if ident else 0
    _WORKER_DS.rng = np.random.RandomState(seed + wid)


def _fetch(idx):
    return _WORKER_DS[idx]


class DataLoader:
    """Iterate collated batch dicts from an index-able dataset.

    ``dataset_factory`` must be picklable (a top-level function or partial)
    so each worker can build its own dataset instance.  With
    ``num_workers=0`` everything runs inline (tests, debugging).
    """

    def __init__(self, dataset_factory, batch_size: int,
                 num_workers: int = 0, seed: int = 0,
                 steps: Optional[int] = None, shuffle: bool = False,
                 chunksize: int = 1, pad_last: bool = True):
        self.factory = dataset_factory
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.seed = seed
        self.steps = steps
        self.shuffle = shuffle
        self.chunksize = chunksize
        # Epoch mode (steps=None): the final n % batch_size samples are
        # padded by repeating the last sample to keep one jitted batch
        # shape; the batch carries "_n_valid" (a plain int) so consumers
        # score only the real frames.  pad_last=False drops them instead
        # (the old behavior).  Training mode never produces a partial
        # batch (the ticket stream is steps * batch_size long).
        self.pad_last = pad_last

    def _indices(self, n: int) -> Iterator[int]:
        if self.steps is not None:
            # Training stream: the index is only a ticket — train-mode
            # datasets sample their own item per call (the reference's
            # real/syn generators, ycb_dataset.py:64-73), so a plain
            # cycling counter is handed out, not a second RNG stream.
            for i in range(self.steps * self.batch_size):
                yield i % n
        else:
            order = np.arange(n)
            if self.shuffle:
                np.random.RandomState(self.seed).shuffle(order)
            yield from order.tolist()

    def __iter__(self):
        ds = self.factory()
        n = len(ds)
        idx_stream = self._indices(n)
        if self.num_workers <= 0:
            sample_stream = (ds[i] for i in idx_stream)
        else:
            # spawn: forking a thread-heavy (jax) parent can deadlock.
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(self.num_workers, _init_worker,
                                  (self.factory, self.seed))
            sample_stream = self._pool.imap(
                _fetch, idx_stream, chunksize=self.chunksize)
        try:
            batch = []
            for sample in sample_stream:
                if sample is None:
                    continue
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield collate(batch)
                    batch = []
            if batch and self.steps is None and self.pad_last:
                n_valid = len(batch)
                batch += [batch[-1]] * (self.batch_size - n_valid)
                out = collate(batch)
                out["_n_valid"] = n_valid
                yield out
        finally:
            # Consumers may break out early (--max_frames, demo
            # --n_frames): terminate instead of close so imap stops
            # feeding workers the rest of the index stream.
            if self.num_workers > 0:
                self._pool.terminate()
                self._pool.join()


def prefetch_to_device(iterator, put, size: int = 2):
    """Double-buffered device prefetch: keep ``size`` batches in flight so
    H2D transfer overlaps with the running step (the reference relies on
    torch DataLoader pinned-memory prefetch; train_ycb_pvn3d.py:425-438).

    ``put`` maps a host batch to device arrays (e.g. mesh shard_batch).
    """
    import collections
    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
