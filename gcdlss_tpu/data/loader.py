"""Prefetching host data loaders (thread pool + process pool).

Replaces torch `DataLoader(num_workers=8)` (`/root/reference/main.py:27`)
with pipelines that overlap scan reading/augmentation/voxelization with the
device step (SURVEY §7.4). Batches are collated into fixed-capacity numpy
buffers ready for direct `jax.device_put`.

Two backends:
  * `PrefetchLoader` — thread pool. Zero-copy handoff; scales as far as the
    numpy-releases-the-GIL fraction of the per-scan work allows.
  * `MultiprocessLoader` — worker processes, one dataset copy each, like
    the torch DataLoader. Sidesteps the GIL entirely at the cost of
    pickling each ScanSample (~2 MB/scan) through a pipe; use when per-scan
    Python time (label decode, aug bookkeeping) dominates. Workers never
    touch JAX. Default start method is "spawn": the parent holds JAX/XLA
    worker threads, and forking a multithreaded process is a latent
    deadlock (CPython emits DeprecationWarning for exactly this); the
    spawn cost is one dataset unpickle per worker per epoch, measured in
    BENCH.md's loader section. Pass mp_context="fork" to compare.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from .collation import collate_batch

# worker-global dataset: initialized once per worker process (fork inherits
# the parent copy; spawn unpickles it once), so per-item tasks ship only an
# integer index instead of re-pickling the dataset per call
_WORKER_DS = None


def _mp_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _mp_get(i: int):
    return _WORKER_DS[int(i)]


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        voxel_cap: int,
        point_cap: int | None = None,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.voxel_cap = voxel_cap
        self.point_cap = point_cap
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(collate_batch(samples, self.voxel_cap, self.point_cap))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class MultiprocessLoader:
    """Process-pool variant of `PrefetchLoader` (same iteration protocol).

    Each `__iter__` starts `num_workers` processes (spawned by default, see
    module docstring) holding the dataset; per-scan seeds stay deterministic
    because every __getitem__ draws from the dataset's own rng state in its
    worker copy — NOTE: unlike threads, worker rng streams diverge from the
    serial order, so epoch contents are deterministic only per (worker
    count, seed) pair, same as the torch DataLoader this mirrors
    (`/root/reference/main.py:27`)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        voxel_cap: int,
        point_cap: int | None = None,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
        mp_context: str = "spawn",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.voxel_cap = voxel_cap
        self.point_cap = point_cap
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.mp_context = mp_context

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            ctx = mp.get_context(self.mp_context)
            # Workers never touch JAX — but some rigs' sitecustomize
            # force-registers a remote-TPU PJRT plugin (importing all of
            # jax and dialing the TPU tunnel) in EVERY python process when
            # PALLAS_AXON_POOL_IPS is set. Strip the trigger while the pool
            # is alive (spawned workers inherit the parent env at their
            # lazy spawn time) so worker boot is numpy-only: ~0.6 s import
            # instead of ~4.6 s of jax + a TPU-session dial per worker.
            # The var is only read at interpreter startup, so the parent is
            # unaffected; restored when the epoch's pool shuts down.
            saved_trigger = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            try:
                with ProcessPoolExecutor(
                    self.num_workers, mp_context=ctx,
                    initializer=_mp_init, initargs=(self.dataset,),
                ) as pool:
                    # keep ~2 batches in flight per worker: map() with a
                    # small chunksize pipelines sample production across
                    # batches
                    futs = []
                    for idxs in batches:
                        futs.append([pool.submit(_mp_get, i) for i in idxs])
                        # bound the submission window so cancellation works
                        while len(futs) > self.prefetch + 2:
                            if stop.is_set():
                                for fb in futs:
                                    for f in fb:
                                        f.cancel()
                                return
                            samples = [f.result() for f in futs.pop(0)]
                            q.put(collate_batch(samples, self.voxel_cap,
                                                self.point_cap))
                    for fb in futs:
                        if stop.is_set():
                            return
                        samples = [f.result() for f in fb]
                        q.put(collate_batch(samples, self.voxel_cap,
                                            self.point_cap))
            finally:
                if saved_trigger is not None:
                    os.environ["PALLAS_AXON_POOL_IPS"] = saved_trigger
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def make_loader(dataset, batch_size, voxel_cap, *, backend: str = "thread",
                **kw):
    """Loader factory: backend 'thread' (PrefetchLoader) or 'process'."""
    cls = MultiprocessLoader if backend == "process" else PrefetchLoader
    return cls(dataset, batch_size, voxel_cap, **kw)


def cycle(loader):
    while True:
        yield from loader
