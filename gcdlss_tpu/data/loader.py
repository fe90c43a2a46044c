"""Prefetching host data loader.

Replaces torch `DataLoader(num_workers=8)` with a thread-pool pipeline that
overlaps scan reading/augmentation/voxelization with the device step
(SURVEY §7.4). Batches are collated into fixed-capacity numpy buffers ready
for direct `jax.device_put`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .collation import collate_batch


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


def cycle(loader):
    while True:
        yield from loader
