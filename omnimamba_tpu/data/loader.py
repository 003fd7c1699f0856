"""Host-side data loading: shuffled batching, background prefetch, and the
dual-task combined loader.

Replaces the reference's torch DataLoader (16 workers/loader,
``trainer.py:62-64,90-99``) + lightning ``CombinedLoader(mode=
"max_size_cycle")`` (``trainer.py:102-111``): the epoch length follows the
*longest* loader while shorter ones cycle. Prefetching runs in a thread pool
(PIL decode releases the GIL); device transfer overlaps with compute since
JAX dispatch is async.
"""

from __future__ import annotations

import queue
from typing import Callable, Dict, Iterator, List

import numpy as np


class DataLoader:
    """Minimal epoch loader: shuffle, batch, collate, drop_last."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator:
        from concurrent.futures import ThreadPoolExecutor

        batches = self._batch_indices()
        self.epoch += 1

        def fetch(b):
            return self.collate_fn([self.dataset[int(i)] for i in b])

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futures: "queue.Queue" = queue.Queue()
            it = iter(batches)
            # prime the pipeline
            for _ in range(min(self.prefetch, len(batches))):
                futures.put(pool.submit(fetch, next(it)))
            while not futures.empty():
                fut = futures.get()
                try:
                    futures.put(pool.submit(fetch, next(it)))
                except StopIteration:
                    pass
                yield fut.result()


class CombinedLoader:
    """max_size_cycle over named loaders (lightning semantics used at
    trainer.py:102-111): iterate the longest; cycle the shorter ones."""

    def __init__(self, iterables: Dict[str, DataLoader]):
        self.iterables = {k: v for k, v in iterables.items() if v is not None}
        assert self.iterables

    def __len__(self) -> int:
        return max(len(v) for v in self.iterables.values())

    def __iter__(self):
        iters = {k: iter(v) for k, v in self.iterables.items()}
        for _ in range(len(self)):
            batch = {}
            for k, v in self.iterables.items():
                try:
                    batch[k] = next(iters[k])
                except StopIteration:
                    iters[k] = iter(v)
                    batch[k] = next(iters[k])
            yield batch
