"""Prefetching data loader: threaded sample fetch + batch assembly.

The reference delegates to torch DataLoader workers (configs set
``dataloader_num_workers``); here a thread pool decodes/tokenises samples
and assembles static batches ahead of the training step so host
preprocessing overlaps device compute.  Includes the reference's sampler
semantics: epoch-seeded shuffling (mmengine DefaultSampler +
DistSamplerSeedHook) and per-process sharding for multi-host data
parallelism.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator, Sequence


class EpochSampler:
    """Epoch-seeded shuffling with optional per-process sharding.

    Mirrors mmengine DefaultSampler(shuffle=True) + DistSamplerSeedHook:
    the permutation depends only on (seed, epoch), so every process draws
    the same order and takes its own stride slice.
    """

    def __init__(self, n: int, seed: int = 0, shuffle: bool = True,
                 num_shards: int = 1, shard_id: int = 0):
        self.n = n
        self.seed = seed
        self.shuffle = shuffle
        self.num_shards = num_shards
        self.shard_id = shard_id

    def epoch(self, epoch: int) -> list[int]:
        order = list(range(self.n))
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(order)
        return order[self.shard_id::self.num_shards]


class PrefetchLoader:
    """Iterate batches assembled by a worker pool.

    Args:
      sample_fn: ``index -> sample dict`` (dataset __getitem__ equivalent;
        must be thread-safe -- the readers here only do numpy/PIL work).
      collate_fn: ``list[sample] -> batch``.
      sampler: EpochSampler.
      batch_size: samples per batch (drops the trailing partial batch,
        matching the reference's DataLoader(drop_last) training setup).
      num_workers: sample-fetch threads.
      prefetch: max ready batches queued ahead.
    """

    def __init__(self, sample_fn: Callable, collate_fn: Callable,
                 sampler: EpochSampler, batch_size: int,
                 num_workers: int = 4, prefetch: int = 2):
        self.sample_fn = sample_fn
        self.collate_fn = collate_fn
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def epoch(self, epoch: int) -> Iterator:
        indices = self.sampler.epoch(epoch)
        n_batches = len(indices) // self.batch_size
        if n_batches == 0:
            return
        batches = [
            indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        job_q: queue.Queue = queue.Queue()
        for bi, idxs in enumerate(batches):
            job_q.put((bi, idxs))
        results: dict = {}
        lock = threading.Lock()
        next_emit = [0]
        error: list = []

        def worker():
            while True:
                try:
                    bi, idxs = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [self.sample_fn(i) for i in idxs]
                    batch = self.collate_fn(samples)
                except Exception as e:  # propagate to the consumer
                    error.append(e)
                    out_q.put(None)
                    return
                # emit in order
                with lock:
                    results[bi] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        emitted = 0
        while emitted < n_batches:
            batch = out_q.get()
            if batch is None:
                raise error[0]
            yield batch
            emitted += 1
        for t in threads:
            t.join()

    def __call__(self, epochs: int) -> Iterator:
        for e in range(epochs):
            yield from self.epoch(e)
