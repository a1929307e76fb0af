"""Batch iteration: shuffling, per-process sharding, view-count sampling.

TPU-native replacement for the reference's torch samplers
(lib/datasets/samplers.py):
* categorical input-view-count resampling per batch (``EnerfBatchSampler``
  :9-35)
* fixed-iteration epochs (``IterationBasedBatchSampler`` :78-100)
* per-process index sharding with epoch-seeded shuffle
  (``DistributedSampler`` :103-159) — keyed on jax.process_index().

Host-side numpy RNG drives every data decision (ray pixels, view counts,
view jitter) so model computation stays deterministic.
"""

from __future__ import annotations

import threading
import queue as queue_mod

import numpy as np

from boostmvsnerfs_tpu.data.base import collate


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        ep_iter: int = -1,
        input_views_num=None,
        input_views_prob=None,
        num_processes: int = 1,
        process_index: int = 0,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.ep_iter = ep_iter
        self.input_views_num = input_views_num
        self.input_views_prob = input_views_prob
        self.num_processes = num_processes
        self.process_index = process_index
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        # pad so every process sees the same count (reference samplers.py:131-137)
        per = int(np.ceil(n / self.num_processes))
        pad = per * self.num_processes - n
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.process_index::self.num_processes]

    def __len__(self):
        if self.ep_iter > 0:
            return self.ep_iter
        return len(self._indices()) // self.batch_size

    def _batch_indices(self):
        idx = self._indices()
        nb = len(idx) // self.batch_size
        batches = [
            idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)
        ]
        if self.ep_iter > 0:
            # wrap around to exactly ep_iter batches (reference samplers.py:78-100)
            out = []
            k = 0
            while len(out) < self.ep_iter:
                if k >= len(batches):
                    k = 0
                    self.epoch += 1  # reshuffle for wrap
                    idx = self._indices()
                    batches = [
                        idx[i * self.batch_size:(i + 1) * self.batch_size]
                        for i in range(len(idx) // self.batch_size)
                    ]
                    if not batches:
                        break
                out.append(batches[k])
                k += 1
            batches = out
        return batches

    def __iter__(self):
        rng = np.random.default_rng(self.seed * 7919 + self.epoch)
        batches = self._batch_indices()

        def produce(q):
            for b in batches:
                if self.input_views_num is not None:
                    vn = int(
                        rng.choice(self.input_views_num, p=self.input_views_prob)
                    )
                else:
                    vn = None
                samples = [
                    self.dataset.get_sample(int(i), vn, rng) for i in b
                ]
                q.put(collate(samples))
            q.put(None)

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
