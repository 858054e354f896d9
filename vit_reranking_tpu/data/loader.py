"""Threaded host-side batch loader.

Replaces torch DataLoader worker processes: image decode + augmentation run in
a thread pool while the TPU computes, and batches come out as stacked numpy
arrays ready for ``device_put`` (optionally pre-sharded over the data mesh
axis by the engine)."""

from __future__ import annotations

import concurrent.futures as cf
import itertools
from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np


class DataLoader:
    """Iterates (labels, images, indices) batches.

    Args:
      dataset: object with __getitem__ -> (label, image, idx) and __len__.
      batch_sampler: yields lists of indices (one batch each); mutually
        exclusive with batch_size/shuffle.
      prefetch: number of batches assembled ahead of the consumer.
    """

    def __init__(
        self,
        dataset,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        batch_sampler=None,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        host_id: int = 0,
        n_hosts: int = 1,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        # per-host sharding for multi-host pods (SURVEY 2.10: per-host data
        # loading): host h consumes every n_hosts-th batch of the shared,
        # seed-deterministic batch stream
        self.host_id = host_id
        self.n_hosts = max(1, n_hosts)

    def _index_batches(self) -> Iterator[List[int]]:
        if self.batch_sampler is not None:
            for bi, batch in enumerate(self.batch_sampler):
                if bi % self.n_hosts == self.host_id:
                    yield batch
            return
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for bi, s in enumerate(range(0, len(order), bs)):
            chunk = order[s : s + bs]
            if self.drop_last and len(chunk) < bs:
                return
            if bi % self.n_hosts == self.host_id:
                yield list(chunk)

    def iter_index_batches(self) -> Iterator[List[int]]:
        """Index-batch stream without image loading — the device-cache input
        pipeline (data/device_cache.py) consumes only (indices, labels) per
        step; images live in HBM."""
        return self._index_batches()

    def __len__(self):
        if self.batch_sampler is not None:
            total = len(self.batch_sampler)
        else:
            n = len(self.dataset)
            total = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        # batches this host consumes
        return (total - self.host_id + self.n_hosts - 1) // self.n_hosts

    def __iter__(self):
        def fetch(batch_idx):
            items = [self.dataset[i] for i in batch_idx]
            labels = np.asarray([it[0] for it in items], np.int32)
            images = np.stack([it[1] for it in items]).astype(np.float32)
            idxs = np.asarray([it[2] for it in items], np.int32)
            return labels, images, idxs

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = self._index_batches()
            for batch_idx in itertools.islice(it, self.prefetch):
                pending.append(pool.submit(fetch, batch_idx))
            for batch_idx in it:
                done = pending.pop(0)
                pending.append(pool.submit(fetch, batch_idx))
                yield done.result()
            for fut in pending:
                yield fut.result()


def build_dataset(opt, model=None):
    """Contract of the missing reference API ``datasets.build_dataset(opt,
    model) -> (dataloaders, train_data_sampler)`` (train_baseline.py:92)."""
    from . import datasets as ds
    from . import samplers as dsamplers

    splits = ds.select(opt.dataset, opt)
    train = splits["training"]
    opt.n_classes = len(train.avail_classes)

    sampler = dsamplers.select(
        getattr(opt, "data_sampler", "class_random"), opt,
        train.image_dict, train.image_list,
    )
    loaders = {
        "training": DataLoader(train, batch_sampler=sampler, num_workers=opt.kernels),
        "testing": DataLoader(
            splits["testing"], batch_size=opt.bs, shuffle=False, num_workers=opt.kernels
        ),
        "evaluation": DataLoader(
            splits["evaluation"], batch_size=opt.bs, shuffle=False, num_workers=opt.kernels
        ),
    }
    return loaders, sampler
