"""Batched data loading with background workers and device prefetch.

Replaces the reference's torch DataLoader + DistributedGroupSampler
(mmdet/datasets/samplers/group_sampler.py): per-host shard of a seeded
global permutation, worker-pool decode+preprocess, stacked static-shape
batches, and an N-deep device prefetch queue so host IO overlaps TPU steps.
"""
from __future__ import annotations

import concurrent.futures as cf
import multiprocessing as mp
import os
import queue as queue_mod
import threading
from typing import Iterator, Optional

import numpy as np

from .batch import Batch
from .coco import TaskCocoDataset
from .pipeline import PipelineConfig, load_image, preprocess

# ---- process-worker plumbing (DSKD_PROC_WORKERS=1) -------------------
# The thread pool below parallelizes cv2 (GIL-released) but not the
# numpy half of preprocess; real multi-core scaling needs processes —
# the reference gets this from torch DataLoader worker processes. The
# loader is pickled ONCE per worker via the initializer; children spawn
# (never fork a backend-initialized process) and this module is
# deliberately jax-free so they stay light.
_WORKER_LOADER = {}


def _proc_init(loader):
    _WORKER_LOADER["loader"] = loader


def _proc_load(args):
    idx, seed = args
    return _WORKER_LOADER["loader"]._load_one(idx, seed)


class DataLoader:
    """``aspect_buckets``: optional (bucket_hw_portrait, bucket_hw_landscape)
    pair. When set, samples group by aspect ratio (the reference's
    GroupSampler flag, samplers/group_sampler.py:13-17) and each batch is
    homogeneous in bucket shape — XLA compiles one step per bucket and
    padding waste drops vs a single square canvas."""

    def __init__(self, dataset: TaskCocoDataset, batch_size: int,
                 pipeline: PipelineConfig = None, train: bool = True,
                 seed: int = 0, num_workers: int = 8,
                 num_hosts: int = 1, host_id: int = 0,
                 drop_last: bool = True, aspect_buckets=None,
                 gt_buckets=(), prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pipeline = pipeline or PipelineConfig()
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.aspect_buckets = aspect_buckets
        self.gt_buckets = tuple(sorted(gt_buckets))
        self.prefetch = max(1, prefetch)
        # DSKD_PROC_WORKERS=1 swaps the producer's thread pool for a
        # spawn-based process pool (multi-core preprocess; ~1-2 s
        # per-epoch pool start amortized over real epochs). Default off:
        # one host already feeds ~21 chips through threads (PERF.md).
        self.proc_workers = (os.environ.get("DSKD_PROC_WORKERS", "0")
                             == "1" and num_workers > 1)
        self.epoch = 0
        self._flags = None
        if aspect_buckets is not None:
            # flag 0 = portrait (h >= w), 1 = landscape
            self._flags = np.array(
                [0 if self.dataset.get_raw(i)[1][0] >=
                 self.dataset.get_raw(i)[1][1] else 1
                 for i in range(len(self.dataset))], np.int8)

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

    def _load_raw(self, idx: int):
        path, _, boxes, labels, img_id = self.dataset.get_raw(int(idx))
        return load_image(path), boxes, labels, img_id

    def _load_one(self, idx: int, rng_seed: int):
        img, boxes, labels, img_id = self._load_raw(int(idx))
        rng = np.random.RandomState(rng_seed) if self.train else None
        pipe = self.pipeline
        if self._flags is not None:
            bucket = self.aspect_buckets[self._flags[int(idx)]]
            import dataclasses
            pipe = dataclasses.replace(pipe, bucket=bucket,
                                       img_scale=bucket)
        if self.train and rng is not None and (pipe.mosaic or pipe.mixup):
            from .mix_transforms import mixup, mosaic
            n = len(self.dataset)
            if pipe.mosaic:
                others = [self._load_raw(rng.randint(n))[:3]
                          for _ in range(3)]
                img, boxes, labels = mosaic(
                    [(img, boxes, labels)] + others, pipe.img_scale, rng,
                    center_ratio_range=pipe.mosaic_center_ratio)
            if pipe.mixup:
                r_img, r_boxes, r_labels, _ = self._load_raw(rng.randint(n))
                img, boxes, labels = mixup(
                    img, boxes, labels, r_img, r_boxes, r_labels, rng,
                    dynamic_scale=pipe.img_scale,
                    ratio_range=pipe.mixup_ratio_range)
        segs = sem = None
        if pipe.with_mask or pipe.with_semantic:
            assert not (pipe.mosaic or pipe.mixup or pipe.auto_augment), \
                "with_mask/with_semantic need full geometric transforms"
        if pipe.with_mask:
            segs = self.dataset.get_segmentations(int(idx))
        if pipe.with_semantic:
            sem = self.dataset.get_semantic(int(idx))
        out = preprocess(img, boxes, labels, pipe, rng, self.train,
                         segmentations=segs, semantic=sem)
        out["img_id"] = img_id
        return out

    def __iter__(self) -> Iterator[Batch]:
        indices = self._indices()
        if self._flags is not None:
            # GroupSampler semantics: group by aspect flag, pad each group
            # to a batch multiple, then shuffle whole batches
            flags = self._flags[indices]
            batches = []
            for g in (0, 1):
                gi = indices[flags == g]
                if len(gi) == 0:
                    continue
                if self.train:
                    pad = (-len(gi)) % self.batch_size
                    if pad:
                        gi = np.concatenate([gi, gi[:pad]])
                n_full = len(gi) // self.batch_size
                batches += [gi[i * self.batch_size:(i + 1) * self.batch_size]
                            for i in range(n_full)]
            if self.train:
                np.random.RandomState(self.seed + self.epoch + 7).shuffle(
                    batches)
            indices = (np.concatenate(batches) if batches
                       else indices[:0])
        nb = len(indices) // self.batch_size if self.drop_last else \
            (len(indices) + self.batch_size - 1) // self.batch_size
        base_seed = (self.seed + 1) * 1000003 + self.epoch * 97

        def make_batch(b, pool):
            idxs = indices[b * self.batch_size:(b + 1) * self.batch_size]
            if self.proc_workers:
                samples = list(pool.map(
                    _proc_load,
                    [(int(i), base_seed + int(i)) for i in idxs]))
            else:
                samples = list(pool.map(
                    lambda t: self._load_one(t[1], base_seed + int(t[1])),
                    enumerate(idxs)))
            while len(samples) < self.batch_size:  # pad final batch
                samples.append(samples[-1])
            stack = {k: np.stack([s[k] for s in samples])
                     for k in ("image", "img_hw", "gt_bboxes",
                               "gt_labels", "gt_valid")}
            if self.gt_buckets:
                # GT-count bucket: trim the max_gt pad down to the
                # smallest bucket covering every valid GT index in the
                # batch (valid entries are not necessarily contiguous
                # after aug filtering, so bucket on the last valid slot)
                cols = stack["gt_valid"].any(axis=0)
                need = int(cols.nonzero()[0].max()) + 1 if cols.any() else 1
                nb_gt = next((g for g in self.gt_buckets if g >= need),
                             stack["gt_valid"].shape[1])
                nb_gt = min(nb_gt, stack["gt_valid"].shape[1])
                for k in ("gt_bboxes", "gt_labels", "gt_valid"):
                    stack[k] = stack[k][:, :nb_gt]
                for s in samples:
                    if "gt_masks" in s:
                        s["gt_masks"] = s["gt_masks"][:nb_gt]
            batch = Batch(stack["image"], stack["img_hw"],
                          stack["gt_bboxes"], stack["gt_labels"],
                          stack["gt_valid"],
                          gt_masks=(np.stack([s["gt_masks"]
                                              for s in samples])
                                    if "gt_masks" in samples[0] else None),
                          gt_semantic=(np.stack([s["gt_semantic"]
                                                 for s in samples])
                                       if "gt_semantic" in samples[0]
                                       else None))
            meta = dict(
                img_ids=[s["img_id"] for s in samples],
                scale_factors=np.stack(
                    [s["scale_factor"] for s in samples]),
                ori_hw=np.stack([s["ori_hw"] for s in samples]))
            return batch, meta

        # (see infinite() for the InfiniteSampler-style endless stream)
        # true async prefetch: a producer thread builds batch b+1..b+N
        # while the consumer (the device step) is chewing on batch b —
        # the reference gets this from torch DataLoader worker processes
        # (datasets/builder.py:176-240); here a bounded queue decouples
        # host decode/resize from the training loop.
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        _DONE = object()

        def producer():
            try:
                if self.proc_workers:
                    ctx = mp.get_context("spawn")
                    pool_cm = cf.ProcessPoolExecutor(
                        self.num_workers, mp_context=ctx,
                        initializer=_proc_init, initargs=(self,))
                else:
                    pool_cm = cf.ThreadPoolExecutor(self.num_workers)
                with pool_cm as pool:
                    for b in range(nb):
                        q.put(make_batch(b, pool))
                q.put(_DONE)
            except BaseException as e:          # propagate to consumer
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True,
                                  name="dskd-loader-producer")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _DONE:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # unblock a producer stuck on a full queue if the consumer
            # abandons the iterator early
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    thread.join(timeout=0.1)
        self.epoch += 1

    def infinite(self) -> Iterator[Batch]:
        """Endless batch stream for iter-based schedules.

        The reference's InfiniteGroupBatchSampler/InfiniteBatchSampler
        (datasets/samplers/infinite_sampler.py:186) feed IterBasedRunner
        with an endless, epoch-reshuffled index stream; here each pass
        through __iter__ reshuffles (self.epoch advances per pass).
        """
        while True:
            yield from iter(self)
