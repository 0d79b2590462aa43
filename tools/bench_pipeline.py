"""Host data-pipeline throughput benchmark.

Answers the production scaling question the chip bench cannot: how many
images/second can ONE host's preprocessing sustain (decode stand-in +
resize + normalize + canvas + GT padding), i.e. how many chips a single
host can feed at the measured step throughput. Runs the real
``preprocess`` on synthetic COCO-shaped samples, single-thread and
through the threaded DataLoader.

Usage: python tools/bench_pipeline.py [--hw 640x480] [--n 300]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# standalone tool: force the CPU backend BEFORE any jax-touching import
# (the axon sitecustomize would otherwise dial the chip tunnel)
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


class _SynthDS:
    """Picklable synthetic dataset (process workers re-hydrate it)."""

    def __init__(self, path, n, boxes, labels):
        self.path, self.n = path, n
        self.boxes, self.labels = boxes, labels

    def __len__(self):
        return self.n

    def get_raw(self, i):
        return (self.path, (480, 640), self.boxes, self.labels, i + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="640x480")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    from dskd_tpu.data.pipeline import PipelineConfig, preprocess

    rng = np.random.RandomState(0)
    # COCO-ish raw sizes (most images ~480x640)
    raws = [(rng.rand(480, 640, 3).astype(np.float32) * 255)
            for _ in range(8)]
    boxes = rng.rand(20, 4).astype(np.float32) * 300
    boxes[:, 2:] += boxes[:, :2] + 10
    labels = rng.randint(0, 80, 20).astype(np.int32)
    cfg = PipelineConfig(img_scale=(max(H, W), min(H, W)), bucket=(H, W),
                         max_gt=100)

    # warmup
    for i in range(10):
        preprocess(raws[i % 8], boxes, labels, cfg,
                   np.random.RandomState(i), train=True)
    t0 = time.monotonic()
    for i in range(args.n):
        preprocess(raws[i % 8], boxes, labels, cfg,
                   np.random.RandomState(i), train=True)
    dt = time.monotonic() - t0
    single = args.n / dt
    print(f"single-thread preprocess: {single:.1f} img/s "
          f"({1000 * dt / args.n:.2f} ms/img) at {H}x{W}", flush=True)

    # loader over a real JPEG on disk (decode included; works for both
    # thread and DSKD_PROC_WORKERS=1 process pools)
    import tempfile

    import cv2
    tmp = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    cv2.imwrite(tmp.name, raws[0].astype(np.uint8))

    from dskd_tpu.data.loader import DataLoader
    dl = DataLoader(_SynthDS(tmp.name, args.n, boxes, labels),
                    batch_size=8, pipeline=cfg,
                    train=True, num_workers=args.workers)
    mode = ("process" if dl.proc_workers else "thread")
    n = 0
    t0 = time.monotonic()
    for batch, meta in dl:
        n += batch.images.shape[0]
    dt = time.monotonic() - t0
    print(f"{mode} loader (workers={args.workers}, decode incl.): "
          f"{n / dt:.1f} img/s", flush=True)
    os.unlink(tmp.name)


if __name__ == "__main__":
    main()
