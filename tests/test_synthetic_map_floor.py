"""Flagship synthetic-mAP floor: catches silent numerics regressions.

Round-3 review: the incremental e2e asserts plumbing (checkpoints exist),
not learning — a silent numerics regression would pass CI and only show
up on chip. This wraps the tools/ab_matcher.py machinery (the 500-step
learnable painted-box stream whose PERF.md finding-3 table records
mAP 7.08 @ 500 steps) as a shorter floor test: 300 steps must clear a
recorded floor with ZERO auction->JV fallbacks.

Calibration (this box, seed stream 100.., B=2 128x128, 2enc/2dec r18,
~6 min solo): 300 auction steps reach loss 13.35 -> 7.64, fallbacks 0,
mAP 0.0174 (fraction scale, = 1.74 points; the 500-step PERF run
reaches 0.0708). Floor set at roughly half the observed value.
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_auction_training_clears_map_floor():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from ab_matcher import run

    losses, fallbacks, m = run("auction", steps=300, with_map=True)
    # the device auction matched scipy on every live submatrix
    assert fallbacks == 0
    # training actually optimized: loss descended and mAP is real signal
    assert float(np.mean(losses[-10:])) < float(np.mean(losses[:10])), \
        (losses[:10], losses[-10:])
    assert m >= 0.008, f"synthetic mAP {m:.4f} under floor 0.008"
