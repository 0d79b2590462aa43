"""The DSKD method's headline effect, demonstrated end-to-end.

The reference's entire point (/root/reference/README.md:5) is that its
distillation recipe closes catastrophic forgetting in incremental
detection at (almost) no cost to new-class learning: COCO 40+40 overall
mAP gap 1.0 with DSKD vs 3.3 plain. This test reproduces the effect on
synthetic painted-box data: after task-2 training the distilled student
BEATS plain fine-tuning on combined old+new mAP — retaining the old
classes fine-tuning collapses (old objects appear unannotated in task-2
imagery, so fine-tuning suppresses them as background) while matching
its new-class learning.

Calibration (round-5 sweep, tools/sweep_forgetting.py, seed 0, B=2
128x128 G=6, reference flagship recipe hard+teacher-first+soft /
corr+fg_info+decode_v1, teacher score_thr=0.3):

  steps1/steps2   teacher_old  distill old/new   finetune old/new
  200/300 (r4 thr=.05, +soft)  14.2    8.5 /  2.1     0.0 / 32.3
  200/300 (ref thr=.3)         14.2   13.3 / 14.1     0.0 / 31.5
  200/600                      14.2   18.0 / 19.1     0.0 / 41.0
  400/600  <- pinned           50.5   53.5 / 49.2     0.0 / 45.8

The round-4 demonstration lost on combined mAP because the 200-step
teacher (old-mAP 14) fed noisy pseudo-GT; with a competent teacher the
distilled student exceeds the teacher on old classes (53.5 > 50.5, it
keeps learning them from the merged pseudo-GT) AND out-learns plain
fine-tuning on the new ones (49.2 > 45.8). Thresholds sit at roughly
half the observed margins so numeric drift passes but any recipe
regression (retention collapse, plasticity collapse, combined loss)
fails.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_distill_beats_finetune_on_combined_map():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from ab_forgetting import run_forgetting_ab

    r = run_forgetting_ab(steps1=400, steps2=600, B=2, H=128, W=128,
                          G=6, n_eval=12,
                          cates_distill="hard + teacher-first + soft",
                          feats_distill="corr + fg_info + decode_v1",
                          teacher_score_thr=0.3)
    # phase 1 must have produced a competent teacher
    assert r["teacher_old"] > 25.0, r
    # the forgetting gap: distill retains, finetune collapses
    assert r["distill_old"] > r["finetune_old"] + 10.0, r
    assert r["distill_old"] > 0.6 * r["teacher_old"], r
    # plasticity: the distilled student learns new classes on par with
    # plain fine-tuning (observed 49.2 vs 45.8; floor at 60%)
    assert r["distill_new"] > 0.6 * r["finetune_new"], r
    # the baseline really does forget (otherwise the A/B proves nothing)
    assert r["finetune_old"] < 0.25 * r["teacher_old"], r
    # THE reference claim: DSKD wins on COMBINED old+new mAP
    assert (r["distill_old"] + r["distill_new"]
            > r["finetune_old"] + r["finetune_new"] + 5.0), r
