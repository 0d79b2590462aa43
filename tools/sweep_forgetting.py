#!/usr/bin/env python
"""Calibration sweep for the forgetting A/B (VERDICT r4 missing #1).

Runs `run_forgetting_ab` across recipe variants and prints one JSON line
per variant, so the winning recipe (distill beats fine-tune on COMBINED
old+new mAP while retaining old classes) can be pinned in
tests/test_forgetting_ab.py. Reference recipe anchor:
/root/reference/configs/deformable_detr/
chaosuan_gfl_deformable_detr_40_r50_8x4_1x_qoqo_il.py:116-119,149-152.

Usage: python tools/sweep_forgetting.py [variant ...]
(no args = all variants; CPU, tiny shapes, ~10 min/variant on 1 core)
"""
import json
import sys
import time

from ab_forgetting import run_forgetting_ab

VARIANTS = {
    # the reference flagship recipe (no soft KD, thr=0.3)
    "ref": dict(cates_distill="hard + teacher-first",
                feats_distill="corr + fg_info + decode_v1",
                teacher_score_thr=0.3),
    # isolate the soft-KD term (round-4 recipe at the fixed threshold)
    "ref+soft": dict(cates_distill="hard + teacher-first + soft",
                     feats_distill="corr + fg_info + decode_v1",
                     teacher_score_thr=0.3),
    # isolate the teacher threshold (round-4 thr, reference menu)
    "ref@thr.05": dict(cates_distill="hard + teacher-first",
                       feats_distill="corr + fg_info + decode_v1",
                       teacher_score_thr=0.05),
    # longer task-2 horizon (reference trains 12 epochs, not 300 steps)
    "ref@600": dict(cates_distill="hard + teacher-first",
                    feats_distill="corr + fg_info + decode_v1",
                    teacher_score_thr=0.3, steps2=600),
    "ref+soft@600": dict(cates_distill="hard + teacher-first + soft",
                         feats_distill="corr + fg_info + decode_v1",
                         teacher_score_thr=0.3, steps2=600),
    # stronger teacher (longer task-1) + the winning recipe
    "ref+soft@600/400": dict(
        cates_distill="hard + teacher-first + soft",
        feats_distill="corr + fg_info + decode_v1",
        teacher_score_thr=0.3, steps1=400, steps2=600),
    "ref@600/400": dict(cates_distill="hard + teacher-first",
                        feats_distill="corr + fg_info + decode_v1",
                        teacher_score_thr=0.3, steps1=400, steps2=600),
    "ref@1200/400": dict(cates_distill="hard + teacher-first",
                         feats_distill="corr + fg_info + decode_v1",
                         teacher_score_thr=0.3, steps1=400, steps2=1200),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        kw = dict(VARIANTS[name])
        t0 = time.time()
        r = run_forgetting_ab(steps1=kw.pop("steps1", 200),
                              steps2=kw.pop("steps2", 300),
                              B=2, H=128, W=128, G=6, n_eval=12, **kw)
        r["variant"] = name
        r["combined_distill"] = r["distill_old"] + r["distill_new"]
        r["combined_finetune"] = r["finetune_old"] + r["finetune_new"]
        r["wall_s"] = round(time.time() - t0, 1)
        print("SWEEP " + json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
