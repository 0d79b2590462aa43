#!/usr/bin/env python
"""Aggregate corruption-benchmark results into P / mPC / rPC.

Parity target: tools/analysis_tools/robustness_eval.py in the reference —
given per-(corruption, severity) metric dicts (as produced by
test_robustness.py), report:

  P    clean performance (severity 0),
  mPC  mean performance under corruption: mean over corruptions of the
       mean over severities 1..5,
  rPC  relative performance under corruption: mPC / P.

Usage: python tools/analysis_tools/robustness_eval.py RESULTS.json \
    [--metric bbox_mAP]
"""
import argparse
import json

import numpy as np


def aggregate(results: dict, metric: str = "bbox_mAP") -> dict:
    """results: {corruption: {severity(str|int): {metric: value}}}."""
    clean = None
    per_corruption = {}
    for corr, sevs in results.items():
        vals = []
        for sev, metrics in sorted(sevs.items(), key=lambda kv: int(kv[0])):
            if int(sev) == 0:
                clean = metrics[metric]
            else:
                vals.append(metrics[metric])
        if vals:
            per_corruption[corr] = float(np.mean(vals))
    mpc = float(np.mean(list(per_corruption.values()))) \
        if per_corruption else -1.0
    out = {"P": clean if clean is not None else -1.0, "mPC": mpc,
           "per_corruption": per_corruption}
    out["rPC"] = (mpc / clean) if clean else -1.0
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", help="json from test_robustness.py")
    p.add_argument("--metric", default="bbox_mAP")
    args = p.parse_args()
    with open(args.results) as f:
        results = json.load(f)
    print(json.dumps(aggregate(results, args.metric), indent=2))


if __name__ == "__main__":
    main()
