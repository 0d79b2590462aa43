#!/usr/bin/env python
"""Training-log analysis (parity: tools/analysis_tools/analyze_logs.py):
plot loss/metric curves from the JSONL logs and report average iter time.
"""
import argparse
import json


def load_log(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def plot_curve(recs, keys, out_file):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for key in keys:
        xs, ys = [], []
        for i, r in enumerate(r for r in recs if key in r):
            xs.append(i)
            ys.append(r[key])
        ax.plot(xs, ys, label=key)
    ax.legend()
    ax.set_xlabel("log step")
    fig.savefig(out_file, dpi=120)
    print(f"saved {out_file}")


def cal_train_time(recs):
    times = [r["time"] for r in recs if "time" in r]
    if times:
        print(f"average iter time: {sum(times) / len(times):.4f} s")
    else:
        print("no 'time' field in logs")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("json_log")
    p1.add_argument("--keys", nargs="+", default=["loss"])
    p1.add_argument("--out", default="curve.png")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("json_log")
    args = parser.parse_args()

    recs = load_log(args.json_log)
    if args.cmd == "plot_curve":
        plot_curve(recs, args.keys, args.out)
    else:
        cal_train_time(recs)


if __name__ == "__main__":
    main()
