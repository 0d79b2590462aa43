#!/usr/bin/env python
"""Print a config's model architecture + per-module parameter accounting
(parity: tools/misc_my/check_model_architecture.py — the reference prints
the torch module tree; here: the flax module table)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--depth", type=int, default=2,
                        help="module-tree depth for the param table")
    args = parser.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model = build_model(cfg)
    print(model)   # flax module repr: the full static architecture

    variables = init_variables(model, cfg, jax.random.PRNGKey(0))

    def walk(tree, prefix, depth):
        rows = []
        if depth == 0 or not isinstance(tree, dict):
            n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))
            return [(prefix, n)]
        for k in sorted(tree):
            rows += walk(tree[k], f"{prefix}/{k}" if prefix else k,
                         depth - 1)
        return rows

    rows = walk(variables["params"], "", args.depth)
    total = sum(n for _, n in rows)
    print(f"\n{'module':<48} {'params':>12}")
    for name, n in rows:
        print(f"{name:<48} {n:>12,}")
    print(f"{'TOTAL':<48} {total:>12,}")


if __name__ == "__main__":
    main()
