#!/usr/bin/env python
"""Print the fully-resolved experiment config (parity: tools/misc/
print_config.py)."""
import argparse
import dataclasses
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()

    from dskd_tpu.utils.config import apply_overrides, load_config
    cfg = apply_overrides(load_config(args.config), args.set)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
