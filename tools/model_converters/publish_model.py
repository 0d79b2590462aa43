"""Strip a training checkpoint down to deployable weights.

Parity target: tools/model_converters/publish_model.py (reference):
drop the optimizer state from a checkpoint and append the first 8 hex
chars of the content hash to the published filename. Here the input is
an Orbax ``task_{t}_epoch_{e}`` directory and the output is a
flax-serialized msgpack holding only ``params`` (+ ``batch_stats`` when
present) — the weights-only artifact apis/inference.init_detector and
the serving exporter consume.

Usage: python tools/model_converters/publish_model.py IN_CKPT_DIR OUT.msgpack
"""
from __future__ import annotations

import argparse
import hashlib
import os


def publish(in_dir: str, out_path: str) -> str:
    import orbax.checkpoint as ocp
    from flax.serialization import msgpack_serialize

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(in_dir))
    payload = {"params": raw["params"]}
    if raw.get("batch_stats"):
        payload["batch_stats"] = raw["batch_stats"]
    blob = msgpack_serialize(payload)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    root, ext = os.path.splitext(out_path)
    final = f"{root}-{sha}{ext or '.msgpack'}"
    with open(final, "wb") as f:
        f.write(blob)
    return final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_ckpt", help="task_{t}_epoch_{e} checkpoint dir")
    ap.add_argument("out", help="output path (hash suffix appended)")
    args = ap.parse_args()
    final = publish(args.in_ckpt, args.out)
    print(f"published -> {final}")


if __name__ == "__main__":
    main()
