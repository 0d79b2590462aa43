"""End-to-end migration CLI: mmdet config + .pth -> dskd config + Orbax
checkpoint (tools/model_converters/mmdet2dskd.py)."""
import os
import subprocess
import sys

import numpy as np
import torch

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

MMDET_CFG = """
model = dict(
    type='RetinaNet',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=True),
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
              out_channels=256, start_level=1,
              add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=4, in_channels=256,
                   stacked_convs=4, feat_channels=256),
)
data = dict(samples_per_gpu=2,
            train=dict(type='CocoDataset', ann_file='x.json',
                       img_prefix='imgs'),
            val=dict(type='CocoDataset', ann_file='x.json',
                     img_prefix='imgs'),
            test=dict(type='CocoDataset', ann_file='x.json',
                      img_prefix='imgs'))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
runner = dict(type='EpochBasedRunner', max_epochs=12)
"""


def test_mmdet2dskd_retinanet_roundtrip(tmp_path):
    from test_mmdet_convert import _synthetic_retinanet_state

    cfg_path = tmp_path / "retinanet_mmdet.py"
    cfg_path.write_text(MMDET_CFG)
    pth = tmp_path / "retinanet.pth"
    torch.save({"state_dict": _synthetic_retinanet_state(NC=4, seed=3),
                "meta": {"mmdet_version": "2.25"}}, str(pth))

    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools/model_converters/mmdet2dskd.py"),
         str(cfg_path), str(pth), "-o", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (out / "config.py").exists()
    assert (out / "task_0_epoch_0").exists()

    # the saved checkpoint restores and carries the converted weights
    import jax
    from dskd_tpu.train.checkpoint import restore_checkpoint
    from dskd_tpu.utils.torch_weights import convert_mmdet_retinanet

    restored = restore_checkpoint(str(out), 0, 0)
    p_ref, _ = convert_mmdet_retinanet(
        _synthetic_retinanet_state(NC=4, seed=3), depth=18)
    got = restored["params"]["bbox_head"]["retina_cls"]["kernel"]
    np.testing.assert_allclose(np.asarray(got),
                               p_ref["bbox_head"]["retina_cls"]["kernel"],
                               rtol=1e-6)
