"""mmdet GFL checkpoint conversion (the LD teacher/student layout):
strict coverage + torch oracle for the conv+GN towers and the per-level
reg Scale (parity: mmdet gfl_head.py state_dict layout)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.gfl import GFL
from dskd_tpu.utils.torch_weights import (convert_mmdet_gfl,
                                          load_mmdet_gfl_state_dict)

from test_faster_rcnn_convert import _synthetic_faster_rcnn_state


def _synthetic_gfl_state(num_classes=4, reg_max=16, seed=0):
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    state = {k: v for k, v in _synthetic_faster_rcnn_state(
        seed=seed).items() if k.startswith("backbone.")}
    # FPN start_level=1: laterals over C3..C5 + 2 on_output extras
    for i, in_ch in enumerate([128, 256, 512]):
        state[f"neck.lateral_convs.{i}.conv.weight"] = t(256, in_ch, 1, 1)
        state[f"neck.lateral_convs.{i}.conv.bias"] = t(256)
    for i in range(5):
        state[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        state[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    for i in range(4):
        for src in ("cls_convs", "reg_convs"):
            state[f"bbox_head.{src}.{i}.conv.weight"] = t(256, 256, 3, 3)
            state[f"bbox_head.{src}.{i}.gn.weight"] = 1 + 0.1 * t(256)
            state[f"bbox_head.{src}.{i}.gn.bias"] = t(256)
    state["bbox_head.gfl_cls.weight"] = t(num_classes, 256, 3, 3)
    state["bbox_head.gfl_cls.bias"] = t(num_classes)
    state["bbox_head.gfl_reg.weight"] = t(4 * (reg_max + 1), 256, 3, 3)
    state["bbox_head.gfl_reg.bias"] = t(4 * (reg_max + 1))
    for lvl in range(5):
        state[f"bbox_head.scales.{lvl}.scale"] = torch.tensor(
            1.0 + 0.1 * float(rng.randn()))
    return state


def test_gfl_strict_load_and_head_oracle():
    state = _synthetic_gfl_state(num_classes=4)
    model = GFL(num_classes=4, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), images, hw)
    loaded = load_mmdet_gfl_state_dict(dict(v), state, depth=18,
                                       strict=True)

    rng = np.random.RandomState(8)
    images = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.3
    out = model.apply({"params": loaded["params"],
                       "batch_stats": loaded["batch_stats"]},
                      jnp.asarray(images), hw)

    # torch restatement of the reg tower + Scale on the flax P3 feature
    feat = torch.from_numpy(
        np.asarray(out.neck_feats[0]).copy()).permute(0, 3, 1, 2)
    x = feat
    for i in range(4):
        x = torch.nn.functional.conv2d(
            x, state[f"bbox_head.reg_convs.{i}.conv.weight"], None,
            padding=1)
        x = torch.nn.functional.group_norm(
            x, 32, state[f"bbox_head.reg_convs.{i}.gn.weight"],
            state[f"bbox_head.reg_convs.{i}.gn.bias"], eps=1e-5).relu()
    x = torch.nn.functional.conv2d(
        x, state["bbox_head.gfl_reg.weight"],
        state["bbox_head.gfl_reg.bias"], padding=1)
    x = x * state["bbox_head.scales.0.scale"]
    np.testing.assert_allclose(np.asarray(out.head.bbox_preds[0]),
                               x.permute(0, 2, 3, 1).numpy(),
                               rtol=3e-4, atol=3e-5)


def test_gfl_converted_weights_feed_ld():
    """The converted GFL tree doubles as the LD teacher: build_teacher
    contract — same module, teacher params pytree (configs/ld pair a
    frozen GFL R101 teacher with a GFL R18 student)."""
    state = _synthetic_gfl_state(num_classes=4, seed=2)
    model = GFL(num_classes=4, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(1), images, hw)
    loaded = load_mmdet_gfl_state_dict(dict(v), state, depth=18,
                                       strict=True)
    out = model.apply({"params": loaded["params"],
                       "batch_stats": loaded["batch_stats"]},
                      images, hw)
    assert all(np.isfinite(np.asarray(c)).all()
               for c in out.head.cls_scores)
