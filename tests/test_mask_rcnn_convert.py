"""mmdet Mask R-CNN checkpoint conversion: strict coverage + a torch
oracle for the FCN mask head — in particular the ConvTranspose2d 2x2/2
deconv weight mapping (parity: mmdet fcn_mask_head.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.mask_rcnn import MaskRCNN
from dskd_tpu.utils.torch_weights import load_mmdet_mask_rcnn_state_dict

from test_faster_rcnn_convert import _synthetic_faster_rcnn_state


def _synthetic_mask_rcnn_state(num_classes=5, seed=0):
    state = _synthetic_faster_rcnn_state(num_classes=num_classes, seed=seed)
    rng = np.random.RandomState(seed + 100)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    for i in range(4):
        state[f"roi_head.mask_head.convs.{i}.conv.weight"] = t(
            256, 256, 3, 3)
        state[f"roi_head.mask_head.convs.{i}.conv.bias"] = t(256)
    state["roi_head.mask_head.upsample.weight"] = t(256, 256, 2, 2)
    state["roi_head.mask_head.upsample.bias"] = t(256)
    state["roi_head.mask_head.conv_logits.weight"] = t(
        num_classes, 256, 1, 1)
    state["roi_head.mask_head.conv_logits.bias"] = t(num_classes)
    return state


def test_mask_rcnn_strict_load_and_mask_head_oracle():
    state = _synthetic_mask_rcnn_state(num_classes=5)
    model = MaskRCNN(num_classes=5, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), images, hw,
                   method=MaskRCNN.init_all)
    loaded = load_mmdet_mask_rcnn_state_dict(dict(v), state, depth=18,
                                             strict=True)

    rng = np.random.RandomState(4)
    rois = rng.randn(3, 14, 14, 256).astype(np.float32)
    logits_f = model.apply(
        {"params": loaded["params"],
         "batch_stats": loaded["batch_stats"]},
        jnp.asarray(rois), method=MaskRCNN.mask_forward)
    assert logits_f.shape == (3, 28, 28, 5)

    xt = torch.from_numpy(rois.copy()).permute(0, 3, 1, 2)
    for i in range(4):
        xt = torch.nn.functional.conv2d(
            xt, state[f"roi_head.mask_head.convs.{i}.conv.weight"],
            state[f"roi_head.mask_head.convs.{i}.conv.bias"],
            padding=1).relu()
    xt = torch.nn.functional.conv_transpose2d(
        xt, state["roi_head.mask_head.upsample.weight"],
        state["roi_head.mask_head.upsample.bias"], stride=2).relu()
    logits_t = torch.nn.functional.conv2d(
        xt, state["roi_head.mask_head.conv_logits.weight"],
        state["roi_head.mask_head.conv_logits.bias"])
    np.testing.assert_allclose(np.asarray(logits_f),
                               logits_t.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-5)
