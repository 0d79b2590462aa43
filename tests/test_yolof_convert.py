"""mmdet YOLOF checkpoint conversion: strict coverage + torch oracle of
one dilated-encoder bottleneck (conv+BN eval-mode chains, dilation) and
the caffe-style backbone stride placement (parity: necks/
dilated_encoder.py + yolof_head.py + configs/yolof style='caffe')."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.yolof import YOLOF
from dskd_tpu.utils.torch_weights import load_mmdet_yolof_state_dict

from test_faster_rcnn_convert import _synthetic_faster_rcnn_state


def _synthetic_yolof_state(num_classes=4, A=5, seed=0):
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)

    def bn_keys(state, base, c):
        state[f"{base}.weight"] = 1 + 0.1 * t(c)
        state[f"{base}.bias"] = t(c)
        state[f"{base}.running_mean"] = t(c)
        state[f"{base}.running_var"] = torch.abs(t(c)) + 0.5

    state = {k: v for k, v in _synthetic_faster_rcnn_state(
        seed=seed).items() if k.startswith("backbone.")}
    state["neck.lateral_conv.weight"] = t(512, 512, 1, 1)
    state["neck.lateral_conv.bias"] = t(512)
    bn_keys(state, "neck.lateral_norm", 512)
    state["neck.fpn_conv.weight"] = t(512, 512, 3, 3)
    state["neck.fpn_conv.bias"] = t(512)
    bn_keys(state, "neck.fpn_norm", 512)
    for i in range(4):
        src = f"neck.dilated_encoder_blocks.{i}"
        state[f"{src}.conv1.conv.weight"] = t(128, 512, 1, 1)
        bn_keys(state, f"{src}.conv1.bn", 128)
        state[f"{src}.conv2.conv.weight"] = t(128, 128, 3, 3)
        bn_keys(state, f"{src}.conv2.bn", 128)
        state[f"{src}.conv3.conv.weight"] = t(512, 128, 1, 1)
        bn_keys(state, f"{src}.conv3.bn", 512)
    for i in range(2):
        state[f"bbox_head.cls_subnet.{i}.conv.weight"] = t(512, 512, 3, 3)
        bn_keys(state, f"bbox_head.cls_subnet.{i}.bn", 512)
    for i in range(4):
        state[f"bbox_head.bbox_subnet.{i}.conv.weight"] = t(512, 512, 3, 3)
        bn_keys(state, f"bbox_head.bbox_subnet.{i}.bn", 512)
    state["bbox_head.cls_score.weight"] = t(A * num_classes, 512, 3, 3)
    state["bbox_head.cls_score.bias"] = t(A * num_classes)
    state["bbox_head.bbox_pred.weight"] = t(A * 4, 512, 3, 3)
    state["bbox_head.bbox_pred.bias"] = t(A * 4)
    state["bbox_head.object_pred.weight"] = t(A, 512, 3, 3)
    state["bbox_head.object_pred.bias"] = t(A)
    return state


def test_yolof_strict_load_and_neck_oracle():
    state = _synthetic_yolof_state(num_classes=4)
    model = YOLOF(num_classes=4, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), images, hw)
    loaded = load_mmdet_yolof_state_dict(dict(v), state, depth=18,
                                         strict=True)

    rng = np.random.RandomState(6)
    images = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.3
    out = model.apply({"params": loaded["params"],
                       "batch_stats": loaded["batch_stats"]},
                      jnp.asarray(images), hw)
    assert np.isfinite(np.asarray(out.head.cls_scores)).all()

    # torch restatement of the full neck on the flax C5 feature is not
    # directly exposed; instead drive the first dilated block on a
    # random map (eval-mode BN with the converted running stats)
    from dskd_tpu.models.dilated_encoder import Bottleneck
    from dskd_tpu.utils.torch_weights import convert_mmdet_yolof
    params, stats = convert_mmdet_yolof(state, depth=18)
    x = rng.randn(2, 8, 8, 512).astype(np.float32)
    blk_p = params["neck"]["dilated_block0"]
    blk_s = stats["neck"]["dilated_block0"]
    out_f = Bottleneck(dilation=2).apply(
        {"params": blk_p, "batch_stats": blk_s}, jnp.asarray(x))

    def cbr(xt, src, dilation=1, pad=0):
        y = torch.nn.functional.conv2d(
            xt, state[f"{src}.conv.weight"], None, padding=pad,
            dilation=dilation)
        y = torch.nn.functional.batch_norm(
            y, state[f"{src}.bn.running_mean"],
            state[f"{src}.bn.running_var"], state[f"{src}.bn.weight"],
            state[f"{src}.bn.bias"], training=False, eps=1e-5)
        return y.relu()

    xt = torch.from_numpy(x.copy()).permute(0, 3, 1, 2)
    src = "neck.dilated_encoder_blocks.0"
    y = cbr(xt, f"{src}.conv1")
    y = cbr(y, f"{src}.conv2", dilation=2, pad=2)
    y = cbr(y, f"{src}.conv3")
    y = y + xt
    np.testing.assert_allclose(np.asarray(out_f),
                               y.permute(0, 2, 3, 1).numpy(),
                               rtol=3e-4, atol=3e-5)


def test_caffe_style_stride_placement():
    """style='caffe' puts the stage stride on the bottleneck 1x1
    (reference resnet.py Bottleneck conv1_stride logic)."""
    from dskd_tpu.models.resnet import ResNet
    x = jnp.zeros((1, 64, 64, 3))
    for style in ("pytorch", "caffe"):
        m = ResNet(depth=50, out_indices=(3,), style=style)
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x)[0].shape == (1, 2, 2, 2048), style
        # stride location differs: caffe's layer2 conv1 consumes the
        # UNSTRIDED map, so its FLOPs input is 16x16 vs pytorch's
        k2 = v["params"]["layer2_block0"]["conv1"]["kernel"]
        assert k2.shape == ((1, 1, 256, 128)), (style, k2.shape)
