"""Full-checkpoint conversion: mmdet GFL-DeformableDETR state_dict -> flax.

Builds a synthetic state_dict with the exact mmdet key naming (derived from
the reference modules — see convert_mmdet_gfl_ddetr docstring), loads it
strictly into a tiny flagship model, and numerically cross-checks the torch
nn.MultiheadAttention mapping against flax attention on random inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dskd_tpu.models.detector import GFLDeformableDETR
from dskd_tpu.utils.torch_weights import load_mmdet_state_dict


def _synthetic_mmdet_state(depth=18, C=256, H=8, reg_max=16, num_classes=7,
                           num_query=12, enc=1, dec=2, levels=4, seed=0):
    """Random tensors under the reference's state_dict keys."""
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    state = {}

    # backbone: torchvision resnet18 names
    state["backbone.conv1.weight"] = t(64, 3, 7, 7)
    for suffix, shape in (("weight", (64,)), ("bias", (64,)),
                          ("running_mean", (64,)), ("running_var", (64,))):
        v = t(*shape)
        state[f"backbone.bn1.{suffix}"] = torch.abs(v) + 0.5 \
            if suffix == "running_var" else v
    chans = [64, 128, 256, 512]
    for s, ch in enumerate(chans, start=1):
        in_ch = 64 if s == 1 else chans[s - 2]
        for b in range(2):
            src = f"backbone.layer{s}.{b}"
            c1_in = in_ch if b == 0 else ch
            state[f"{src}.conv1.weight"] = t(ch, c1_in, 3, 3)
            state[f"{src}.conv2.weight"] = t(ch, ch, 3, 3)
            for bn in ("bn1", "bn2"):
                for sfx, shp in (("weight", (ch,)), ("bias", (ch,)),
                                 ("running_mean", (ch,)),
                                 ("running_var", (ch,))):
                    state[f"{src}.{bn}.{sfx}"] = torch.abs(t(*shp)) + 0.5 \
                        if sfx == "running_var" else t(*shp)
            if b == 0 and s > 1:
                state[f"{src}.downsample.0.weight"] = t(ch, in_ch, 1, 1)
                for sfx, shp in (("weight", (ch,)), ("bias", (ch,)),
                                 ("running_mean", (ch,)),
                                 ("running_var", (ch,))):
                    state[f"{src}.downsample.1.{sfx}"] = \
                        torch.abs(t(*shp)) + 0.5 if sfx == "running_var" \
                        else t(*shp)

    # neck: ChannelMapper over C3..C5 + 1 extra conv
    for i, in_ch in enumerate([128, 256, 512]):
        state[f"neck.convs.{i}.conv.weight"] = t(C, in_ch, 1, 1)
        state[f"neck.convs.{i}.conv.bias"] = t(C)
        state[f"neck.convs.{i}.gn.weight"] = t(C)
        state[f"neck.convs.{i}.gn.bias"] = t(C)
    state["neck.extra_convs.0.conv.weight"] = t(C, 512, 3, 3)
    state["neck.extra_convs.0.conv.bias"] = t(C)
    state["neck.extra_convs.0.gn.weight"] = t(C)
    state["neck.extra_convs.0.gn.bias"] = t(C)

    # head
    reg_out = 2 + 4 * (reg_max + 1)
    state["bbox_head.query_embedding.weight"] = t(num_query, 2 * C)
    state["bbox_head.prototype.weight"] = t(num_classes, C)
    state["bbox_head.cls_branches.0.weight"] = t(num_classes, C)
    state["bbox_head.cls_branches.0.bias"] = t(num_classes)
    state["bbox_head.reg_branches.0.0.weight"] = t(C, C)
    state["bbox_head.reg_branches.0.0.bias"] = t(C)
    state["bbox_head.reg_branches.0.2.weight"] = t(C, C)
    state["bbox_head.reg_branches.0.2.bias"] = t(C)
    state["bbox_head.reg_branches.0.4.weight"] = t(reg_out, C)
    state["bbox_head.reg_branches.0.4.bias"] = t(reg_out)

    tsrc = "bbox_head.transformer"
    state[f"{tsrc}.level_embeds"] = t(levels, C)
    state[f"{tsrc}.reference_points.weight"] = t(2, 2 * C // 2)
    state[f"{tsrc}.reference_points.bias"] = t(2)

    def msda(src):
        hlp2 = H * levels * 4 * 2
        state[f"{src}.sampling_offsets.weight"] = t(hlp2, C)
        state[f"{src}.sampling_offsets.bias"] = t(hlp2)
        state[f"{src}.attention_weights.weight"] = t(hlp2 // 2, C)
        state[f"{src}.attention_weights.bias"] = t(hlp2 // 2)
        state[f"{src}.value_proj.weight"] = t(C, C)
        state[f"{src}.value_proj.bias"] = t(C)
        state[f"{src}.output_proj.weight"] = t(C, C)
        state[f"{src}.output_proj.bias"] = t(C)

    def ffn_norms(src, n_norms):
        state[f"{src}.ffns.0.layers.0.0.weight"] = t(1024, C)
        state[f"{src}.ffns.0.layers.0.0.bias"] = t(1024)
        state[f"{src}.ffns.0.layers.1.weight"] = t(C, 1024)
        state[f"{src}.ffns.0.layers.1.bias"] = t(C)
        for k in range(n_norms):
            state[f"{src}.norms.{k}.weight"] = t(C)
            state[f"{src}.norms.{k}.bias"] = t(C)

    for i in range(enc):
        src = f"{tsrc}.encoder.layers.{i}"
        msda(f"{src}.attentions.0")
        ffn_norms(src, 2)
    for i in range(dec):
        src = f"{tsrc}.decoder.layers.{i}"
        state[f"{src}.attentions.0.attn.in_proj_weight"] = t(3 * C, C)
        state[f"{src}.attentions.0.attn.in_proj_bias"] = t(3 * C)
        state[f"{src}.attentions.0.attn.out_proj.weight"] = t(C, C)
        state[f"{src}.attentions.0.attn.out_proj.bias"] = t(C)
        msda(f"{src}.attentions.1")
        ffn_norms(src, 3)
    return state


def test_full_checkpoint_strict_load_and_forward():
    model = GFLDeformableDETR(num_classes=7, num_query=12, depth=18,
                              num_encoder_layers=1, num_decoder_layers=2)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    img_hw = jnp.array([[64, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)

    state = _synthetic_mmdet_state()
    loaded = load_mmdet_state_dict(dict(variables), state, depth=18,
                                   strict=True)

    # strict load passed => every converted leaf matched an existing leaf;
    # now ensure the load actually changed the weights and forward runs
    old = variables["params"]["bbox_head"]["cls_branch"]["kernel"]
    new = loaded["params"]["bbox_head"]["cls_branch"]["kernel"]
    assert float(jnp.abs(jnp.asarray(new) - old).max()) > 0
    out = model.apply(loaded, images, img_hw, deterministic=True)
    assert np.isfinite(np.asarray(out.head.cls_scores)).all()


def test_mha_conversion_numeric_oracle():
    """torch nn.MultiheadAttention == flax attention with converted weights."""
    import flax.linen as fnn

    C, H, B, Q = 32, 4, 2, 5
    rng = np.random.RandomState(3)
    x = rng.randn(B, Q, C).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    with torch.no_grad():
        want, _ = tmha(torch.tensor(x), torch.tensor(x), torch.tensor(x))
    state = {f"a.{k}": v for k, v in tmha.state_dict().items()}

    # convert exactly as convert_mmdet_gfl_ddetr.mha does
    w = state["a.in_proj_weight"].numpy()
    b = state["a.in_proj_bias"].numpy()
    Dh = C // H
    params = {}
    for i, name in enumerate(("query", "key", "value")):
        params[name] = dict(
            kernel=jnp.asarray(w[i * C:(i + 1) * C].T.reshape(C, H, Dh)),
            bias=jnp.asarray(b[i * C:(i + 1) * C].reshape(H, Dh)))
    ow = state["a.out_proj.weight"].numpy()
    params["out"] = dict(kernel=jnp.asarray(ow.T.reshape(H, Dh, C)),
                         bias=jnp.asarray(state["a.out_proj.bias"].numpy()))

    attn = fnn.MultiHeadDotProductAttention(
        num_heads=H, qkv_features=C, out_features=C, dropout_rate=0.0,
        deterministic=True)
    got = attn.apply({"params": params}, jnp.asarray(x), jnp.asarray(x),
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_pth_file_load(tmp_path):
    """File-path variant: torch.save'd {'state_dict': ...} checkpoint
    (the reference teacher_ckpt format) loads through
    load_mmdet_checkpoint — the driver's teacher_ckpt='*.pth' branch."""
    import torch

    from dskd_tpu.utils.torch_weights import load_mmdet_checkpoint

    model = GFLDeformableDETR(num_classes=7, num_query=12, depth=18,
                              num_encoder_layers=1, num_decoder_layers=2)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    img_hw = jnp.array([[64, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)

    state = _synthetic_mmdet_state()
    path = tmp_path / "teacher.pth"
    torch.save({"state_dict": state, "meta": {"epoch": 12}}, str(path))
    loaded = load_mmdet_checkpoint(dict(variables), str(path), depth=18)
    old = variables["params"]["bbox_head"]["cls_branch"]["kernel"]
    new = loaded["params"]["bbox_head"]["cls_branch"]["kernel"]
    assert float(jnp.abs(jnp.asarray(new) - old).max()) > 0


def _synthetic_retinanet_state(NC=4, A=9, seed=0, rich_bn=False):
    """mmdet-layout RetinaNet-R18 state dict covering every expected key.

    ``rich_bn`` randomizes BN scale/bias/running stats (instead of the
    identity transform) so whole-model oracles exercise the BN mapping."""
    import torch

    rng = np.random.RandomState(seed)
    state = {}

    def add_conv(name, cin, cout):
        state[name + ".weight"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        state[name + ".bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.05)

    # backbone: hand-built torchvision-format resnet18 state dict
    bb = {}
    def tconv(name, cin, cout, k):
        bb[name + ".weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)
    def tbn(name, c):
        if rich_bn:
            vals = (("weight", 1 + 0.2 * rng.randn(c)),
                    ("bias", 0.2 * rng.randn(c)),
                    ("running_mean", 0.2 * rng.randn(c)),
                    ("running_var", 1 + 0.5 * rng.rand(c)))
        else:
            vals = (("weight", np.ones(c)), ("bias", np.zeros(c)),
                    ("running_mean", np.zeros(c)),
                    ("running_var", np.ones(c)))
        for suf, val in vals:
            bb[name + "." + suf] = torch.from_numpy(
                val.astype(np.float32))
    tconv("conv1", 3, 64, 7)
    tbn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for st in range(1, 5):
        cin, cout = chans[st - 1], chans[st]
        for blk in range(2):
            pre = f"layer{st}.{blk}"
            tconv(pre + ".conv1", cin if blk == 0 else cout, cout, 3)
            tbn(pre + ".bn1", cout)
            tconv(pre + ".conv2", cout, cout, 3)
            tbn(pre + ".bn2", cout)
            if blk == 0 and st > 1:
                tconv(pre + ".downsample.0", cin, cout, 1)
                tbn(pre + ".downsample.1", cout)
    for k, val in bb.items():
        state["backbone." + k] = val

    for i, cin in enumerate((128, 256, 512)):
        state[f"neck.lateral_convs.{i}.conv.weight"] = torch.from_numpy(
            rng.randn(256, cin, 1, 1).astype(np.float32) * 0.05)
        state[f"neck.lateral_convs.{i}.conv.bias"] = torch.zeros(256)
        add_conv(f"neck.fpn_convs.{i}.conv", 256, 256)
    state["neck.fpn_convs.3.conv.weight"] = torch.from_numpy(
        rng.randn(256, 512, 3, 3).astype(np.float32) * 0.05)
    state["neck.fpn_convs.3.conv.bias"] = torch.zeros(256)
    add_conv("neck.fpn_convs.4.conv", 256, 256)
    for i in range(4):
        add_conv(f"bbox_head.cls_convs.{i}.conv", 256, 256)
        add_conv(f"bbox_head.reg_convs.{i}.conv", 256, 256)
    add_conv("bbox_head.retina_cls", 256, A * NC)
    add_conv("bbox_head.retina_reg", 256, A * 4)
    return state


def test_retinanet_convert_strict_and_head_oracle():
    """mmdet RetinaNet state_dict strict-loads, and the converted HEAD
    reproduces a torch re-statement of retina_head.py numerically."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp
    from dskd_tpu.models.retinanet import RetinaNet
    from dskd_tpu.utils.torch_weights import (
        load_mmdet_retinanet_state_dict)

    rng = np.random.RandomState(0)
    NC, A = 4, 9
    model = RetinaNet(num_classes=NC, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    img_hw = jnp.asarray([[64, 64]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)

    state = _synthetic_retinanet_state(NC=NC, A=A, seed=0)

    v2 = load_mmdet_retinanet_state_dict(v, state, depth=18, strict=True)

    # numeric head oracle: torch re-statement of retina_head.forward
    feat = rng.randn(1, 256, 8, 8).astype(np.float32)
    c = r = torch.from_numpy(feat)
    for i in range(4):
        c = F.relu(F.conv2d(c, state[f"bbox_head.cls_convs.{i}.conv.weight"],
                            state[f"bbox_head.cls_convs.{i}.conv.bias"],
                            padding=1))
        r = F.relu(F.conv2d(r, state[f"bbox_head.reg_convs.{i}.conv.weight"],
                            state[f"bbox_head.reg_convs.{i}.conv.bias"],
                            padding=1))
    want_cls = F.conv2d(c, state["bbox_head.retina_cls.weight"],
                        state["bbox_head.retina_cls.bias"], padding=1)
    from dskd_tpu.models.retinanet import RetinaHead
    head = RetinaHead(num_classes=NC)
    got = head.apply({"params": v2["params"]["bbox_head"]},
                     [jnp.asarray(feat.transpose(0, 2, 3, 1))])
    np.testing.assert_allclose(
        np.asarray(got.cls_scores[0]),
        want_cls.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-4)
