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
