"""mmdet vanilla-DETR checkpoint conversion: strict coverage + a torch
oracle of one full encoder layer (MHA with query/key pos, pre-residual
dropout path disabled, post-norms) — parity: mmcv DetrTransformer +
detr_head.py state_dict layout."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.detr import DETR, DETREncoderLayer
from dskd_tpu.utils.torch_weights import (convert_mmdet_detr,
                                          load_mmdet_detr_state_dict)

from test_faster_rcnn_convert import _synthetic_faster_rcnn_state

C = 64          # small embed dims for speed (8 heads x 8)
FFN_CH = 2048   # models/detr.py hardcodes the reference's 2048-wide FFN


def _synthetic_detr_state(num_classes=6, enc=2, dec=2, Q=10, seed=0):
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    state = {k: v for k, v in _synthetic_faster_rcnn_state(
        seed=seed).items() if k.startswith("backbone.")}
    state["bbox_head.input_proj.weight"] = t(C, 512, 1, 1)
    state["bbox_head.input_proj.bias"] = t(C)
    state["bbox_head.query_embedding.weight"] = t(Q, C)

    def layer(src, n_attn, n_norms):
        for a in range(n_attn):
            state[f"{src}.attentions.{a}.attn.in_proj_weight"] = t(3 * C, C)
            state[f"{src}.attentions.{a}.attn.in_proj_bias"] = t(3 * C)
            state[f"{src}.attentions.{a}.attn.out_proj.weight"] = t(C, C)
            state[f"{src}.attentions.{a}.attn.out_proj.bias"] = t(C)
        state[f"{src}.ffns.0.layers.0.0.weight"] = t(FFN_CH, C)
        state[f"{src}.ffns.0.layers.0.0.bias"] = t(FFN_CH)
        state[f"{src}.ffns.0.layers.1.weight"] = t(C, FFN_CH)
        state[f"{src}.ffns.0.layers.1.bias"] = t(C)
        for n in range(n_norms):
            state[f"{src}.norms.{n}.weight"] = 1 + 0.1 * t(C)
            state[f"{src}.norms.{n}.bias"] = t(C)

    for i in range(enc):
        layer(f"bbox_head.transformer.encoder.layers.{i}", 1, 2)
    for i in range(dec):
        layer(f"bbox_head.transformer.decoder.layers.{i}", 2, 3)
    state["bbox_head.transformer.decoder.post_norm.weight"] = 1 + 0.1 * t(C)
    state["bbox_head.transformer.decoder.post_norm.bias"] = t(C)
    state["bbox_head.fc_cls.weight"] = t(num_classes + 1, C)
    state["bbox_head.fc_cls.bias"] = t(num_classes + 1)
    state["bbox_head.reg_ffn.layers.0.0.weight"] = t(C, C)
    state["bbox_head.reg_ffn.layers.0.0.bias"] = t(C)
    state["bbox_head.reg_ffn.layers.1.weight"] = t(C, C)
    state["bbox_head.reg_ffn.layers.1.bias"] = t(C)
    state["bbox_head.fc_reg.weight"] = t(4, C)
    state["bbox_head.fc_reg.bias"] = t(4)
    return state


def test_detr_strict_load_full_coverage():
    state = _synthetic_detr_state()
    model = DETR(num_classes=6, num_query=10, embed_dims=C, depth=18,
                 num_encoder_layers=2, num_decoder_layers=2)
    images = jnp.zeros((1, 64, 64, 3))
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), images, hw)
    loaded = load_mmdet_detr_state_dict(dict(v), state, depth=18,
                                        strict=True)
    out = model.apply({"params": loaded["params"],
                       "batch_stats": loaded["batch_stats"]}, images, hw)
    assert out.cls_scores.shape == (2, 1, 10, 7)
    assert np.isfinite(np.asarray(out.cls_scores)).all()


def test_detr_encoder_layer_matches_torch():
    """One converted encoder layer == torch restatement (mmcv order:
    mha(q=x+pos, k=x+pos, v=x) + residual -> LN -> FFN + residual -> LN)."""
    state = _synthetic_detr_state()
    params, _ = convert_mmdet_detr(state, depth=18, num_heads=8)
    rng = np.random.RandomState(5)
    x = rng.randn(2, 12, C).astype(np.float32)
    pos = rng.randn(2, 12, C).astype(np.float32)

    layer = DETREncoderLayer(C, num_heads=8,
                             feedforward_channels=FFN_CH, dropout=0.0)
    out_f = layer.apply({"params": params["encoder_layer0"]},
                        jnp.asarray(x), jnp.asarray(pos))

    src = "bbox_head.transformer.encoder.layers.0"
    xt = torch.from_numpy(x).transpose(0, 1)       # (L, B, C)
    pt = torch.from_numpy(pos).transpose(0, 1)
    attn_out, _ = torch.nn.functional.multi_head_attention_forward(
        xt + pt, xt + pt, xt,
        embed_dim_to_check=C, num_heads=8,
        in_proj_weight=state[f"{src}.attentions.0.attn.in_proj_weight"],
        in_proj_bias=state[f"{src}.attentions.0.attn.in_proj_bias"],
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=state[f"{src}.attentions.0.attn.out_proj.weight"],
        out_proj_bias=state[f"{src}.attentions.0.attn.out_proj.bias"])
    y = xt + attn_out
    y = torch.nn.functional.layer_norm(
        y, (C,), state[f"{src}.norms.0.weight"],
        state[f"{src}.norms.0.bias"], eps=1e-5)
    f = torch.relu(y @ state[f"{src}.ffns.0.layers.0.0.weight"].T
                   + state[f"{src}.ffns.0.layers.0.0.bias"])
    f = f @ state[f"{src}.ffns.0.layers.1.weight"].T \
        + state[f"{src}.ffns.0.layers.1.bias"]
    y = y + f
    y = torch.nn.functional.layer_norm(
        y, (C,), state[f"{src}.norms.1.weight"],
        state[f"{src}.norms.1.bias"], eps=1e-5)
    np.testing.assert_allclose(np.asarray(out_f),
                               y.transpose(0, 1).numpy(),
                               rtol=3e-4, atol=3e-5)
