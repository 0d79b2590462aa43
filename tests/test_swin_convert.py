"""mmdet Swin checkpoint conversion: strict key coverage + torch numeric
oracles for the two mapping-sensitive modules (parity: mmdet
backbones/swin.py WindowMSA / PatchMerging state_dict layout).

The oracles restate the reference ops directly in torch on the SAME
synthetic state_dict the converter maps: any transpose/index-order
mistake in convert_mmdet_swin shows up as a numeric mismatch."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dskd_tpu.models.swin import (WINDOW, PatchMerging, SwinTransformer,
                                  WindowAttention)
from dskd_tpu.utils.torch_weights import (convert_mmdet_swin,
                                          load_mmdet_swin_state_dict)


def _synthetic_mmdet_swin_state(seed=0):
    """Random swin-tiny state_dict with mmdet's exact key layout."""
    g = torch.Generator().manual_seed(seed)
    t = lambda *s: torch.randn(*s, generator=g) * 0.05
    state = {
        "patch_embed.projection.weight": t(96, 3, 4, 4),
        "patch_embed.projection.bias": t(96),
        "patch_embed.norm.weight": 1 + 0.1 * t(96),
        "patch_embed.norm.bias": t(96),
    }
    depths, heads = (2, 2, 6, 2), (3, 6, 12, 24)
    for si, (d, h) in enumerate(zip(depths, heads)):
        C = 96 * 2 ** si
        for b in range(d):
            base = f"stages.{si}.blocks.{b}"
            state.update({
                f"{base}.norm1.weight": 1 + 0.1 * t(C),
                f"{base}.norm1.bias": t(C),
                f"{base}.attn.w_msa.qkv.weight": t(3 * C, C),
                f"{base}.attn.w_msa.qkv.bias": t(3 * C),
                f"{base}.attn.w_msa.proj.weight": t(C, C),
                f"{base}.attn.w_msa.proj.bias": t(C),
                f"{base}.attn.w_msa.relative_position_bias_table":
                    t((2 * WINDOW - 1) ** 2, h),
                f"{base}.norm2.weight": 1 + 0.1 * t(C),
                f"{base}.norm2.bias": t(C),
                f"{base}.ffn.layers.0.0.weight": t(4 * C, C),
                f"{base}.ffn.layers.0.0.bias": t(4 * C),
                f"{base}.ffn.layers.1.weight": t(C, 4 * C),
                f"{base}.ffn.layers.1.bias": t(C),
            })
        if si < 3:
            ds = f"stages.{si}.downsample"
            state.update({
                f"{ds}.norm.weight": 1 + 0.1 * t(4 * C),
                f"{ds}.norm.bias": t(4 * C),
                f"{ds}.reduction.weight": t(2 * C, 4 * C),
            })
    for i, c in enumerate((96, 192, 384, 768)):
        state[f"norm{i}.weight"] = 1 + 0.1 * t(c)
        state[f"norm{i}.bias"] = t(c)
    return state


def _torch_rel_position_index(w):
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def test_swin_strict_load_full_coverage():
    state = _synthetic_mmdet_swin_state()
    model = SwinTransformer(arch="tiny")
    x = jnp.zeros((1, 56, 56, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    loaded = load_mmdet_swin_state_dict(dict(v), state, arch="tiny",
                                        strict=True)
    outs = model.apply({"params": loaded["params"]}, x)
    assert [o.shape[-1] for o in outs] == [96, 192, 384, 768]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_swin_window_attention_matches_torch():
    """WindowMSA restated in torch == flax WindowAttention on the
    converted weights (qkv/proj transposes + rel-bias index order)."""
    state = _synthetic_mmdet_swin_state()
    params = convert_mmdet_swin(state, arch="tiny")
    C, H = 96, 3
    N = WINDOW * WINDOW
    rng = np.random.RandomState(3)
    x = rng.randn(2, N, C).astype(np.float32)

    flax_out = WindowAttention(dim=C, num_heads=H).apply(
        {"params": params["stage0_block0"]["attn"]}, jnp.asarray(x))

    xt = torch.from_numpy(x)
    qkvw = state["stages.0.blocks.0.attn.w_msa.qkv.weight"]
    qkvb = state["stages.0.blocks.0.attn.w_msa.qkv.bias"]
    projw = state["stages.0.blocks.0.attn.w_msa.proj.weight"]
    projb = state["stages.0.blocks.0.attn.w_msa.proj.bias"]
    table = state[
        "stages.0.blocks.0.attn.w_msa.relative_position_bias_table"]
    hd = C // H
    qkv = (xt @ qkvw.T + qkvb).reshape(2, N, 3, H, hd).permute(
        2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    idx = _torch_rel_position_index(WINDOW)
    bias = table[idx.view(-1)].view(N, N, H).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(2, N, C) @ projw.T + projb

    np.testing.assert_allclose(np.asarray(flax_out), out.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_swin_patch_merging_matches_torch():
    """mmdet PatchMerging (nn.Unfold(2,2) -> LN -> Linear) == flax
    PatchMerging on the converted stage-0 downsample weights."""
    state = _synthetic_mmdet_swin_state()
    params = convert_mmdet_swin(state, arch="tiny")
    rng = np.random.RandomState(5)
    x = rng.randn(2, 8, 8, 96).astype(np.float32)

    flax_out = PatchMerging(out_dim=192).apply(
        {"params": params["merge1"]}, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)       # NCHW
    u = torch.nn.functional.unfold(xt, kernel_size=2, stride=2)
    u = u.transpose(1, 2)                              # (B, L, 4C)
    nw = state["stages.0.downsample.norm.weight"]
    nb = state["stages.0.downsample.norm.bias"]
    u = torch.nn.functional.layer_norm(u, (384,), nw, nb, eps=1e-5)
    red = state["stages.0.downsample.reduction.weight"]
    out = (u @ red.T).reshape(2, 4, 4, 192)

    np.testing.assert_allclose(np.asarray(flax_out), out.numpy(),
                               rtol=2e-4, atol=2e-5)
