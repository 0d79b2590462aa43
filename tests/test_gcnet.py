"""GCNet ContextBlock (models/plugins.py; configs/gcnet parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.plugins import ContextBlock


def test_context_block_identity_at_init():
    """Zero-init fusion convs => the block is exactly the identity at
    init (mmcv last_zero_init contract — pretrained backbones are
    undisturbed when the plugin is inserted)."""
    m = ContextBlock(ratio=0.25)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 8, 8, 32).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x),
                               rtol=0, atol=0)


def test_context_block_attention_pooling_oracle():
    """With a trained (non-zero) transform, the output must equal
    x + fc2(relu(ln(fc1(ctx)))) where ctx is the softmax-attention-pooled
    input — checked against a direct numpy restatement."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 16).astype(np.float32)
    m = ContextBlock(ratio=0.5)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # give the zero fc2 real weights
    params = jax.tree.map(lambda a: a, v["params"])
    params["channel_add_fc2"]["kernel"] = jnp.asarray(
        rng.randn(*params["channel_add_fc2"]["kernel"].shape)
        .astype(np.float32) * 0.1)
    out = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    # numpy restatement
    wm = np.asarray(params["conv_mask"]["kernel"])[0, 0]      # (C, 1)
    bm = np.asarray(params["conv_mask"]["bias"])
    w1 = np.asarray(params["channel_add_fc1"]["kernel"])[0, 0]
    b1 = np.asarray(params["channel_add_fc1"]["bias"])
    ws = np.asarray(params["channel_add_ln"]["scale"])
    wb = np.asarray(params["channel_add_ln"]["bias"])
    w2 = np.asarray(params["channel_add_fc2"]["kernel"])[0, 0]
    b2 = np.asarray(params["channel_add_fc2"]["bias"])
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C)
    logit = xf @ wm + bm                                       # (B, HW, 1)
    att = np.exp(logit - logit.max(1, keepdims=True))
    att = att / att.sum(1, keepdims=True)
    ctx = (xf * att).sum(1)                                    # (B, C)
    t = ctx @ w1 + b1
    mu, var = t.mean(-1, keepdims=True), t.var(-1, keepdims=True)
    t = (t - mu) / np.sqrt(var + 1e-6) * ws + wb
    t = np.maximum(t, 0) @ w2 + b2
    ref = x + t[:, None, None, :]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_context_block_channel_mul():
    """channel_mul fusion gates by sigmoid; zero-init => gate 0.5."""
    m = ContextBlock(ratio=0.25, fusion_types=("channel_mul",))
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)),
                               0.5 * np.ones((1, 4, 4, 8)), rtol=1e-6)


def test_resnet_gcb_stages_shapes_and_grads():
    from dskd_tpu.models.resnet import ResNet

    m = ResNet(depth=50, gcb_stages=(False, True, True, True),
               frozen_stages=-1)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    gcb_keys = [p for p, _ in flat if "gcb" in jax.tree_util.keystr(p)]
    assert gcb_keys, "no ContextBlock params created"
    # stage 1 (layer1) must NOT carry gcb
    assert not any("layer1_" in jax.tree_util.keystr(p) for p in gcb_keys)
    assert any("layer4_" in jax.tree_util.keystr(p) for p in gcb_keys)

    bs = {k: val for k, val in v.items() if k != "params"}
    g = jax.grad(lambda p: sum(
        o.sum() for o in m.apply({"params": p, **bs}, x)))(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
