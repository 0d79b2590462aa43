"""GeneralizedAttention backbone plugin (models/plugins.py;
configs/empirical_attention parity) + GRoIE aggregation module
(models/faster_rcnn.py GRoIE; configs/groie parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.plugins import GeneralizedAttention


def _x(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(*shape).astype(np.float32))


def test_identity_at_init_all_types():
    """Zero-init output projection => inserting the block leaves a
    pretrained backbone undisturbed (last_zero_init convention)."""
    x = _x((2, 8, 10, 32))
    for t in ("1111", "0010", "0100", "1000", "0001"):
        m = GeneralizedAttention(num_heads=4, attention_type=t)
        v = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m.apply(v, x)),
                                   np.asarray(x), rtol=0, atol=0, err_msg=t)


def test_param_sets_follow_attention_bits():
    """'0010' (saliency only) must not create query/geometry params;
    '0100' must not create key/appr params."""
    x = _x((1, 6, 6, 16))

    def names(t):
        m = GeneralizedAttention(num_heads=2, attention_type=t)
        return set(m.init(jax.random.PRNGKey(0), x)["params"].keys())

    n0010 = names("0010")
    assert "key_conv" in n0010 and "appr_bias" in n0010
    assert "query_conv" not in n0010 and "geom_fc_x" not in n0010
    n0100 = names("0100")
    assert "query_conv" in n0100 and "geom_fc_x" in n0100
    assert "key_conv" not in n0100 and "appr_bias" not in n0100


def test_saliency_0010_numpy_oracle():
    """'0010' keeps only the key-content (saliency) energy: attention is
    query-independent, checked against a direct numpy restatement."""
    rng = np.random.RandomState(3)
    B, H, W, C, nh = 2, 6, 8, 16, 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    m = GeneralizedAttention(num_heads=nh, attention_type="0010",
                             kv_stride=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(v["params"])
    params["proj_conv"] = {
        "kernel": jnp.asarray(
            rng.randn(1, 1, C, C).astype(np.float32) * 0.1),
        "bias": jnp.zeros((C,), jnp.float32)}
    out = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    dk = C // nh
    kv = x[:, ::2, ::2].reshape(B, -1, C)                  # (B, K, C)
    wk = np.asarray(params["key_conv"]["kernel"])[0, 0]    # (C, nh*dk)
    wv = np.asarray(params["value_conv"]["kernel"])[0, 0]
    u = np.asarray(params["appr_bias"])                    # (nh, dk)
    k = (kv @ wk).reshape(B, -1, nh, dk).transpose(0, 2, 1, 3)
    vv = (kv @ wv).reshape(B, -1, nh, dk).transpose(0, 2, 1, 3)
    e = np.einsum("hd,bhkd->bhk", u / np.sqrt(dk), k)
    a = np.exp(e - e.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)                          # (B, nh, K)
    o = np.einsum("bhk,bhkd->bhd", a, vv)                  # (B, nh, dk)
    o = np.broadcast_to(o.reshape(B, 1, 1, C),
                        (B, H, W, C))
    wp = np.asarray(params["proj_conv"]["kernel"])[0, 0]
    ref = x + o @ wp
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_full_1111_shapes_and_grads():
    """All four energy terms: finite output, and every param receives a
    gradient once proj is non-zero (value path always flows)."""
    x = _x((2, 7, 5, 24), seed=1)
    m = GeneralizedAttention(num_heads=3, attention_type="1111",
                             kv_stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    params = dict(v["params"])
    params["proj_conv"] = {
        "kernel": jnp.asarray(np.random.RandomState(2).randn(
            1, 1, 24, 24).astype(np.float32) * 0.1),
        "bias": jnp.zeros((24,), jnp.float32)}

    def loss(p):
        return (m.apply({"params": p}, x) ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    assert all(np.isfinite(np.asarray(a)).all() for _, a in leaves)
    zero = [jax.tree_util.keystr(p) for p, a in leaves
            if float(jnp.abs(a).max()) == 0.0]
    assert not zero, zero


def test_resnet_gen_attn_stage_placement():
    from dskd_tpu.models.resnet import ResNet
    m = ResNet(depth=50, gen_attn_stages=(False, False, True, True),
               gen_attn_type="0010", out_indices=(0, 1, 2, 3))
    x = _x((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    keys = [jax.tree_util.keystr(p) for p, _ in flat if "gen_attn" in
            jax.tree_util.keystr(p)]
    assert keys, "no GeneralizedAttention params created"
    assert not any("layer1_" in k or "layer2_" in k for k in keys)
    assert any("layer3_" in k for k in keys)
    assert any("layer4_" in k for k in keys)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 256), (1, 8, 8, 512),
                                       (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_groie_shapes_and_identity_post():
    """GRoIE sums the per-level pre-conv features; at init the post
    attention is an identity, so output == relu(pre(levels)).sum."""
    from dskd_tpu.models.faster_rcnn import GRoIE
    lvl = _x((3, 4, 7, 7, 16), seed=5)
    m = GRoIE(channels=16, post_heads=2)
    v = m.init(jax.random.PRNGKey(0), lvl)
    out = m.apply(v, lvl)
    assert out.shape == (3, 7, 7, 16)
    wk = np.asarray(v["params"]["pre_conv"]["kernel"])
    # conv each level independently with numpy via jax (reuse module conv
    # through lax to avoid re-deriving padding): just assert the sum
    # structure -- doubling one level's features changes the output by
    # exactly the relu'd pre-conv of the delta when biases are zero
    import flax.linen as nn
    pre = nn.Conv(16, (5, 5), padding=[(2, 2), (2, 2)])
    pv = {"params": {"kernel": jnp.asarray(wk),
                     "bias": jnp.asarray(
                         v["params"]["pre_conv"]["bias"])}}
    R, L, o, _, C = lvl.shape
    ref = nn.relu(pre.apply(pv, lvl.reshape(R * L, o, o, C))) \
        .reshape(R, L, o, o, 16).sum(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_all_level_roi_align_matches_per_level():
    from dskd_tpu.ops.roi_align import all_level_roi_align, roi_align
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(16 // (2 ** i), 16 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    rois = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0],
                                 [0.0, 0.0, 63.0, 63.0]], np.float32))
    valid = jnp.asarray(np.array([1.0, 0.0], np.float32))
    out = all_level_roi_align(feats, rois, valid)
    assert out.shape == (2, 4, 7, 7, 8)
    for i in range(4):
        ref = roi_align(feats[i], rois, 7, spatial_scale=1.0 / (4 * 2 ** i))
        np.testing.assert_allclose(np.asarray(out[0, i]),
                                   np.asarray(ref[0]), rtol=1e-5,
                                   atol=1e-5)
    assert float(jnp.abs(out[1]).max()) == 0.0
