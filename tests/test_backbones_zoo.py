"""RegNet / EfficientNet / HRNet backbones: schedules, shapes, params.

Oracles are the published architecture invariants:
  * RegNetX-3.2GF schedule (regnet.py arch table): stage widths
    96/192/432/1008, depths 2/6/15/2, group width 48; backbone params
    (no classifier) ~14.3M.
  * EfficientNet-B3 stride-8/16/32 channels 48/136/384 (the in_channels of
    the reference's retinanet_effb3 FPN).
  * HRNetV2p-W18 branch channels 18/36/72/144 at strides 4/8/16/32;
    backbone params ~9.6M.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.models.efficientnet import EfficientNet
from dskd_tpu.models.hrnet import HRFPN, HRNet
from dskd_tpu.models.regnet import (RegNet, adjust_width_group,
                                    generate_regnet)


def _n_params(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def test_regnet_schedule_3_2gf():
    widths, depths = generate_regnet(88, 26.31, 2.25, 25)
    widths, groups = adjust_width_group(widths, 48)
    assert widths == (96, 192, 432, 1008)
    assert depths == (2, 6, 15, 2)
    assert all(w % g == 0 for w, g in zip(widths, groups))


def test_regnet_forward_and_params():
    m = RegNet(arch="regnetx_3.2gf")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # stem /2 then every stage downsamples: strides 4/8/16/32
    assert [o.shape for o in outs] == [
        (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 432),
        (1, 2, 2, 1008)]
    n = _n_params(v["params"])
    assert 13.5e6 < n < 15.0e6, n          # pycls: 14.3M w/o classifier


def test_efficientnet_b3_channels():
    assert EfficientNet.stage_channels("b3") == (48, 136, 384)
    m = EfficientNet(arch="b3")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 48), (1, 4, 4, 136), (1, 2, 2, 384)]
    n = _n_params(v["params"])
    assert 9.0e6 < n < 11.5e6, n           # B3 minus head conv/classifier


def test_hrnet_w18_branches_and_hrfpn():
    m = HRNet(width=18)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144)]
    n = _n_params(v["params"])
    assert 8.5e6 < n < 10.5e6, n           # HRNetV2p-W18 ~9.6M

    neck = HRFPN(out_channels=64, num_outs=5)
    nv = neck.init(jax.random.PRNGKey(1), outs)
    fpn_outs = neck.apply(nv, outs)
    assert [o.shape for o in fpn_outs] == [
        (1, 16, 16, 64), (1, 8, 8, 64), (1, 4, 4, 64), (1, 2, 2, 64),
        (1, 1, 1, 64)]


@pytest.mark.parametrize("spec,arch", [("regnetx_3.2gf", "retinanet"),
                                       ("effb3", "retinanet"),
                                       ("hrnet_w18", "fcos")])
def test_detector_with_zoo_backbone(spec, arch):
    """End-to-end forward of the reference pairings."""
    if arch == "retinanet":
        from dskd_tpu.models.retinanet import RetinaNet
        model = RetinaNet(num_classes=6, backbone=spec)
    else:
        from dskd_tpu.models.fcos import FCOS
        model = FCOS(num_classes=6, backbone=spec)
    x = jnp.zeros((1, 64, 64, 3))
    hw = jnp.array([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x, hw)
    out = model.apply(v, x, hw)
    assert len(out.head.cls_scores) == 5
    # retinanet heads emit anchors*classes channels, fcos emits classes
    per_cell = 9 * 6 if arch == "retinanet" else 6
    assert out.head.cls_scores[0].shape[-1] == per_cell


def test_resnest50_shapes_and_params():
    from dskd_tpu.models.resnest import ResNeSt
    m = ResNeSt(depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
        (1, 2, 2, 2048)]
    n = _n_params(v["params"])
    # resnest50 25.4M total minus 2.05M classifier ~ 23.4M; split-attn fc
    # layout differences keep it within a loose band
    assert 20e6 < n < 28e6, n


def test_pvt_tiny_shapes():
    from dskd_tpu.models.pvt import PVT
    m = PVT(arch="tiny")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 320), (1, 2, 2, 512)]
    n = _n_params(v["params"])
    assert 10e6 < n < 16e6, n      # PVT-tiny ~13M w/o classifier


def test_retinanet_with_resnest_and_pvt():
    from dskd_tpu.models.retinanet import RetinaNet
    for spec in ("resnest50", "pvt_tiny"):
        model = RetinaNet(num_classes=6, backbone=spec)
        x = jnp.zeros((1, 64, 64, 3))
        hw = jnp.array([[64, 64]], jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x, hw)
        out = model.apply(v, x, hw)
        assert len(out.head.cls_scores) == 5, spec


def test_efficientnet_drop_path():
    """Stochastic depth: linear-scaled drop_path is stochastic at train
    time and an identity at eval (reference efficientnet.py:335 +
    retinanet_effb3 config drop_path_rate=0.2)."""
    m = EfficientNet(arch="b0", drop_path_rate=0.5)
    x = jnp.ones((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    e1 = m.apply(v, x)[-1]
    e2 = m.apply(v, x)[-1]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))  # eval det
    # train mode also runs BN in batch-stat mode (norm_eval=False per the
    # retinanet_effb3 recipe) — batch_stats must be mutable
    t1, _ = m.apply(v, x, deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
    t2, _ = m.apply(v, x, deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
    t1, t2 = t1[-1], t2[-1]
    # freshly-initialized outputs are tiny in magnitude — compare
    # relative to the signal scale
    diff = np.abs(np.asarray(t1) - np.asarray(t2)).max()
    assert diff > 0.01 * np.abs(np.asarray(t1)).max()


def test_pvt_drop_path_and_v1_protocol():
    """PVT v1: stochastic depth at train (pvt.py:426 default 0.1), no
    per-stage out-norm (norm_after_stage=False -> Identity, pvt.py:519)."""
    from dskd_tpu.models.pvt import PVT
    m = PVT(arch="tiny", drop_path_rate=0.5)
    x = jnp.ones((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert not any(k.startswith("out_norm") for k in v["params"])
    e1 = m.apply(v, x)[-1]
    e2 = m.apply(v, x)[-1]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1 = m.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})[-1]
    t2 = m.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})[-1]
    diff = np.abs(np.asarray(t1) - np.asarray(t2)).max()
    assert diff > 0.01 * np.abs(np.asarray(t1)).max()
