"""TridentNet + DetectoRS backbones: weight sharing, SAC init identity,
RFP recursion shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.detectors_rs import (RFP, ASPP, DetectoRSResNet,
                                          SAConv)
from dskd_tpu.models.trident import TridentResNet


def test_trident_branches_share_weights():
    m = TridentResNet(depth=50)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 64, 64, 3).astype(np.float32) * 0.1)
    v = m.init(jax.random.PRNGKey(0), x, True)
    # ONE shared kernel per trident block (no per-branch copies)
    l4 = v["params"]["layer4_block0"]
    assert "conv2_kernel" in l4
    outs = m.apply(v, x, True)
    branches = outs[-1]
    assert len(branches) == 3
    assert all(b.shape == branches[0].shape for b in branches)
    # test mode: single branch (dilation 2), SAME params apply
    outs_t = m.apply(v, x, False)
    assert len(outs_t[-1]) == 1
    # the test branch (dilation 2) must equal train branch index 1 exactly
    np.testing.assert_allclose(np.asarray(outs_t[-1][0]),
                               np.asarray(branches[1]), rtol=1e-5,
                               atol=1e-5)


def test_sac_init_is_plain_conv():
    """Zero-init delta/switch/contexts: SAC = 0.5*conv_d1 + 0.5*conv_d3
    on the same kernel; with a CONSTANT input both dilations see the same
    field, so SAC(x) == conv3x3(x) exactly in the interior."""
    rng = np.random.RandomState(0)
    x = jnp.ones((1, 9, 9, 4)) * 0.3
    m = SAConv(6)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    w = v["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out)[:, 3:-3, 3:-3],
                               np.asarray(ref)[:, 3:-3, 3:-3], rtol=1e-5,
                               atol=1e-6)


def test_detectors_rfp_shapes_and_recursion():
    m = RFP(out_channels=64, num_outs=5, depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    # two backbone steps exist: main + one recursion module
    assert "backbone" in v["params"] and "rfp_backbone0" in v["params"]
    # rfp residual hooks exist on stages 2-4 first blocks
    assert "rfp_conv" in v["params"]["rfp_backbone0"]["layer2_block0"]
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 64), (1, 4, 4, 64), (1, 2, 2, 64),
        (1, 1, 1, 64)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_aspp_width():
    a = ASPP(64)
    x = jnp.zeros((1, 8, 8, 64))
    v = a.init(jax.random.PRNGKey(0), x)
    assert a.apply(v, x).shape == (1, 8, 8, 64)


def test_detectors_cascade_eval_step_runs():
    """The full DetectoRS recipe (rfp+sac) is driveable end-to-end: the
    cascade eval path decodes through the recursive pyramid."""
    import dataclasses
    import os

    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.utils.config import load_config

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "detectors_cascade_rcnn_r50_1x.py")
    cfg = load_config(path)
    cfg.model = dataclasses.replace(cfg.model, depth=18)
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64), max_gt=4,
                                   aspect_buckets=None, multi_scales=None)
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    model = build_model(cfg)
    assert model.rfp and model.sac
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    # SAC params present in BOTH backbone passes of the pyramid
    bb = variables["params"]["rfp_pyramid"]["backbone"]
    assert "weight_diff" in bb["layer2_block0"]["conv2"]
    assert "rfp_conv" in variables["params"]["rfp_pyramid"][
        "rfp_backbone0"]["layer2_block0"]

    eval_step = make_eval_step(model, max_per_img=10,
                               arch=cfg.model.arch)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[64, 64]], (2, 1)).astype(np.int32))
    det = eval_step(variables, images, img_hw,
                    jnp.ones((2, 4), jnp.float32))
    assert det.bboxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_detectors_resnext_grouping():
    """groups=32 base_width=4: conv2 kernels are grouped and widths scale
    per detectors_resnext.py (width = planes*4/64*32 = 2*planes)."""
    m = DetectoRSResNet(depth=18, groups=32, base_width=4)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    k = v["params"]["layer2_block0"]["conv2"]["kernel"]
    # stage 2 planes=128 -> width 256; grouped in_channels 256/32=8
    assert k.shape == (3, 3, 8, 256), k.shape
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
