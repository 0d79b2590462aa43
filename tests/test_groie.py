"""GRoIE end-to-end: the configs/groie Faster R-CNN variant trains one
step through the family wiring (the generic extractor's pre/post params
move under plain SGD, i.e. receive gradients) and the eval path decodes
through the all-level extractor."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _cfg():
    import os

    from dskd_tpu.utils.config import load_config
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "faster_rcnn_r50_groie_1x.py")
    cfg = load_config(path)
    cfg.model = dataclasses.replace(cfg.model, depth=18)
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64), max_gt=4,
                                   samples_per_device=1,
                                   aspect_buckets=None, multi_scales=None)
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    return cfg


def _batch(H=64, W=64, B=2, nc=80):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 6
    gtb = np.concatenate([xy, xy + wh], -1)
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, nc, (B, 4)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(4) < 2, (B, 1))))


def test_groie_train_step_moves_extractor_params():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.train.state import TrainState

    cfg = _cfg()
    model = build_model(cfg)
    assert model.groie
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert "roi_extractor" in variables["params"], \
        list(variables["params"].keys())

    step = make_family_train_step(cfg.model.arch, model, cfg, num_prev=1,
                                  has_teacher=False, use_dropout=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.sgd(0.05), jax.random.PRNGKey(1))
    before = jax.tree.map(
        lambda a: np.asarray(a).copy(), variables["params"]["roi_extractor"])
    new_state, losses = step(state, _batch(), None)
    assert np.isfinite(float(losses["loss"])), losses
    after = new_state.params["roi_extractor"]
    d_pre = float(jnp.abs(after["pre_conv"]["kernel"]
                          - before["pre_conv"]["kernel"]).max())
    assert d_pre > 0.0, "pre-conv got no gradient"
    # post attention value path must flow too (proj is zero-init so the
    # proj kernel itself is the first mover there)
    d_post = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(after["post_attn"]),
            jax.tree_util.tree_leaves(before["post_attn"])))
    assert d_post > 0.0, "post attention got no gradient"


def test_groie_eval_step_runs():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.incremental import build_model, init_variables

    cfg = _cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model, max_per_img=10, arch=cfg.model.arch)
    b = _batch()
    sf = jnp.ones((2, 4), jnp.float32)
    det = eval_step(variables, b.images, b.img_hw, sf)
    assert det.bboxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.scores)).all()
