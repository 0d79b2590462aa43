"""The incremental training driver (parity: tools/train_increment.py).

Task loop (SURVEY §3.1):
  * derive per-task class loads: identity matrix rows for train,
    lower-triangular rows for val ('auto' mode, train_increment.py:189-199);
  * task 1 trains plain detection; each later task promotes the previous
    student to a frozen teacher (pure pytree copy) and trains the student
    with the distillation recipe on that task's class slice;
  * per-task optimizer/schedule; task-aware Orbax checkpoints
    (task_{t}_epoch_{e}); resume_by_task skips completed tasks.

TPU-native: the model is built once; "set_teacher" is a params copy;
"set_datainfo" is a static num_prev integer baked into that task's compiled
step (prev classes occupy labels [0, num_prev) by the alphabetical split).
"""
from __future__ import annotations

import copy
import logging
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import TaskCocoDataset
from ..data.loader import DataLoader
from ..data.pipeline import PipelineConfig
from ..eval.evaluator import evaluate
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.config import ExperimentConfig
from .checkpoint import (find_latest_checkpoint, restore_checkpoint,
                         save_checkpoint)
from .optim import make_optimizer
from .schedule import step_lr_schedule
from .state import TrainState
from .step import Batch

from ..registry import family_data_flag, family_flag  # noqa: E402

log = logging.getLogger("dskd_tpu")


def build_model(cfg: ExperimentConfig):
    """Model registry dispatch (replaces the mmdet DETECTORS registry,
    reference mmdet/models/builder.py:59): every family's build factory
    lives in its own model module (dskd_tpu/registry.py)."""
    from ..registry import get_family
    spec = get_family(cfg.model.arch)
    if spec is None:
        raise ValueError(f"unknown arch: {cfg.model.arch}")
    return spec["build"](cfg)


def build_teacher_model(cfg: ExperimentConfig):
    """The frozen teacher's module: identical to the student unless
    ``model.teacher_depth`` names a different backbone depth (the
    configs/ld and configs/lad recipes distill an r18/r50 student from an
    r101 teacher — kd_one_stage.py/lad.py build the teacher from its own
    config file)."""
    td = cfg.model.teacher_depth
    if not td or td == cfg.model.depth:
        return build_model(cfg)
    import copy as _cp
    import dataclasses as _dc
    tcfg = _cp.copy(cfg)
    tcfg.model = _dc.replace(cfg.model, depth=td)
    return build_model(tcfg)


def init_variables(model, cfg: ExperimentConfig, rng):
    H, W = cfg.data.bucket
    images = jnp.zeros((1, H, W, 3), jnp.float32)
    img_hw = jnp.array([[H, W]], jnp.int32)
    if family_flag(cfg.model.arch, "init_all"):
        # two-stage: trace the ROI head(s) too so init creates their params
        variables = model.init(rng, images, img_hw,
                               method=type(model).init_all)
    else:
        variables = model.init(rng, images, img_hw)
    if cfg.model.backbone_ckpt:
        from ..utils.torch_weights import load_resnet_weights
        variables = load_resnet_weights(variables, cfg.model.backbone_ckpt)
    return dict(variables)


def make_datasets(cfg: ExperimentConfig, tid: int, task_nums: int):
    """Task tid (1-based): train loads only task tid's classes; val loads
    all classes up to tid (the identity / tril rows).

    Non-coco ``dataset_type`` bindings (voc / wider_face / lvis /
    openimages) are single-task: the reference never trains them
    incrementally, so the task machinery reduces to load-everything."""
    dt = cfg.data.dataset_type
    if dt in ("hlkt", "wrxt"):
        # COCO-format private military datasets (hlkt.py/wrxt.py) — the
        # reference trains them incrementally, so they keep the full task
        # machinery; class order is their given tuple order
        from ..data.military import HLKTDataset, WRXTDataset
        cls = HLKTDataset if dt == "hlkt" else WRXTDataset
        train_load = [1 if i == tid - 1 else 0 for i in range(task_nums)]
        val_load = [1 if i <= tid - 1 else 0 for i in range(task_nums)]
        return (cls(cfg.data.train_ann, cfg.data.train_img_prefix,
                    catsplit=cfg.data.catsplit, catload=train_load,
                    catpred=cfg.data.catpred,
                    imgpercent=cfg.data.imgpercent),
                cls(cfg.data.val_ann, cfg.data.val_img_prefix,
                    catsplit=cfg.data.catsplit, catload=val_load,
                    catpred=cfg.data.catpred, test_mode=True))
    if dt != "coco":
        if task_nums != 1:
            raise ValueError(f"dataset_type={dt!r} is single-task; "
                             f"got catsplit={cfg.data.catsplit}")
        if dt == "voc":
            from ..data.voc import VOCDataset
            return (VOCDataset(cfg.data.data_root, cfg.data.train_split,
                               year=cfg.data.voc_year),
                    VOCDataset(cfg.data.data_root, cfg.data.val_split,
                               year=cfg.data.voc_year, test_mode=True,
                               filter_empty=False))
        if dt == "wider_face":
            from ..data.voc import WIDERFaceDataset
            return (WIDERFaceDataset(cfg.data.data_root,
                                     cfg.data.train_split),
                    WIDERFaceDataset(cfg.data.data_root, cfg.data.val_split,
                                     test_mode=True, filter_empty=False))
        if dt == "lvis":
            from ..data.lvis import LvisDataset
            return (LvisDataset(cfg.data.train_ann,
                                cfg.data.train_img_prefix),
                    LvisDataset(cfg.data.val_ann, cfg.data.val_img_prefix,
                                test_mode=True, filter_empty=False))
        if dt == "cityscapes":
            from ..data.cityscapes import CityscapesDataset
            return (CityscapesDataset(cfg.data.train_ann,
                                      cfg.data.train_img_prefix),
                    CityscapesDataset(cfg.data.val_ann,
                                      cfg.data.val_img_prefix,
                                      test_mode=True))
        if dt == "openimages":
            from ..data.openimages import OpenImagesDataset
            return (OpenImagesDataset(cfg.data.train_ann,
                                      cfg.data.cls_desc_file,
                                      cfg.data.train_img_prefix,
                                      cfg.data.hierarchy_file or None),
                    OpenImagesDataset(cfg.data.val_ann,
                                      cfg.data.cls_desc_file,
                                      cfg.data.val_img_prefix,
                                      cfg.data.hierarchy_file or None,
                                      test_mode=True))
        raise ValueError(f"unknown dataset_type: {dt!r}")
    train_load = [1 if i == tid - 1 else 0 for i in range(task_nums)]
    val_load = [1 if i <= tid - 1 else 0 for i in range(task_nums)]
    custom = (tuple(cfg.data.classes) if cfg.data.classes else None)
    train_ds = TaskCocoDataset(
        cfg.data.train_ann, cfg.data.train_img_prefix,
        catsplit=cfg.data.catsplit, catload=train_load,
        catpred=cfg.data.catpred, imgpercent=cfg.data.imgpercent,
        seg_prefix=cfg.data.seg_prefix, classes=custom)
    val_ds = TaskCocoDataset(
        cfg.data.val_ann, cfg.data.val_img_prefix,
        catsplit=cfg.data.catsplit, catload=val_load,
        catpred=cfg.data.catpred, test_mode=True, classes=custom)
    return train_ds, val_ds


def train_one_task(model, cfg: ExperimentConfig, tid: int, task_nums: int,
                   variables, teacher_variables, mesh):
    """Train task ``tid``; returns the trained variables."""
    train_ds, val_ds = make_datasets(cfg, tid, task_nums)
    num_prev = sum(cfg.data.catsplit[:tid - 1])

    pipe = PipelineConfig(
        img_scale=cfg.data.img_scale, flip_ratio=cfg.data.flip_ratio,
        max_gt=cfg.data.max_gt, bucket=cfg.data.bucket,
        multi_scales=cfg.data.multi_scales,
        photo_metric_distortion=cfg.data.photo_metric_distortion,
        mosaic=cfg.data.mosaic, mixup=cfg.data.mixup,
        auto_augment=cfg.data.auto_augment,
        expand=cfg.data.expand, min_iou_crop=cfg.data.min_iou_crop,
        resize_ratio_range=cfg.data.resize_ratio_range,
        random_crop=cfg.data.random_crop,
        with_mask=family_data_flag(cfg.model.arch, "with_mask", cfg),
        with_semantic=family_data_flag(cfg.model.arch, "with_semantic",
                                       cfg))
    global_batch = cfg.data.samples_per_device * len(mesh.devices.flatten())
    loader = DataLoader(train_ds, global_batch, pipe, train=True,
                        seed=cfg.train.seed + tid,
                        num_workers=cfg.data.num_workers,
                        num_hosts=jax.process_count(),
                        host_id=jax.process_index(),
                        aspect_buckets=cfg.data.aspect_buckets,
                        gt_buckets=cfg.data.gt_buckets)
    iters_per_epoch = max(len(loader), 1)

    if cfg.train.lr_policy == "yolox_cosine":
        from .schedule import yolox_cosine_schedule
        ep = (cfg.train.epochs_per_task
              if cfg.train.max_iters_per_task <= 0 else
              -(-cfg.train.max_iters_per_task // iters_per_epoch))
        sched = yolox_cosine_schedule(
            cfg.train.base_lr, cfg.train.warmup_iters,
            total_iters=ep * iters_per_epoch,
            last_iters=cfg.train.no_aug_epochs * iters_per_epoch,
            min_lr_ratio=cfg.train.min_lr_ratio)
    else:
        sched = step_lr_schedule(cfg.train.base_lr, cfg.train.warmup_iters,
                                 cfg.train.warmup_ratio,
                                 cfg.train.step_epochs, iters_per_epoch)
    tx = make_optimizer(variables["params"], sched,
                        weight_decay=cfg.train.weight_decay,
                        max_norm=cfg.train.grad_clip,
                        frozen_stages=cfg.model.frozen_stages)
    state = TrainState.create(
        replicate(variables["params"], mesh),
        replicate(variables.get("batch_stats", {}), mesh), tx,
        jax.random.PRNGKey(cfg.train.seed + 131 * tid))
    if cfg.train.fsdp:
        # ZeRO-style: params + AdamW moments sharded over the data axis
        # (parallel/fsdp.py) — same numerics, ~Nx less state HBM per chip
        from ..parallel.fsdp import shard_state_fsdp
        state = shard_state_fsdp(state, mesh)

    teacher_vars = None
    if teacher_variables is not None:
        # the frozen teacher carries ITS OWN batch_stats (promotion
        # snapshots the student's; an external teacher keeps the ones it
        # was loaded with) — reference set_teacher freezes the whole module
        teacher_vars = replicate(
            {"params": teacher_variables["params"],
             "batch_stats": teacher_variables.get("batch_stats", {})}, mesh)

    from .family import make_family_train_step
    step_fn = make_family_train_step(
        cfg.model.arch, model, cfg, num_prev,
        has_teacher=teacher_variables is not None,
        use_dropout=cfg.train.use_dropout)

    log.info("Task %d: %d train imgs, %d iters/epoch, num_prev=%d, "
             "teacher=%s", tid, len(train_ds), iters_per_epoch, num_prev,
             teacher_variables is not None)

    from ..utils.logging import MetricsLogger
    from .hooks import (assert_loss_keys_consistent, check_invalid_loss,
                        ema_update)
    metrics = MetricsLogger(cfg.train.work_dir
                            if jax.process_index() == 0 else None)

    eval_threads = []
    ema_params = None
    ema_step_fn = None
    if cfg.train.use_ema:
        ema_params = jax.tree.map(jnp.copy, state.params)
        ema_step_fn = jax.jit(lambda e, p, s: ema_update(
            e, p, s, momentum=cfg.train.ema_momentum))

    # iter-based schedule (IterBasedRunner + InfiniteSampler): slice an
    # endless reshuffled stream into iters_per_epoch-sized virtual epochs
    if cfg.train.max_iters_per_task > 0:
        import itertools
        total_iters = cfg.train.max_iters_per_task
        n_epochs = -(-total_iters // iters_per_epoch)
        stream = loader.infinite()

        def epoch_batches(e):
            k = min(iters_per_epoch, total_iters - (e - 1) * iters_per_epoch)
            return itertools.islice(stream, k)
    else:
        n_epochs = cfg.train.epochs_per_task

        def epoch_batches(e):
            return iter(loader)

    no_aug_switched = False
    for epoch in range(1, n_epochs + 1):
        # YOLOXModeSwitchHook: last no_aug_epochs train without Mosaic/MixUp
        if (cfg.train.no_aug_epochs and not no_aug_switched
                and (pipe.mosaic or pipe.mixup)
                and epoch > n_epochs - cfg.train.no_aug_epochs):
            no_aug_switched = True
            import dataclasses
            loader.pipeline = dataclasses.replace(
                loader.pipeline, mosaic=False, mixup=False)
            log.info("task %d epoch %d: mosaic/mixup OFF (no-aug phase)",
                     tid, epoch)
            if cfg.model.arch == "yolox":
                # YOLOXModeSwitchHook also turns the L1 branch on
                step_fn = make_family_train_step(
                    cfg.model.arch, model, cfg, num_prev,
                    has_teacher=teacher_variables is not None,
                    use_dropout=cfg.train.use_dropout, use_l1=True)
        t0, n_img = time.time(), 0
        for it, (batch, _meta) in enumerate(epoch_batches(epoch)):
            batch = shard_batch(Batch(*(None if x is None else
                                        jnp.asarray(x) for x in batch)),
                                mesh)
            state, losses = step_fn(state, batch, teacher_vars)
            if ema_params is not None:
                ema_params = ema_step_fn(ema_params, state.params,
                                         state.step)
            n_img += batch.images.shape[0]
            if it == 0:
                assert_loss_keys_consistent(losses)
            if (it + 1) % cfg.train.log_interval == 0:
                jax.block_until_ready(losses["loss"])
                host_losses = {k: float(v) for k, v in losses.items()
                               if "." not in k}
                check_invalid_loss(host_losses, it + 1, interval=1)
                dt = time.time() - t0
                host_losses["img_s"] = n_img / dt
                host_losses["time"] = dt / (it + 1)
                metrics.log_metrics(
                    "train", epoch, it + 1, host_losses, task=tid,
                    lr=float(sched(state.step)))
        if epoch % cfg.train.ckpt_interval == 0 and jax.process_index() == 0:
            save_checkpoint(cfg.train.work_dir, tid, epoch, state,
                            teacher_variables["params"]
                            if teacher_variables else None)
        if cfg.train.eval_interval and epoch % cfg.train.eval_interval == 0:
            # async eval (SURVEY §7 hard part 6): snapshot the weights (the
            # train step donates state buffers) and run the whole eval —
            # device inference + host COCOeval — on a background thread
            # while the next epoch trains. Threads join at task end.
            # Multi-host runs stay synchronous: evaluate() gathers shards
            # with collectives that must not interleave with training ones.
            val_loader = DataLoader(val_ds, global_batch, pipe, train=False,
                                    num_workers=cfg.data.num_workers,
                                    drop_last=False,
                                    num_hosts=jax.process_count(),
                                    host_id=jax.process_index())
            eval_params = jax.tree.map(
                jnp.copy, ema_params if ema_params is not None
                else state.params)
            eval_stats = jax.tree.map(jnp.copy, state.batch_stats)

            def run_eval(epoch=epoch, params=eval_params, bs=eval_stats,
                         loader_=val_loader):
                from ..eval.evaluator import COCO_PROTOCOL_TYPES
                if cfg.data.dataset_type in COCO_PROTOCOL_TYPES:
                    stats = evaluate(model, {"params": params,
                                             "batch_stats": bs},
                                     val_ds, loader_,
                                     reg_max=cfg.model.reg_max,
                                     score_thr=cfg.test_score_thr,
                                     max_per_img=cfg.test_max_per_img,
                                     arch=cfg.model.arch)
                else:
                    # voc / wider_face / openimages / lvis score with
                    # their own dataset.evaluate protocol
                    from ..eval.evaluator import evaluate_dataset_native
                    stats = evaluate_dataset_native(
                        model, {"params": params, "batch_stats": bs},
                        val_ds, loader_, cfg.model.num_classes,
                        cfg.data.dataset_type, reg_max=cfg.model.reg_max,
                        score_thr=cfg.test_score_thr,
                        max_per_img=cfg.test_max_per_img,
                        arch=cfg.model.arch)
                log.info("task %d epoch %d eval: %s", tid, epoch,
                         {k: round(v, 4) for k, v in stats.items()
                          if not k.startswith("AP_")})
                # the reference's TextLoggerHook writes val rows to the
                # work-dir log json as well (mmcv logger_hooks); tests
                # and tools read per-task eval mAP from these rows
                metrics.log_metrics(
                    "val", epoch, 0,
                    {k: v for k, v in stats.items()
                     if not k.startswith("AP_")}, task=tid)

            if jax.process_count() == 1:
                th = threading.Thread(target=run_eval, daemon=True,
                                      name=f"eval-t{tid}e{epoch}")
                th.start()
                eval_threads.append(th)
            else:
                run_eval()

    for th in eval_threads:
        th.join()

    # with EMA on, the task's final weights are the averaged ones (the
    # reference's EMAHook swaps the EMA buffer in before checkpoint/eval)
    final_params = ema_params if ema_params is not None else state.params
    return {"params": jax.device_get(final_params),
            "batch_stats": jax.device_get(state.batch_stats)}


def run_incremental(cfg: ExperimentConfig, student_ckpt: Optional[str] = None,
                    teacher_ckpt: Optional[str] = None):
    """Full multi-task run (the train_increment.py main loop).

    ``student_ckpt``/``teacher_ckpt`` mirror the reference's
    Task1.load_student / load_teacher knobs (train_increment.py:218-229):
    optional checkpoint directories (task_{t}_epoch_{e}) to seed the first
    task's student / an external teacher.
    """
    task_nums = len(cfg.data.catsplit)
    mesh = make_mesh()
    # env fingerprint + resolved-config dump (collect_env + cfg.dump,
    # train_increment.py:158,168-173)
    from ..utils.logging import collect_env, dump_config
    log.info("environment: %s", collect_env())
    if jax.process_index() == 0:
        dump_config(cfg, cfg.train.work_dir)
    model = build_model(cfg)
    from ..utils.seed import init_random_seed, set_random_seed
    cfg.train.seed = init_random_seed(cfg.train.seed)
    rng = set_random_seed(cfg.train.seed)
    variables = init_variables(model, cfg, rng)
    teacher_variables = None

    def load_into(variables, path, depth=None):
        if path.endswith((".pth", ".pt")):
            # mmdet/torch checkpoint (the reference's teacher_ckpt files,
            # configs/...il.py Task1.load_teacher) via the full converter
            from ..utils.torch_weights import load_mmdet_checkpoint
            loaded = load_mmdet_checkpoint(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}, path,
                depth=depth or cfg.model.depth)
            return {"params": loaded["params"],
                    "batch_stats": loaded.get("batch_stats", {})}
        import re
        m = re.search(r"task_(\d+)_epoch_(\d+)", path)
        assert m, f"checkpoint path must contain task_T_epoch_E: {path}"
        import os
        restored = restore_checkpoint(
            os.path.dirname(path.rstrip("/")) or ".", int(m.group(1)),
            int(m.group(2)),
            template={"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {}),
                      "opt_state": None, "step": 0})
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}

    if student_ckpt:
        variables = load_into(variables, student_ckpt)
        log.info("student initialized from %s", student_ckpt)
    if teacher_ckpt:
        td = cfg.model.teacher_depth
        if td and td != cfg.model.depth:
            # deeper-teacher recipes (ld/lad): the teacher has its own
            # module + parameter tree, loaded against ITS template
            t_model = build_teacher_model(cfg)
            t_vars = init_variables(t_model, cfg, rng)
            teacher_variables = load_into(t_vars, teacher_ckpt, depth=td)
        else:
            teacher_variables = load_into(variables, teacher_ckpt)
        log.info("external teacher loaded from %s", teacher_ckpt)

    for tid in range(1, task_nums + 1):
        if tid < cfg.train.resume_by_task:
            ck = find_latest_checkpoint(cfg.train.work_dir, task=tid)
            if ck:
                restored = restore_checkpoint(
                    cfg.train.work_dir, ck[0], ck[1],
                    template={"params": variables["params"],
                              "batch_stats": variables.get("batch_stats", {}),
                              "opt_state": None, "step": 0})
                variables = {"params": restored["params"],
                             "batch_stats": restored["batch_stats"]}
            log.info("Task %d skipped (resume_by_task)", tid)
            teacher_variables = copy.deepcopy(variables)
            continue
        if tid > 1:
            # student -> frozen teacher: a REAL buffer copy (the train step
            # donates student params; an aliasing teacher would be
            # invalidated by the first donation). Snapshot batch_stats too —
            # the student keeps training its BNs while the teacher's must
            # stay frozen at promotion values.
            teacher_variables = jax.tree.map(jnp.copy, variables)
        variables = train_one_task(
            model, cfg, tid, task_nums, variables,
            teacher_variables if (tid > 1 or teacher_ckpt) else None, mesh)
    return variables
