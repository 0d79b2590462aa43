"""mmdet config importer (utils/mmdet_config.py): _base_ inheritance +
mmcv merge semantics, and the field mapping onto ExperimentConfig.
Fixtures are synthetic files in mmdet's config grammar."""
import textwrap

from dskd_tpu.utils.mmdet_config import (load_mmdet_config,
                                         mmdet_to_experiment)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_base_inheritance_and_merge(tmp_path):
    _write(tmp_path, "_base_/model.py", """
        model = dict(type='RetinaNet',
                     backbone=dict(type='ResNet', depth=50,
                                   frozen_stages=1),
                     bbox_head=dict(type='RetinaHead', num_classes=80))
        """)
    _write(tmp_path, "_base_/sched.py", """
        optimizer = dict(type='SGD', lr=0.01, weight_decay=0.0001)
        lr_config = dict(policy='step', warmup_iters=500,
                         warmup_ratio=0.001, step=[8, 11])
        runner = dict(type='EpochBasedRunner', max_epochs=12)
        """)
    child = _write(tmp_path, "retina_r101.py", """
        _base_ = ['_base_/model.py', '_base_/sched.py']
        model = dict(backbone=dict(depth=101))
        optimizer = dict(lr=0.02)
        """)
    cfg = load_mmdet_config(child)
    # deep merge: child depth wins, base type survives
    assert cfg["model"]["backbone"]["depth"] == 101
    assert cfg["model"]["backbone"]["type"] == "ResNet"
    assert cfg["model"]["bbox_head"]["num_classes"] == 80
    assert cfg["optimizer"]["lr"] == 0.02
    assert cfg["optimizer"]["weight_decay"] == 0.0001
    assert cfg["runner"]["max_epochs"] == 12


def test_delete_key_replaces_subtree(tmp_path):
    _write(tmp_path, "base.py", """
        model = dict(neck=dict(type='FPN', num_outs=5, start_level=1))
        """)
    child = _write(tmp_path, "child.py", """
        _base_ = 'base.py'
        model = dict(neck=dict(_delete_=True, type='PAFPN'))
        """)
    cfg = load_mmdet_config(child)
    assert cfg["model"]["neck"] == {"type": "PAFPN"}


def test_mapping_faster_rcnn_dcn(tmp_path):
    child = _write(tmp_path, "fr.py", """
        model = dict(
            type='FasterRCNN',
            backbone=dict(type='ResNet', depth=50, frozen_stages=1,
                          dcn=dict(type='DCNv2'),
                          stage_with_dcn=(False, True, True, True)),
            roi_head=dict(bbox_head=dict(type='Shared2FCBBoxHead',
                                         num_classes=20)))
        data = dict(samples_per_gpu=2, workers_per_gpu=2,
                    train=dict(type='VOCDataset',
                               ann_file='data/voc/train.txt',
                               img_prefix='data/voc/',
                               pipeline=[
                                   dict(type='LoadImageFromFile'),
                                   dict(type='Resize',
                                        img_scale=(1333, 800),
                                        keep_ratio=True),
                                   dict(type='RandomFlip',
                                        flip_ratio=0.5),
                                   dict(type='Pad', size_divisor=32)]),
                    val=dict(type='VOCDataset',
                             ann_file='data/voc/val.txt',
                             img_prefix='data/voc/'))
        optimizer = dict(type='SGD', lr=0.02, weight_decay=0.0001)
        optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
        lr_config = dict(policy='step', warmup_iters=500,
                         warmup_ratio=0.001, step=[8, 11])
        runner = dict(type='EpochBasedRunner', max_epochs=12)
        fp16 = dict(loss_scale=512.)
        """)
    exp, ignored = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == "faster_rcnn"
    assert exp.model.depth == 50
    assert exp.model.dcn_stages == (False, True, True, True)
    assert exp.model.num_classes == 20
    assert exp.data.dataset_type == "voc"
    assert exp.data.samples_per_device == 2
    assert exp.data.img_scale == (1333, 800)
    assert exp.data.bucket == (800, 1344)
    assert exp.data.flip_ratio == 0.5
    assert exp.data.catsplit == (20,)
    assert exp.train.base_lr == 0.02
    assert exp.train.grad_clip == 35
    assert exp.train.step_epochs == (8, 11)
    assert exp.train.epochs_per_task == 12
    assert "fp16" in ignored


def test_mapping_ssd_pipeline_and_generic_detector(tmp_path):
    child = _write(tmp_path, "ssd.py", """
        model = dict(type='SingleStageDetector',
                     backbone=dict(type='SSDVGG', depth=16),
                     bbox_head=dict(type='SSDHead', num_classes=80))
        train_pipeline = [
            dict(type='PhotoMetricDistortion'),
            dict(type='Expand', ratio_range=(1, 4)),
            dict(type='MinIoURandomCrop'),
            dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
            dict(type='RandomFlip', flip_ratio=0.5),
            dict(type='MyCustomTransform'),
        ]
        data = dict(samples_per_gpu=8,
                    train=dict(type='RepeatDataset', times=5,
                               dataset=dict(type='CocoDataset',
                                            ann_file='a.json',
                                            img_prefix='imgs/')))
        """)
    exp, ignored = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == "ssd"
    assert exp.data.photo_metric_distortion
    assert exp.data.expand and exp.data.min_iou_crop
    assert exp.data.img_scale == (300, 300)
    assert exp.data.train_ann == "a.json"        # RepeatDataset unwrapped
    assert any("MyCustomTransform" in k for k in ignored)


def test_mapping_plugins_and_groie(tmp_path):
    child = _write(tmp_path, "gcb.py", """
        model = dict(
            type='MaskRCNN',
            backbone=dict(type='ResNet', depth=50,
                          plugins=[dict(cfg=dict(type='ContextBlock',
                                                 ratio=1./4),
                                        stages=(False, True, True, True),
                                        position='after_conv3')]),
            roi_head=dict(
                bbox_roi_extractor=dict(type='GenericRoIExtractor'),
                bbox_head=dict(num_classes=80)))
        """)
    exp, _ = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == "mask_rcnn"
    assert exp.model.gcb_stages == (False, True, True, True)
    assert exp.model.gcb_ratio == 0.25
    assert exp.model.groie


def test_emitted_module_round_trips(tmp_path):
    """import tool -> dskd_tpu config module -> load_config builds."""
    import importlib.util
    import os
    import subprocess
    import sys

    child = _write(tmp_path, "retina.py", """
        model = dict(type='RetinaNet',
                     backbone=dict(type='ResNet', depth=50),
                     bbox_head=dict(type='RetinaHead', num_classes=80))
        optimizer = dict(lr=0.01, weight_decay=0.0001)
        """)
    out = str(tmp_path / "retina_dskd.py")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "misc",
                        "import_mmdet_config.py")
    r = subprocess.run([sys.executable, tool, child, "-o", out],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    from dskd_tpu.utils.config import load_config
    cfg = load_config(out)
    assert cfg.model.arch == "retinanet"
    assert cfg.train.base_lr == 0.01


def test_mapping_dskd_il_config_shape(tmp_path):
    """The fork's IL grammar: catsplit/catpred on the dataset dict,
    per-task optimizer/lr_config/runner lists."""
    child = _write(tmp_path, "il.py", """
        model = dict(type='GFLDeformableDETR',
                     bbox_head=dict(type='GFLDeformableDETRHeadIL',
                                    num_classes=80))
        catsplit, catload = (40, 40), (1, 0)
        data = dict(samples_per_gpu=16, cat_split_load='auto',
                    train=dict(type='CocoSplitDataset',
                               ann_file='train.json', img_prefix='imgs/',
                               catsplit=catsplit, catload=catload,
                               catpred='prev-cur', imgpercent=1),
                    val=dict(type='CocoSplitDataset',
                             ann_file='val.json', img_prefix='imgs/'))
        optimizer = [dict(type='AdamW', lr=2e-4, weight_decay=1e-4),
                     dict(type='AdamW', lr=2e-4, weight_decay=1e-4)]
        optimizer_config = [dict(grad_clip=dict(max_norm=0.1)),
                            dict(grad_clip=dict(max_norm=0.1))]
        lr_config = [dict(policy='step', step=[11]),
                     dict(policy='step', step=[11])]
        runner = [dict(type='TaskEpochBasedRunner', max_epochs=12),
                  dict(type='TaskEpochBasedRunner', max_epochs=12)]
        """)
    exp, ignored = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == "gfl_deformable_detr"
    assert exp.data.catsplit == (40, 40)
    assert exp.data.catpred == "prev-cur"
    assert exp.data.samples_per_device == 16
    assert exp.train.base_lr == 2e-4
    assert exp.train.grad_clip == 0.1
    assert exp.train.step_epochs == (11,)
    assert exp.train.epochs_per_task == 12
    assert any("optimizer[1:]" in k for k in ignored)


def test_bucket_exact_without_pad_divisor(tmp_path):
    """SSD-style pipelines carry no Pad(size_divisor): the canvas is the
    exact Resize scale, not a /32 rounding (SSD300 -> 300, not 320)."""
    child = _write(tmp_path, "ssd300.py", """
        model = dict(type='SingleStageDetector',
                     backbone=dict(type='SSDVGG', depth=16),
                     bbox_head=dict(type='SSDHead', num_classes=80))
        train_pipeline = [
            dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
        ]
        """)
    exp, _ = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.data.bucket == (300, 300)


def test_unmapped_model_type_yields_empty_arch(tmp_path):
    child = _write(tmp_path, "unk.py", """
        model = dict(type='SOLOV2',
                     bbox_head=dict(num_classes=80))
        """)
    exp, ignored = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == ""
    assert any("SOLOV2" in k for k in ignored)


def test_detectors_rfp_sac_import(tmp_path):
    """DetectoRS configs carry SAC on the backbone and RFP as the neck;
    both knobs must transfer (and PAFPN upgrades the faster_rcnn arch)."""
    child = _write(tmp_path, "drs.py", """
        model = dict(
            type='CascadeRCNN',
            backbone=dict(type='DetectoRS_ResNet', depth=50,
                          sac=dict(type='SAC', use_deform=False),
                          stage_with_sac=(False, True, True, True)),
            neck=dict(type='RFP', rfp_steps=2,
                      rfp_backbone=dict(type='DetectoRS_ResNet',
                                        sac=dict(type='SAC'))),
            roi_head=dict(bbox_head=[dict(num_classes=80)]))
        """)
    exp, _ = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.model.arch == "cascade_rcnn"
    assert exp.model.rfp and exp.model.sac

    child2 = _write(tmp_path, "pafpn.py", """
        model = dict(type='FasterRCNN',
                     backbone=dict(type='ResNet', depth=50),
                     neck=dict(type='PAFPN'),
                     roi_head=dict(bbox_head=dict(num_classes=80)))
        """)
    exp2, _ = mmdet_to_experiment(load_mmdet_config(child2))
    assert exp2.model.arch == "faster_rcnn_pafpn"


def test_distill_flags_transfer(tmp_path):
    """The DSKD IL head's flag-string distill recipe maps onto
    DistillFlags; an IL detector WITHOUT flags does not silently inherit
    the flagship defaults."""
    child = _write(tmp_path, "il2.py", """
        model = dict(type='GFLDeformableDETR',
                     bbox_head=dict(type='GFLDeformableDETRHeadIL',
                                    num_classes=80,
                                    cates_distill='hard + soft',
                                    locat_distill='ld_bbox',
                                    memory_distill='memory',
                                    feats_distill='kldv',
                                    teacher_test_cfg=dict(
                                        score_thr=0.25, max_per_img=50)))
        """)
    exp, _ = mmdet_to_experiment(load_mmdet_config(child))
    assert exp.distill.cates_distill == "hard + soft"
    assert exp.distill.locat_distill == "ld_bbox"
    assert exp.distill.memory_distill == "memory"
    assert exp.distill.feats_distill == "kldv"
    assert exp.distill.teacher_score_thr == 0.25
    assert exp.distill.teacher_max_per_img == 50

    bare = _write(tmp_path, "il3.py", """
        model = dict(type='DeformableDETR_il',
                     bbox_head=dict(num_classes=80))
        """)
    exp2, _ = mmdet_to_experiment(load_mmdet_config(bare))
    assert exp2.distill.cates_distill == ""
    assert exp2.distill.feats_distill == ""


def test_imported_il_config_builds_a_model(tmp_path):
    """The emitted module is not just parseable — it builds and
    initializes the flagship model with the imported task plan."""
    import dataclasses
    import os
    import subprocess
    import sys

    import jax

    child = _write(tmp_path, "il_full.py", """
        model = dict(type='GFLDeformableDETR',
                     backbone=dict(type='ResNet', depth=50,
                                   frozen_stages=1),
                     bbox_head=dict(type='GFLDeformableDETRHeadIL',
                                    num_classes=80,
                                    cates_distill='hard + teacher-first',
                                    feats_distill='corr'))
        catsplit, catload = (40, 40), (1, 0)
        data = dict(samples_per_gpu=4,
                    train=dict(type='CocoSplitDataset',
                               ann_file='t.json', img_prefix='i/',
                               catsplit=catsplit, catload=catload,
                               catpred='prev-cur'))
        optimizer = dict(type='AdamW', lr=2e-4, weight_decay=1e-4)
        """)
    out = str(tmp_path / "il_dskd.py")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "misc",
                        "import_mmdet_config.py")
    r = subprocess.run([sys.executable, tool, child, "-o", out],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.utils.config import load_config
    cfg = load_config(out)
    assert cfg.model.arch == "gfl_deformable_detr"
    assert cfg.data.catsplit == (40, 40)
    assert cfg.distill.cates_distill == "hard + teacher-first"
    # CI-size shrink, then prove it builds
    cfg.model = dataclasses.replace(cfg.model, depth=18, num_query=8,
                                    num_encoder_layers=1,
                                    num_decoder_layers=1)
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64))
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert variables["params"]


def test_mapping_ssd512_and_ssdlite_variants():
    """The real reference ssd512/ssdlite configs map to their
    ModelConfig.ssd_input_size variants (512: anchor-generator
    input_size; 320: head use_depthwise)."""
    ref = "/root/reference/configs/ssd"
    exp512, _ = mmdet_to_experiment(
        load_mmdet_config(f"{ref}/ssd512_coco.py"))
    assert exp512.model.arch == "ssd"
    assert exp512.model.ssd_input_size == 512
    explite, _ = mmdet_to_experiment(
        load_mmdet_config(f"{ref}/ssdlite_mobilenetv2_scratch_600e_coco.py"))
    assert explite.model.arch == "ssd"
    assert explite.model.ssd_input_size == 320
    exp300, _ = mmdet_to_experiment(
        load_mmdet_config(f"{ref}/ssd300_coco.py"))
    assert exp300.model.ssd_input_size == 300
