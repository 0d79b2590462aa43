"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU chip is reserved for benchmarks; unit tests validate numerics
and sharding on host CPU (mirrors the reference's CPU-first test strategy,
tests/test_models/test_forward.py).

NOTE: this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin before conftest runs, so setting JAX_PLATFORMS via os.environ is
too late — use jax.config.update, which works any time before backend
initialization. (Two pytest runs sharing the single TPU chip would deadlock
on the device grant.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's wall time is compile-dominated
# (6+ model families x jit programs); cache hits make re-runs minutes faster
_cache_dir = os.path.join(os.path.dirname(__file__), "..",
                          ".jax_compilation_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

# fast/slow tiers: `pytest -m "not slow"` is the <5 min core-parity slice
# (oracles, geometry, converters); the slow tier holds the e2e /
# whole-family train-step files whose jit programs dominate wall time.
_SLOW_FILES = {
    "test_configs", "test_incremental_e2e", "test_detr_il_e2e",
    "test_dist_two_process", "test_forgetting_ab",
    "test_incremental_40_40",
    "test_mask_convergence_e2e",
    "test_yolof_il_e2e",
    "test_train_step", "test_tp", "test_multihost_collect",
    "test_checkpoint", "test_serve", "test_analysis_tools",
    "test_robustness_vis_ohem",
    "test_deformable_detr", "test_vfnet_tood", "test_backbones_zoo",
    "test_fovea_fsaf", "test_cornernet", "test_reppoints", "test_sabl",
    "test_paa", "test_autoassign", "test_free_anchor", "test_dyhead",
    "test_trident_detectors", "test_ld", "test_guided_anchor", "test_libra",
    "test_ms_rcnn", "test_cascade_mask_rcnn", "test_int8",
    "test_sparse_rcnn", "test_grid_rcnn", "test_tridentnet", "test_mask_rcnn",
    "test_panoptic", "test_solo", "test_decoupled_solo",
    "test_yolact", "test_yolox",
    "test_htc", "test_point_rend", "test_queryinst", "test_scnet",
    "test_maskformer", "test_mask2former", "test_pisa",
    "test_cascade_rpn", "test_fpg", "test_guided_anchor",
    "test_nas_fpn",
    "test_cascade_rcnn", "test_faster_rcnn", "test_groie",
    "test_samplers_zoo", "test_inference_api", "test_mmdet_config_import",
    "test_yolof", "test_yoloy",
    "test_yolov3", "test_ssd", "test_centernet", "test_retinanet",
    "test_fcos", "test_atss_family", "test_gfl", "test_detr",
    "test_detr_dropout", "test_swin", "test_csp_darknet",
    "test_mobilenet", "test_resnext", "test_bfp_res2net",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
