"""dskd_tpu: a TPU-native object-detection + incremental-distillation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the DSKD
reference (an mmdetection fork implementing "Dynamically Semantic-Guided
Knowledge Distillation for Incremental Object Detection").

Design stance (TPU-first, not a port):
  * static shapes everywhere: images pad to resolution buckets, ground truth
    pads to ``max_gt`` with validity masks, teacher predictions pad to
    ``max_per_img`` with keep masks;
  * one jitted train step per task — conditional distillation branches are
    statically configured, so there is no ``find_unused_parameters`` analog;
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding; cross-replica
    averaging (the reference's ``reduce_mean``) falls out of GSPMD global
    semantics automatically;
  * the Hungarian assignment runs on device (batched Jonker-Volgenant),
    replacing the reference's per-image scipy host round-trip;
  * MS-deformable attention is a first-class fused sampling op (XLA gather
    formulation + Pallas kernel).
"""

__version__ = "0.1.0"
