from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
from .tp import make_2d_mesh, shard_state_tp, tp_pspecs  # noqa: F401
