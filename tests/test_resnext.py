"""ResNeXt (grouped bottleneck) shapes, param accounting, ResNet equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.resnet import ResNet


def _param_count(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def test_resnext50_32x4d_shapes_and_groups():
    model = ResNet(depth=50, groups=32, base_width=4, out_indices=(1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [(1, 8, 8, 512), (1, 4, 4, 1024),
                                       (1, 2, 2, 2048)]
    # grouped 3x3: kernel (3, 3, width/groups, width); stage-1 width =
    # floor(64 * 4 / 64) * 32 = 128
    k = vars_["params"]["layer1_block0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128 // 32, 128)
    # known torchvision/mmdet resnext50_32x4d backbone size (no fc):
    # 25.03M total - 2.05M fc = 22.98M
    n = _param_count(vars_["params"])
    assert 22.5e6 < n < 23.5e6, n


def test_groups1_is_plain_resnet():
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    a = ResNet(depth=50, out_indices=(3,))
    b = ResNet(depth=50, groups=1, base_width=64, out_indices=(3,))
    va = a.init(jax.random.PRNGKey(0), x)
    out_a = a.apply(va, x)[0]
    out_b = b.apply(va, x)[0]          # identical param structure
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
