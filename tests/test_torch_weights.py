"""Numerical parity of the flax ResNet vs a torch oracle with ported weights.

The flagship recipe needs torchvision resnet50 initialization
(SURVEY §7 hard part 4). torchvision is not in this image, so the oracle is
a minimal torch ResNet stem+bottleneck implementing the torchvision layout
(same state-dict keys); this proves the converter + NHWC architecture give
the same features under frozen-BN eval semantics.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


class TorchBottleneck(nn.Module):
    """torchvision-style bottleneck (stride on conv2)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchMini(nn.Module):
    """Stem + one block per stage — resnet50-shaped prefix with the
    torchvision state-dict naming the converter expects."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBottleneck(64, 64, 1))
        self.layer2 = nn.Sequential(TorchBottleneck(256, 128, 2))
        self.layer3 = nn.Sequential(TorchBottleneck(512, 256, 2))
        self.layer4 = nn.Sequential(TorchBottleneck(1024, 512, 2))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(y)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.normal_(1, 0.2)
            mod.bias.data.normal_(0, 0.2)


def test_resnet_mini_feature_parity():
    import jax.numpy as jnp

    from dskd_tpu.models.resnet import ResNet
    from dskd_tpu.utils.torch_weights import convert_resnet_state_dict

    tm = TorchMini()
    with torch.no_grad():
        _randomize_bn(tm)
    tm.eval()
    state = tm.state_dict()

    # a depth with 1 block per stage mirrors TorchMini
    import dskd_tpu.models.resnet as R
    R.ARCH_SETTINGS[0] = ("bottleneck", (1, 1, 1, 1))
    try:
        params, stats = convert_resnet_state_dict(
            state, depth=0, blocks_per_stage=(1, 1, 1, 1))
        model = ResNet(depth=0, out_indices=(1, 2, 3), frozen_stages=-1)
        x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
        outs = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x))
        with torch.no_grad():
            t_outs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        for flax_out, torch_out in zip(outs, t_outs):
            got = np.asarray(flax_out).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, torch_out.numpy(), rtol=1e-3,
                                       atol=1e-3)
    finally:
        R.ARCH_SETTINGS.pop(0, None)
