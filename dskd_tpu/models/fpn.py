"""FPN neck (parity: mmdet/models/necks/fpn.py).

GFL R50 config: in_channels=[256,512,1024,2048], out=256, start_level=1,
add_extra_convs='on_output', num_outs=5 — lateral 1x1 convs, top-down
nearest upsampling, 3x3 output convs, extra stride-2 convs on the last
output (with relu between when relu_before_extra_convs).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    add_extra_convs: str = "on_output"   # '', 'on_input', 'on_output'
    relu_before_extra_convs: bool = True
    # 'nearest' (fpn.py), 'bilinear' (YOLACT), or 'carafe'
    # (necks/fpn_carafe.py: content-aware reassembly top-down upsampling,
    # configs/carafe/faster_rcnn_r50_fpn_carafe_1x box AP 38.6)
    upsample: str = "nearest"
    # gn / gn+ws recipe (configs/gn, configs/gn+ws): GroupNorm(32) after
    # every FPN conv (no activation, mmdet ConvModule act_cfg=None),
    # optionally weight-standardized convs; 'bn' = BatchNorm (the
    # retinanet_effb3 recipe, norm_cfg=BN + no_norm_on_lateral=True)
    norm: str = ""
    ws: bool = False
    # mmdet FPN no_norm_on_lateral: lateral 1x1 ConvModules skip the norm
    # (and therefore keep their bias, ConvModule bias='auto')
    no_norm_on_lateral: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if self.ws:
            from .conv_ws import ConvWS as _C
        else:
            _C = nn.Conv

        def _Conv(*a, lateral=False, **kw):
            # mmdet ConvModule drops the conv bias when a norm follows;
            # init parity (necks/fpn.py:75-76): Xavier-uniform convs
            kw.setdefault("kernel_init", nn.initializers.xavier_uniform())
            normed = bool(self.norm) and not (lateral
                                              and self.no_norm_on_lateral)
            return _C(*a, use_bias=not normed, **kw)

        def _n(x, name, lateral=False):
            if lateral and self.no_norm_on_lateral:
                return x
            if self.norm == "gn":
                return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                    name=name)(x)
            if self.norm == "bn":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name=name)(x)
            return x

        used = list(inputs[self.start_level:])
        laterals = [
            _n(_Conv(self.out_channels, (1, 1), lateral=True,
                     name=f"lateral{i}")(x),
               f"lateral_gn{i}", lateral=True)
            for i, x in enumerate(used)]

        for i in range(len(laterals) - 1, 0, -1):
            tgt_hw = laterals[i - 1].shape[1:3]
            if self.upsample == "bilinear":
                up = jax.image.resize(
                    laterals[i], (laterals[i].shape[0],) + tuple(tgt_hw)
                    + (laterals[i].shape[-1],), method="bilinear")
            elif self.upsample == "carafe":
                from ..ops.carafe import CARAFE
                up = CARAFE(self.out_channels,
                            name=f"carafe{i}")(laterals[i])
            else:
                up = _upsample_nearest_2x(laterals[i])
            # crop in case of odd sizes
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up

        outs = [_n(_Conv(self.out_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], name=f"fpn_conv{i}")(x),
                   f"fpn_gn{i}")
                for i, x in enumerate(laterals)]

        if self.num_outs > len(outs):
            if not self.add_extra_convs:
                # fpn.py:187-189: parameter-free max_pool2d(kernel=1,
                # stride=2) on the last OUTPUT (Faster/Mask R-CNN P6) —
                # k=1 s=2 maxpool is exact 2x subsampling
                for _ in range(self.num_outs - len(laterals)):
                    outs.append(outs[-1][:, ::2, ::2, :])
                return tuple(outs)
            if self.add_extra_convs == "on_input":
                extra_src = used[-1]
            else:
                extra_src = outs[-1]
            for j in range(self.num_outs - len(laterals)):
                if j > 0 and self.relu_before_extra_convs:
                    extra_src = nn.relu(extra_src)
                extra_src = _n(_Conv(self.out_channels, (3, 3),
                                     strides=(2, 2),
                                     padding=[(1, 1), (1, 1)],
                                     name=f"extra_conv{j}")(extra_src),
                               f"extra_gn{j}")
                outs.append(extra_src)
        return tuple(outs)
