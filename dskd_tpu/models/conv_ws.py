"""Weight-standardized convolution (configs/gn+ws; mmcv ConvWS2d
re-derived from Weight Standardization, Qiao et al. 2019).

Each output channel's kernel is standardized over its (kh, kw, in)
fan-in before the convolution: w' = (w - mean) / (std + eps), with the
UNBIASED std (ddof=1) the torch implementation uses. Pairs with
GroupNorm — WS keeps activations well-conditioned at the micro-batch
sizes GN targets.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvWS(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    eps: float = 1e-5
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_c = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_c, self.features))
        flat = kernel.reshape(-1, self.features)
        mean = flat.mean(axis=0)
        std = flat.std(axis=0, ddof=1)
        k = (kernel - mean) / (std + self.eps)
        pad = self.padding
        if not isinstance(pad, str):
            pad = [tuple(p) for p in pad]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=self.strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y
