"""Normalized predictors (models/utils/normed_predictor.py:10-88).

``NormedLinear`` / ``NormedConv2d``: classifier variants whose weight rows
and input activations are L2-normalized (to ``power``) before the product,
with the activation side scaled by ``tempearture`` (the reference's
spelling; default 20). Used by the seesaw-loss LVIS recipes
(configs/seesaw_loss/*: ``cls_predictor_cfg=dict(type='NormedLinear',
tempearture=20)``) so the logit scale is decoupled from feature norms on
long-tailed data.

Flax kernels are (in, out) where torch weights are (out, in); the torch
``norm(dim=1)`` over the input dim is therefore axis 0 here.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class NormedDense(nn.Module):
    """NormedLinear: y = (temp * x/||x||) @ (W/||W||_col) + b."""
    features: int
    tempearture: float = 20.0
    power: float = 1.0
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (x.shape[-1], self.features))
        w = kernel / (jnp.linalg.norm(kernel, axis=0, keepdims=True)
                      ** self.power + self.eps)
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True)
                  ** self.power + self.eps)
        y = (xn * self.tempearture) @ w
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class NormedConv(nn.Module):
    """NormedConv2d on NHWC; ``norm_over_kernel`` normalizes each output
    filter over its full (kh, kw, cin) extent instead of cin only."""
    features: int
    kernel_size: tuple = (1, 1)
    tempearture: float = 20.0
    power: float = 1.0
    eps: float = 1e-6
    norm_over_kernel: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (kh, kw, x.shape[-1], self.features))
        if self.norm_over_kernel:
            norm = jnp.linalg.norm(
                kernel.reshape(-1, self.features), axis=0)[None, None, None]
        else:
            norm = jnp.linalg.norm(kernel, axis=2, keepdims=True)
        w = kernel / (norm ** self.power + self.eps)
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True)
                  ** self.power + self.eps)
        y = jax.lax.conv_general_dilated(
            xn * self.tempearture, w, window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y
