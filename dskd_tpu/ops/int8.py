"""Int8 inference path for the frozen teacher forward.

The DSKD teacher (deformable_detr_il.py:116-154 out_teacher) runs every
train step with no backward — ~25% of the flagship step. The reference
keeps it fp32/fp16 on CUDA; on TPU the MXU natively multiplies
s8 x s8 -> s32 at twice the bf16 rate, so the teacher's matmuls can run
int8 with dynamic activation quantization:

  * weights: symmetric per-output-channel int8
    (scale = absmax over the input axes / 127),
  * activations: symmetric per-tensor dynamic int8 (absmax / 127),
  * accumulation in int32 (``preferred_element_type``), dequantized by
    ``scale_x * scale_w`` per output channel.

Rather than rewriting the model with quantized layer variants, a flax
method interceptor (``nn.intercept_methods``) swaps the computation of
every big ``nn.Dense`` / ``nn.Conv`` during the teacher apply — the
model definition, parameter tree, and student path are untouched.
Quantization happens inside the traced step (the per-step requantize is
one HBM pass over the kernels, negligible next to the matmuls).

Small layers (min dim < 128: cls/reg branch outputs, MSDA offset /
attention-weight projections) stay in the compute dtype — they carry the
decode-sensitive signal and contribute no meaningful FLOPs.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# quantize only layers whose matmul actually loads the MXU
MIN_QUANT_DIM = 128


def _quant_weight(w):
    """(…, C_out) kernel -> int8 kernel + (C_out,) f32 scale."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                   axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_act(x):
    """Per-tensor dynamic symmetric int8."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x, kernel, bias):
    """y = dequant(s8(x) @ s8(kernel) -> s32) + bias, in x.dtype."""
    xq, sx = _quant_act(x)
    wq, sw = _quant_weight(kernel)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def int8_conv(x, kernel, bias, strides, padding, feature_group_count=1,
              input_dilation=None, kernel_dilation=None):
    """NHWC x HWIO conv with s8 operands and s32 accumulation."""
    xq, sx = _quant_act(x)
    wq, sw = _quant_weight(kernel)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        lhs_dilation=input_dilation, rhs_dilation=kernel_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _canon_padding(padding, kernel_size):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * len(kernel_size)
    return [((p, p) if isinstance(p, int) else tuple(p)) for p in padding]


def make_int8_interceptor(params):
    """Method interceptor running big Dense/Conv layers of a bound model
    in int8. ``params``: the applied variables' ``params`` tree (used to
    fetch each intercepted module's kernel/bias by path)."""

    def lookup(path):
        node = params
        for p in path:
            node = node[p]
        return node

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        try:
            if type(mod) is nn.Dense:
                leaf = lookup(mod.path)
                kernel = leaf["kernel"]
                if min(kernel.shape) < MIN_QUANT_DIM:
                    return next_fun(*args, **kwargs)
                return int8_dense(args[0], kernel, leaf.get("bias"))
            if type(mod) is nn.Conv:
                leaf = lookup(mod.path)
                kernel = leaf["kernel"]
                cin, cout = kernel.shape[-2], kernel.shape[-1]
                if (min(cin, cout) < MIN_QUANT_DIM
                        or mod.feature_group_count != 1):
                    return next_fun(*args, **kwargs)
                ks = mod.kernel_size
                strides = mod.strides or (1,) * len(ks)
                if isinstance(strides, int):
                    strides = (strides,) * len(ks)
                kd = mod.kernel_dilation
                if isinstance(kd, int):
                    kd = (kd,) * len(ks)
                return int8_conv(
                    args[0], kernel, leaf.get("bias") if mod.use_bias
                    else None, strides,
                    _canon_padding(mod.padding, ks),
                    feature_group_count=mod.feature_group_count,
                    kernel_dilation=kd)
        except (KeyError, TypeError):
            pass        # unexpected structure: fall through to f32/bf16
        return next_fun(*args, **kwargs)

    return interceptor


def apply_int8(model, variables, *args, **kwargs):
    """``model.apply`` with big Dense/Conv layers computed in int8."""
    with nn.intercept_methods(make_int8_interceptor(variables["params"])):
        return model.apply(variables, *args, **kwargs)
