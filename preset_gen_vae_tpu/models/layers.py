"""Convolutional layer primitives (reference: model/layer.py:10-46).

flax.linen blocks: conv / transposed-conv + optional BatchNorm placed before
or after the activation. Data layout is NHWC internally (TPU-native); the
model zoo transposes NCHW inputs once at the boundary.

The transposed conv reproduces torch ConvTranspose2d geometry exactly
(stride / padding / output_padding), because the reference decoders pick
per-layer output_paddings to hit exact spectrogram sizes
(reference: model/decoder.py:199-220).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(negative_slope: float = 0.1) -> Callable:
    return lambda x: jax.nn.leaky_relu(x, negative_slope=negative_slope)


def hardtanh(min_val: float = -1.0, max_val: float = 1.0) -> Callable:
    return lambda x: jnp.clip(x, min_val, max_val)


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


class TorchConvTranspose2d(nn.Module):
    """ConvTranspose with torch geometry:
    ``H_out = (H_in-1)*stride - 2*pad + dilation*(k-1) + output_padding + 1``.

    Implemented as ``lax.conv_general_dilated`` with input dilation = stride
    and per-edge padding ``(d*(k-1)-p, d*(k-1)-p+output_padding)`` over a
    spatially-flipped kernel — the standard fractionally-strided-conv
    construction, which XLA lowers to efficient MXU convolutions.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    output_padding: Sequence[int] = (0, 0)
    dilation: Sequence[int] = (1, 1)
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C_in)
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (kh, kw, in_ch, self.features),
        )
        pad = (
            (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph),
            (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw),
        )
        dtype = self.dtype or x.dtype
        # NOTE: no explicit preferred_element_type — a widened (f32)
        # accumulator output makes the conv VJP mix an f32 cotangent with a
        # bf16 kernel and fails to trace. XLA:TPU already accumulates bf16
        # convolutions in f32 inside the MXU.
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(dtype),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class Conv2DBlock(nn.Module):
    """conv + optional BN ('before'/'after' activation or None) + activation
    (reference: model/layer.py:10-26)."""

    out_ch: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    dilation: Sequence[int] = (1, 1)
    activation: Callable = leaky_relu(0.1)
    batch_norm: Optional[str] = "after"  # 'after' | 'before' | None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ph, pw = _pair(self.padding)
        dtype = self.dtype or x.dtype
        y = nn.Conv(
            features=self.out_ch,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.strides),
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=_pair(self.dilation),
            dtype=dtype,
        )(x)
        if self.batch_norm == "before":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
            )(y)
        y = self.activation(y)
        if self.batch_norm == "after":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
            )(y)
        return y


class TConv2DBlock(nn.Module):
    """transposed conv + optional BN + activation (reference: model/layer.py:29-46)."""

    out_ch: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    output_padding: Sequence[int] = (0, 0)
    dilation: Sequence[int] = (1, 1)
    activation: Callable = leaky_relu(0.1)
    batch_norm: Optional[str] = "after"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = TorchConvTranspose2d(
            features=self.out_ch,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
            dtype=self.dtype,
        )(x)
        if self.batch_norm == "before":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
            )(y)
        y = self.activation(y)
        if self.batch_norm == "after":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
            )(y)
        return y
