"""Spectrogram decoders (reference: model/decoder.py:9-93, 95-274).

Mirror of the encoder: FC from z to a (2048, 3, 4) feature map, a 1x1
"un-mixer" transposed conv producing ``channels * 512`` feature maps, a
channel split, then a shared per-channel transposed-conv stack ending in a
Hardtanh-bounded single-channel spectrogram
(reference: decoder.py:39-92).

Per-layer output paddings are chosen to land exactly on the reference
spectrogram sizes; our TorchConvTranspose2d reproduces that geometry. As in
the reference, the *full* multi-channel decoder path supports the
speccnn8l1(_bn) family (decoder.py:35-37, 103-104); the other architectures
are available as standalone stacks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import TConv2DBlock, TorchConvTranspose2d, hardtanh, leaky_relu

_ELU = nn.elu
_LRELU = leaky_relu(0.1)
_HARDTANH = hardtanh(-1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class TConvSpec:
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    pad: Tuple[int, int]
    out_pad: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    bn: Optional[str] = "after"
    act: str = "lrelu"


def _t(out_ch, k, s, p, op=(0, 0), d=(1, 1), bn="after", act="lrelu"):
    to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
    return TConvSpec(out_ch, to2(k), to2(s), to2(p), to2(op), to2(d), bn, act)


def decoder_tconv_specs(architecture: str, force_bigger_network: bool = False):
    """Transposed-conv stack tables (reference: model/decoder.py:108-268).
    The final spec row is the plain (no BN / no mid-activation) output conv;
    Hardtanh is applied by the caller."""
    if architecture in ("speccnn8l1", "speccnn8l1_bn"):
        return [
            _t(256, 4, 2, 2, (1, 1)),
            _t(128, 4, 2, 2, (1, 0)),
            _t(64, 4, 2, 2, (1, 1)),
            _t(32, 4, 2, 2, (1, 1)),
            _t(16, 4, 2, 2, (1, 0)),
            _t(8, 4, 2, 2, (1, 0)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "speccnn8l1_2":
        return [
            _t(512, 1, 1, 0),
            _t(256, 4, 2, 2, (1, 1)),
            _t(256, 4, 2, 2, (1, 0)),
            _t(128, 4, 2, 2, (1, 1)),
            _t(128, 4, 2, 2, (1, 1)),
            _t(64, 4, 2, 2, (1, 0)),
            _t(32, 4, 2, 2, (1, 0)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "speccnn8l1_3":
        return [
            _t(512, 1, 1, 0),
            _t(256, 5, 2, 2, (0, 1)),
            _t(128, 5, 2, 2, (0, 0)),
            _t(64, 5, 2, 2, (0, 1)),
            _t(32, 5, 2, 2, (0, 1)),
            _t(16, 5, 2, 2, (0, 0)),
            _t(8, 5, 2, 2, (0, 1)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "wavenet_baseline":
        return [
            _t(512, 1, 1, 0),
            _t(512, 4, (2, 1), 2, (1, 0)),
            _t(256, 4, 2, 2, (1, 1)),
            _t(256, 4, 2, 2, (1, 0)),
            _t(256, 4, 2, 2, (1, 1)),
            _t(128, 4, 2, 2, (1, 0)),
            _t(128, 4, 2, 2, (1, 1)),
            _t(128, 4, 2, 2, (1, 1)),
            _t(128, 5, 2, 2, (0, 0)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "wavenet_baseline_lighter":
        return [
            _t(512, 1, 1, 0),
            _t(512, 4, (2, 1), 2, (1, 0)),
            _t(256, 4, 2, 2, (1, 1)),
            _t(256, 4, 2, 2, (1, 0)),
            _t(256, 4, 2, 2, (1, 1)),
            _t(128, 4, 2, 2, (1, 0)),
            _t(64, 4, 2, 2, (1, 1)),
            _t(32, 4, 2, 2, (1, 1)),
            _t(16, 5, 2, 2, (0, 0)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "wavenet_baseline_shallow":
        return [
            _t(512, 1, 1, 0),
            _t(256, 4, 2, 2, (1, 0)),
            _t(128, 4, 2, 2, (1, 1)),
            _t(64, 4, 2, 2, (1, 0)),
            _t(32, 4, 2, 2, (1, 1)),
            _t(16, 4, 2, 2, (1, 1)),
            _t(8, 4, 2, 2, (1, 1)),
            _t(1, 5, 2, 2, bn=None, act="none"),
        ]
    if architecture == "flow_synth":
        n = 64
        return [
            _t(n, 7, 2, 3, 0, (2, 2), act="elu"),
            _t(n, 7, 2, 3, (1, 0), (2, 2), act="elu"),
            _t(n, 7, 2, 3, (0, 1), (2, 2), act="elu"),
            _t(n, 7, 2, 3, (1, 0), (2, 2), act="elu"),
            _t(1, 7, 2, 2, bn=None, act="none"),
        ]
    raise NotImplementedError(f"Architecture '{architecture}' not available")


class DecoderCNN(nn.Module):
    """Single-channel transposed-conv stack + bounded output activation
    (role of reference model/decoder.py:95-274)."""

    architecture: str
    force_bigger_network: bool = False
    output_activation: str = "hardtanh"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):  # x: (B, h, w, C)
        specs = decoder_tconv_specs(self.architecture, self.force_bigger_network)
        for i, s in enumerate(specs):
            if s.act == "none":  # plain output tconv, no BN/activation
                x = TorchConvTranspose2d(
                    features=s.out_ch, kernel_size=s.kernel, strides=s.stride,
                    padding=s.pad, output_padding=s.out_pad, dilation=s.dilation,
                    dtype=self.dtype, name=f"dec{i + 1}",
                )(x)
            else:
                x = TConv2DBlock(
                    out_ch=s.out_ch, kernel_size=s.kernel, strides=s.stride,
                    padding=s.pad, output_padding=s.out_pad, dilation=s.dilation,
                    activation=_ELU if s.act == "elu" else _LRELU,
                    batch_norm=s.bn, dtype=self.dtype, name=f"dec{i + 1}",
                )(x, train=train)
        if self.output_activation == "hardtanh":
            x = _HARDTANH(x.astype(jnp.float32))
        return x


class SpectrogramDecoder(nn.Module):
    """z -> (B, C, H, W) spectrograms (reference: model/decoder.py:9-92)."""

    architecture: str
    dim_z: int
    output_size: Tuple[int, int] = (257, 347)  # (H, W)
    spectrogram_channels: int = 1
    fc_dropout: float = 0.3
    force_bigger_network: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        if "speccnn8l1" not in self.architecture:
            raise NotImplementedError(
                "Full decoder supports the speccnn8l1 family only "
                "(reference: decoder.py:35-37)"
            )
        assert self.output_size == (257, 347), "speccnn8l1 decoders target 257x347"
        mixer_ch = 2048  # reference: decoder.py:31
        cnn_in = (3, 3) if self.architecture == "speccnn8l1_3" else (3, 4)
        last_4x4_ch = 1800 if self.force_bigger_network else 512

        h = nn.Dense(mixer_ch * cnn_in[0] * cnn_in[1], name="mlp")(z)
        h = nn.Dropout(rate=self.fc_dropout, deterministic=not train)(h)
        h = h.reshape(-1, cnn_in[0], cnn_in[1], mixer_ch)  # NHWC
        # 1x1 feature un-mixer (reference: decoder.py:72-75)
        h = TConv2DBlock(
            out_ch=self.spectrogram_channels * last_4x4_ch, kernel_size=(1, 1),
            strides=(1, 1), padding=(0, 0), activation=_LRELU,
            dtype=self.dtype, name="unmix1",
        )(h, train=train)
        # shared per-channel stack over channel splits (decoder.py:83-92)
        single_ch_cnn = DecoderCNN(
            architecture=self.architecture,
            force_bigger_network=self.force_bigger_network,
            dtype=self.dtype, name="single_ch_cnn",
        )
        outs = []
        for c in range(self.spectrogram_channels):
            h_c = h[..., c * last_4x4_ch:(c + 1) * last_4x4_ch]
            outs.append(single_ch_cnn(h_c, train=train))
        y = jnp.concatenate(outs, axis=-1)  # (B, H, W, C)
        return jnp.transpose(y, (0, 3, 1, 2))  # -> (B, C, H, W)
