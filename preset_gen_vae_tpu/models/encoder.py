"""Spectrogram encoders (reference: model/encoder.py:8-108, 111-307).

Each architecture is expressed as a declarative table of conv-layer specs
(out_ch, kernel, stride, pad, dilation, bn, activation) consumed by one
generic flax CNN — the reference builds eight near-identical
``nn.Sequential`` stacks instead. Multi-channel (stacked-MIDI-note) inputs
share a single per-channel CNN whose deepest one or two layers are replaced
by a feature-mixer applied to the channel-concatenated feature maps
(reference: encoder.py:48-70, 95-100).

Output: ``(B, 2, dim_z)`` — latent mu and log-variance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2DBlock, leaky_relu

_ELU = nn.elu
_LRELU = leaky_relu(0.1)


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    pad: Tuple[int, int]
    dilation: Tuple[int, int] = (1, 1)
    bn: Optional[str] = "after"
    act: str = "lrelu"  # 'lrelu' | 'elu'


def _c(out_ch, k, s, p, d=(1, 1), bn="after", act="lrelu"):
    to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
    return ConvSpec(out_ch, to2(k), to2(s), to2(p), to2(d), bn, act)


def available_architectures():
    """(reference: model/encoder.py:8-20)"""
    return [
        "wavenet_baseline",
        "wavenet_baseline_lighter",
        "wavenet_baseline_shallow",
        "flow_synth",
        "speccnn8l1",
        "speccnn8l1_bn",
        "speccnn8l1_2",
        "speccnn8l1_3",
    ]


def encoder_conv_specs(architecture: str):
    """Layer tables transcribing the reference stacks
    (model/encoder.py:128-301)."""
    if architecture in ("wavenet_baseline", "wavenet_baseline_lighter"):
        return [
            _c(128, 5, 2, 2), _c(128, 4, 2, 2), _c(128, 4, 2, 2),
            _c(256, 4, 2, 2), _c(256, 4, 2, 2), _c(256, 4, 2, 2),
            _c(512, 4, 2, 2), _c(512, 4, 2, 2), _c(512, 4, (2, 1), 2),
            _c(1024, 1, 1, 0),
        ]
    if architecture == "wavenet_baseline_shallow":
        return [
            _c(8, 5, 2, 2), _c(16, 4, 2, 2), _c(32, 4, 2, 2), _c(64, 4, 2, 2),
            _c(128, 4, 2, 2), _c(256, 4, 2, 2), _c(512, 4, 2, 2),
            _c(1024, 1, 1, 0),
        ]
    if architecture == "flow_synth":
        n = 64
        return [
            _c(n, 7, 2, 3, 1, act="elu"),
            _c(n, 7, 2, 3, 2, act="elu"),
            _c(n, 7, 2, 3, 2, act="elu"),
            _c(n, 7, 2, 3, 2, act="elu"),
            _c(n, 7, 2, 3, 2, act="elu"),
        ]
    if architecture == "speccnn8l1":
        return [
            _c(8, 5, 2, 2), _c(16, 4, 2, 2), _c(32, 4, 2, 2), _c(64, 4, 2, 2),
            _c(128, 4, 2, 2), _c(256, 4, 2, 2), _c(512, 4, 2, 2),
            _c(1024, 1, 1, 0),
        ]
    if architecture == "speccnn8l1_bn":
        # no BN on first and last conv layers (reference: encoder.py:233-259)
        return [
            _c(8, 5, 2, 2, bn=None), _c(16, 4, 2, 2), _c(32, 4, 2, 2),
            _c(64, 4, 2, 2), _c(128, 4, 2, 2), _c(256, 4, 2, 2),
            _c(512, 4, 2, 2), _c(1024, 1, 1, 0, bn=None),
        ]
    if architecture == "speccnn8l1_2":
        return [
            _c(32, 5, 2, 2, bn=None), _c(64, 4, 2, 2), _c(128, 4, 2, 2),
            _c(128, 4, 2, 2), _c(256, 4, 2, 2), _c(256, 4, 2, 2),
            _c(512, 4, 2, 2), _c(1024, 1, 1, 0, bn=None),
        ]
    if architecture == "speccnn8l1_3":
        return [
            _c(8, 5, 2, 2, bn=None), _c(16, 5, 2, 2), _c(32, 5, 2, 2),
            _c(64, 5, 2, 2), _c(128, 5, 2, 2), _c(256, 5, 2, 2),
            _c(512, 5, 2, 2), _c(1024, 1, 1, 0, bn=None),
        ]
    raise NotImplementedError(f"Architecture '{architecture}' not available")


class SpectrogramCNN(nn.Module):
    """Generic conv stack driven by an architecture table
    (role of reference model/encoder.py:111-306)."""

    architecture: str
    last_layers_to_remove: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):  # x: (B, H, W, 1)
        specs = encoder_conv_specs(self.architecture)
        if self.last_layers_to_remove > 0:
            assert self.architecture == "speccnn8l1_bn"  # reference: encoder.py:126
            specs = specs[: len(specs) - self.last_layers_to_remove]
        for i, s in enumerate(specs):
            x = Conv2DBlock(
                out_ch=s.out_ch, kernel_size=s.kernel, strides=s.stride,
                padding=s.pad, dilation=s.dilation,
                activation=_ELU if s.act == "elu" else _LRELU,
                batch_norm=s.bn, dtype=self.dtype, name=f"enc{i + 1}",
            )(x, train=train)
        return x


class SpectrogramEncoder(nn.Module):
    """Per-channel CNN + feature mixer + FC -> (B, 2, dim_z)
    (reference: model/encoder.py:23-108)."""

    architecture: str
    dim_z: int
    spectrogram_channels: int = 1
    fc_dropout: float = 0.3
    output_bn: bool = False
    deepest_features_mix: bool = True
    force_bigger_network: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, C, H, W) spectrograms (reference NCHW layout at the API)."""
        B = x.shape[0]
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        multi_ch = self.spectrogram_channels > 1
        mixer_1x1_ch = 1024 if multi_ch else 2048  # reference: encoder.py:46

        if "speccnn8l1" in self.architecture or "wavenet" in self.architecture:
            pass
        elif self.architecture != "flow_synth":
            raise NotImplementedError(f"Architecture '{self.architecture}'")

        if self.architecture == "speccnn8l1_bn":
            last_removed = 1 if self.deepest_features_mix else 2
            single_ch_cnn = SpectrogramCNN(
                self.architecture, last_layers_to_remove=last_removed,
                dtype=self.dtype, name="single_ch_cnn",
            )
            # shared weights across channels (reference: encoder.py:95-98)
            ch_outs = [
                single_ch_cnn(x[..., c:c + 1], train=train)
                for c in range(self.spectrogram_channels)
            ]
            h = jnp.concatenate(ch_outs, axis=-1)
            if self.deepest_features_mix:  # 1x1 deepest mixer (encoder.py:56-58)
                h = Conv2DBlock(
                    out_ch=mixer_1x1_ch, kernel_size=(1, 1), strides=(1, 1),
                    padding=(0, 0), activation=_LRELU, batch_norm=None,
                    dtype=self.dtype, name="mix8",
                )(h, train=train)
            else:  # 4x4 mixing conv then 1x1 (encoder.py:59-70)
                n_4x4_ch = (
                    1800 if self.force_bigger_network
                    else (512 if not multi_ch else 768)
                )
                h = Conv2DBlock(
                    out_ch=n_4x4_ch, kernel_size=(4, 4), strides=(2, 2),
                    padding=(2, 2), activation=_LRELU, dtype=self.dtype,
                    name="mix7",
                )(h, train=train)
                h = Conv2DBlock(
                    out_ch=mixer_1x1_ch, kernel_size=(1, 1), strides=(1, 1),
                    padding=(0, 0), activation=_LRELU, batch_norm=None,
                    dtype=self.dtype, name="mix8",
                )(h, train=train)
        else:
            # single-channel-only architectures (reference asserts
            # speccnn8l1_bn for multi-channel; encoder.py:53)
            assert self.spectrogram_channels == 1, (
                f"multi-channel input requires 'speccnn8l1_bn' "
                f"(got '{self.architecture}')"
            )
            h = SpectrogramCNN(self.architecture, dtype=self.dtype,
                               name="single_ch_cnn")(x, train=train)

        h = h.reshape(B, -1).astype(jnp.float32)
        # MLP head (reference: encoder.py:80-93)
        if "wavenet_baseline" in self.architecture or "speccnn8l1" in self.architecture:
            h = nn.Dropout(rate=self.fc_dropout, deterministic=not train)(h)
            h = nn.Dense(2 * self.dim_z, name="mlp_out")(h)
            if self.output_bn:  # flow-input regularizer (encoder.py:86-87)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name="lat_in_regularization",
                )(h)
        elif self.architecture == "flow_synth":
            h = nn.relu(nn.Dense(1024, name="mlp1")(h))
            h = nn.relu(nn.Dense(1024, name="mlp2")(h))
            h = nn.Dense(2 * self.dim_z, name="mlp_out")(h)
        return h.reshape(B, 2, self.dim_z)
