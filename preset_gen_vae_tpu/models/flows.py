"""Normalizing flows: RealNVP affine coupling, MAF (masked autoregressive),
inter-layer BatchNorm flows, and composition.

The reference delegates to the external ``nflows`` package
(reference: model/flows.py:42-90, model/VAE.py:110-127,
model/regression.py:139-164); this is an original JAX implementation of the
same flow families with the same structural rules:
  - RealNVP: checkerboard-masked affine coupling, mask flipped per layer,
    residual-MLP conditioners, optional BN inside conditioners, optional BN
    *between* coupling layers except the last two, dropout disabled on the
    last two layers (reference: flows.py:63-88).
  - MAF: ReversePermutation + masked affine autoregressive layer pairs
    (reference: VAE.py:110-116, regression.py:149-164). Forward is a single
    network pass; inverse is the sequential D-step recursion.

Every flow layer exposes ``forward(x, train) -> (y, logdet)`` and
``inverse(y, train) -> (x, logdet)`` where logdet has shape (B,).

TPU notes: conditioners are dense MLPs (MXU-friendly); all masks and
permutations are static so the whole flow jit-compiles to fixed shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def checkerboard_mask(features: int, even_transformed: bool) -> np.ndarray:
    """Boolean mask over feature slots; True = slot is TRANSFORMED by the
    coupling layer (False = identity/conditioning slot). The reference
    alternates the mask sign per layer (flows.py:63-64, 86)."""
    mask = np.zeros((features,), dtype=bool)
    if even_transformed:
        mask[::2] = True
    else:
        mask[1::2] = True
    return mask


class ResidualMLP(nn.Module):
    """Residual conditioner network (role of nflows ResidualNet used at
    reference flows.py:68-77): Dense-in, `num_blocks` two-layer residual
    blocks with optional BN and dropout, Dense-out."""

    out_features: int
    hidden_features: int
    num_blocks: int = 2
    dropout_p: float = 0.0
    use_batch_norm: bool = False
    # matmul compute dtype (params stay f32). bf16 puts the conditioner
    # GEMM chains — the train step's dominant cost at the parity batch —
    # on the MXU's fast path; all invertibility-critical coupling math and
    # the logdet stay f32 (the caller casts this module's output back).
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Dense(self.hidden_features, name="initial", dtype=self.dtype)(x)
        for b in range(self.num_blocks):
            res = h
            if self.use_batch_norm:
                res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   name=f"bn{b}_0", dtype=self.dtype)(res)
            res = nn.relu(res)
            res = nn.Dense(self.hidden_features, name=f"fc{b}_0",
                           dtype=self.dtype)(res)
            if self.use_batch_norm:
                res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   name=f"bn{b}_1", dtype=self.dtype)(res)
            res = nn.relu(res)
            if self.dropout_p > 0:
                res = nn.Dropout(rate=self.dropout_p, deterministic=not train)(res)
            res = nn.Dense(self.hidden_features, name=f"fc{b}_1",
                           dtype=self.dtype)(res)
            h = h + res
        return nn.Dense(self.out_features, name="final", dtype=self.dtype)(h)


class AffineCouplingLayer(nn.Module):
    """y[tr] = x[tr] * s(x[id]) + t(x[id]); y[id] = x[id].
    Scale parameterized as sigmoid(raw + 2) + 1e-3 (the standard stable
    coupling parameterization, as used by the nflows layers the reference
    builds on)."""

    features: int
    hidden_features: int
    transformed_mask: tuple  # tuple of bools, static
    num_blocks: int = 2
    dropout_p: float = 0.0
    bn_within: bool = False
    dtype: jnp.dtype = jnp.float32  # conditioner GEMM dtype; s/t/logdet f32

    def setup(self):
        mask = np.asarray(self.transformed_mask, dtype=bool)
        self._idx_tr = np.where(mask)[0]
        self._idx_id = np.where(~mask)[0]
        self.conditioner = ResidualMLP(
            out_features=2 * len(self._idx_tr),
            hidden_features=self.hidden_features,
            num_blocks=self.num_blocks,
            dropout_p=self.dropout_p,
            use_batch_norm=self.bn_within,
            dtype=self.dtype,
        )

    def _params(self, x_id, train):
        raw = self.conditioner(x_id, train=train).astype(jnp.float32)
        raw_s, t = jnp.split(raw, 2, axis=-1)
        s = jax.nn.sigmoid(raw_s + 2.0) + 1e-3
        return s, t

    def _scatter(self, x_id, x_tr):
        out = jnp.zeros((x_id.shape[0], self.features), dtype=x_id.dtype)
        out = out.at[:, self._idx_id].set(x_id)
        return out.at[:, self._idx_tr].set(x_tr)

    def forward(self, x, train: bool = True):
        x_id, x_tr = x[:, self._idx_id], x[:, self._idx_tr]
        s, t = self._params(x_id, train)
        y_tr = x_tr * s + t
        logdet = jnp.sum(jnp.log(s), axis=-1)
        return self._scatter(x_id, y_tr), logdet

    def inverse(self, y, train: bool = True):
        y_id, y_tr = y[:, self._idx_id], y[:, self._idx_tr]
        s, t = self._params(y_id, train)
        x_tr = (y_tr - t) / s
        logdet = -jnp.sum(jnp.log(s), axis=-1)
        return self._scatter(y_id, x_tr), logdet

    def __call__(self, x, train: bool = True):  # for init
        return self.forward(x, train)


class BatchNormFlow(nn.Module):
    """Invertible BatchNorm flow layer (role of nflows BatchNorm placed
    between coupling layers, reference flows.py:87-88). Train mode uses batch
    statistics (and updates running stats); inverse uses running statistics —
    hence, as the reference notes (VAE.py:122), BN-between-layers flows are
    only invertible in eval mode."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9

    def setup(self):
        self.log_gamma = self.param("log_gamma", nn.initializers.zeros, (self.features,))
        self.beta = self.param("beta", nn.initializers.zeros, (self.features,))
        self.ra_mean = self.variable("batch_stats", "mean",
                                     lambda: jnp.zeros((self.features,)))
        self.ra_var = self.variable("batch_stats", "var",
                                    lambda: jnp.ones((self.features,)))

    def forward(self, x, train: bool = True):
        if train:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            if not self.is_initializing():
                self.ra_mean.value = self.momentum * self.ra_mean.value + (1 - self.momentum) * mean
                self.ra_var.value = self.momentum * self.ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        y = jnp.exp(self.log_gamma) * (x - mean) * jax.lax.rsqrt(var + self.eps) + self.beta
        logdet_scalar = jnp.sum(self.log_gamma - 0.5 * jnp.log(var + self.eps))
        return y, jnp.full((x.shape[0],), logdet_scalar, dtype=x.dtype)

    def inverse(self, y, train: bool = True):
        mean, var = self.ra_mean.value, self.ra_var.value
        x = (y - self.beta) * jnp.exp(-self.log_gamma) * jnp.sqrt(var + self.eps) + mean
        logdet_scalar = -jnp.sum(self.log_gamma - 0.5 * jnp.log(var + self.eps))
        return x, jnp.full((y.shape[0],), logdet_scalar, dtype=y.dtype)

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)


class ReversePermutation(nn.Module):
    """(reference: VAE.py:113, regression.py:152)"""

    features: int

    def forward(self, x, train: bool = True):
        return x[:, ::-1], jnp.zeros((x.shape[0],), dtype=x.dtype)

    def inverse(self, y, train: bool = True):
        return y[:, ::-1], jnp.zeros((y.shape[0],), dtype=y.dtype)

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)


def _made_masks(features: int, hidden: int, n_hidden_layers: int):
    """MADE degree masks: strictly autoregressive output wrt input order."""
    rng = np.random.default_rng(0)  # deterministic degree assignment
    degrees_in = np.arange(1, features + 1)
    masks = []
    prev = degrees_in
    for _ in range(n_hidden_layers):
        deg_h = (np.arange(hidden) % max(features - 1, 1)) + 1
        masks.append((deg_h[None, :] >= prev[:, None]).astype(np.float32))
        prev = deg_h
    # output degrees: two blocks (shift, raw_scale), each with degree d must
    # depend only on inputs with degree < d
    out_mask = (degrees_in[None, :] > prev[:, None]).astype(np.float32)
    masks.append(np.concatenate([out_mask, out_mask], axis=1))
    return masks


class MaskedDense(nn.Module):
    features: int
    mask: np.ndarray  # (in_features, out_features) static 0/1 mask
    dtype: jnp.dtype = jnp.float32  # matmul dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.mask.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        masked = (kernel * jnp.asarray(self.mask, dtype=jnp.float32)).astype(self.dtype)
        return x.astype(self.dtype) @ masked + bias.astype(self.dtype)


class MaskedAffineAutoregressive(nn.Module):
    """MAF layer: forward y_d = x_d * s_d(x_<d) + t_d(x_<d) in ONE network
    pass; inverse is the D-step sequential recursion (reference behavior
    notes: regression.py:160-164). Scale = softplus(raw + c0) + 1e-3 with c0
    chosen so scale ~= 1 at init."""

    features: int
    hidden_features: int
    n_hidden_layers: int = 2
    dropout_p: float = 0.0
    use_batch_norm: bool = False
    dtype: jnp.dtype = jnp.float32  # masked-GEMM dtype; s/t/logdet f32

    def setup(self):
        masks = _made_masks(self.features, self.hidden_features, self.n_hidden_layers)
        self.layers = [
            MaskedDense(features=m.shape[1], mask=m, dtype=self.dtype)
            for m in masks
        ]
        if self.use_batch_norm:
            self.bns = [nn.BatchNorm(momentum=0.9) for _ in range(self.n_hidden_layers)]
        if self.dropout_p > 0:
            self.dropouts = [
                nn.Dropout(rate=self.dropout_p) for _ in range(self.n_hidden_layers)
            ]

    _SOFTPLUS_C0 = 0.5413248546129181  # softplus(c0) == 1

    def _params(self, x, train):
        h = x
        for i, layer in enumerate(self.layers[:-1]):
            h = layer(h)
            if self.use_batch_norm:
                h = self.bns[i](h, use_running_average=not train)
            h = nn.relu(h)
            if self.dropout_p > 0:
                h = self.dropouts[i](h, deterministic=not train)
        out = self.layers[-1](h).astype(jnp.float32)
        t, raw_s = jnp.split(out, 2, axis=-1)
        s = jax.nn.softplus(raw_s + self._SOFTPLUS_C0) + 1e-3
        return s, t

    def forward(self, x, train: bool = True):
        s, t = self._params(x, train)
        y = x * s + t
        return y, jnp.sum(jnp.log(s), axis=-1)

    def inverse(self, y, train: bool = True):
        def body(_, x):
            s, t = self._params(x, False)  # inverse: no dropout/BN updates
            return (y - t) / s

        x = jax.lax.fori_loop(0, self.features, body, jnp.zeros_like(y))
        s, _ = self._params(x, False)
        return x, -jnp.sum(jnp.log(s), axis=-1)

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)


class FlowSequence(nn.Module):
    """Composition of flow layers with summed log|det J|
    (role of nflows CompositeTransform)."""

    layers: Sequence[nn.Module]

    def forward(self, x, train: bool = True):
        logdet = jnp.zeros((x.shape[0],), dtype=x.dtype)
        for layer in self.layers:
            x, ld = layer.forward(x, train=train)
            logdet = logdet + ld
        return x, logdet

    def inverse(self, y, train: bool = True):
        logdet = jnp.zeros((y.shape[0],), dtype=y.dtype)
        for layer in reversed(self.layers):
            y, ld = layer.inverse(y, train=train)
            logdet = logdet + ld
        return y, logdet

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)


def parse_flow_arch(flow_arch: str):
    """'realnvp_6l300' -> ('realnvp', 6, 300)
    (reference parsing: VAE.py:100-109, regression.py:124-138)."""
    parts = flow_arch.split("_")
    if len(parts) < 2:
        raise AssertionError(
            "flow arch must contain a type and layer spec, e.g. 'realnvp_4l200'"
        )
    if len(parts) > 2:
        raise NotImplementedError("Optional flow arch arguments not supported yet")
    flow_type = parts[0].lower()
    n_layers_s, hidden_s = parts[1].split("l")
    return flow_type, int(n_layers_s), int(hidden_s)


class LatentFlow(nn.Module):
    """Builds the VAE latent flow z0 -> zK from an arch string
    (reference: VAE.py:100-127): RealNVP with BN inside conditioners, no BN
    between layers; or MAF as ReversePermutation + autoregressive pairs."""

    flow_arch: str
    features: int
    dtype: jnp.dtype = jnp.float32  # conditioner GEMM dtype

    def setup(self):
        flow_type, n_layers, hidden = parse_flow_arch(self.flow_arch)
        layers = []
        if flow_type == "maf":
            for _ in range(n_layers):
                layers.append(ReversePermutation(features=self.features))
                layers.append(
                    MaskedAffineAutoregressive(
                        features=self.features, hidden_features=hidden,
                        dtype=self.dtype,
                    )
                )
        elif flow_type in ("realnvp", "rnvp"):
            for l in range(n_layers):
                layers.append(
                    AffineCouplingLayer(
                        features=self.features,
                        hidden_features=hidden,
                        transformed_mask=tuple(
                            checkerboard_mask(self.features, l % 2 == 0).tolist()
                        ),
                        num_blocks=2,
                        bn_within=True,  # reference: VAE.py:121
                        dropout_p=0.0,
                        dtype=self.dtype,
                    )
                )
        else:
            raise NotImplementedError(f"Unavailable flow '{flow_type}'")
        self.flow = FlowSequence(layers=layers)

    def forward(self, x, train: bool = True):
        return self.flow.forward(x, train=train)

    def inverse(self, y, train: bool = True):
        return self.flow.inverse(y, train=train)

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)


class RegressionFlow(nn.Module):
    """Flow used for synth-param regression (reference: regression.py:139-164
    and CustomRealNVP rules, flows.py:66-88): RealNVP with BN between layers
    AND inside conditioners, dropout — all disabled on the last two layers;
    or MAF with dropout 0.5."""

    flow_arch: str
    features: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32  # conditioner GEMM dtype

    def setup(self):
        flow_type, n_layers, hidden = parse_flow_arch(self.flow_arch)
        layers = []
        if flow_type in ("realnvp", "rnvp"):
            for l in range(n_layers):
                not_last_two = l < (n_layers - 2)
                layers.append(
                    AffineCouplingLayer(
                        features=self.features,
                        hidden_features=hidden,
                        transformed_mask=tuple(
                            checkerboard_mask(self.features, l % 2 == 0).tolist()
                        ),
                        num_blocks=2,
                        bn_within=True,
                        dropout_p=self.dropout_p if not_last_two else 0.0,
                        dtype=self.dtype,
                    )
                )
                if not_last_two:  # BN between layers, none on last two
                    layers.append(BatchNormFlow(features=self.features))
        elif flow_type == "maf":
            for _ in range(n_layers):
                layers.append(ReversePermutation(features=self.features))
                layers.append(
                    MaskedAffineAutoregressive(
                        features=self.features, hidden_features=hidden,
                        dropout_p=0.5,  # reference: regression.py:158
                        dtype=self.dtype,
                    )
                )
        else:
            raise NotImplementedError(f"Unavailable flow '{flow_type}'")
        self.flow = FlowSequence(layers=layers)

    def forward(self, x, train: bool = True):
        return self.flow.forward(x, train=train)

    def inverse(self, y, train: bool = True):
        return self.flow.inverse(y, train=train)

    def __call__(self, x, train: bool = True):
        return self.forward(x, train)
