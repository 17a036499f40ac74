"""Synth-parameter regression heads (reference: model/regression.py:20-189).

``PresetActivation`` is fully vectorized: the reference loops over
categorical groups in Python applying one softmax per group
(regression.py:47-50); here every group is gathered into one padded
(B, G, max_card) tensor, soft-maxed with a padding mask, and scattered back —
a single fused XLA kernel regardless of the number of groups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.preset import PresetIndexesHelper
from .flows import RegressionFlow


def segment_softmax_scatter(
    x: jnp.ndarray,
    idx_matrix: np.ndarray,
    mask: np.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Applies an in-group softmax to every (padded) categorical group of a
    learnable tensor and writes results back in place of the logits.

    :param x: (B, L) learnable tensor
    :param idx_matrix: (G, C) learnable indexes per group, -1 pad
    :param mask: (G, C) True where idx valid
    """
    if idx_matrix.size == 0:
        return x
    gathered = x[:, np.maximum(idx_matrix, 0)]  # (B, G, C)
    gathered = jnp.where(mask[None, :, :], gathered / temperature, -jnp.inf)
    probs = jax.nn.softmax(gathered, axis=-1)
    flat_idx = idx_matrix[mask]  # static (sum cards,)
    return x.at[:, flat_idx].set(probs[:, mask])


def preset_activation(
    x: jnp.ndarray,
    idx_helper: PresetIndexesHelper,
    cat_softmax: bool,
    numerical_max: float = 1.0,
) -> jnp.ndarray:
    """Per-parameter output activation (reference: regression.py:20-53):
    Hardtanh[0,1] on numerical slots; softmax per categorical group when
    ``cat_softmax`` else Hardtanh on those too."""
    if not cat_softmax:
        return jnp.clip(x, 0.0, numerical_max)
    num_idx = idx_helper.num_learn_idx
    if len(num_idx):
        x = x.at[:, num_idx].set(jnp.clip(x[:, num_idx], 0.0, numerical_max))
    return segment_softmax_scatter(
        x, idx_helper.cat_group_idx_matrix, idx_helper.cat_group_mask
    )


class MLPRegression(nn.Module):
    """'3l1024'-style MLP: hidden Dense stack with BN + dropout on all but
    the last hidden layer, ReLU activations, final Dense to the learnable
    preset size, then PresetActivation (reference: regression.py:61-102)."""

    architecture: str  # e.g. '3l1024'
    dim_z: int
    idx_helper: PresetIndexesHelper
    dropout_p: float = 0.0
    cat_softmax_activation: bool = False
    dtype: jnp.dtype = jnp.float32  # GEMM dtype; activation math stays f32

    @nn.compact
    def __call__(self, z_K, train: bool = True):
        arch = self.architecture.split("_")
        if len(arch) != 1:
            raise NotImplementedError("Arch suffix arguments not implemented yet")
        n_layers, n_neurons = (int(v) for v in arch[0].split("l"))
        h = z_K
        for l in range(n_layers):
            h = nn.Dense(n_neurons, name=f"fc{l + 1}", dtype=self.dtype)(h)
            if l < n_layers - 1:  # no BN/dropout on the last hidden layer
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    name=f"bn{l + 1}", dtype=self.dtype,
                )(h)
                h = nn.Dropout(rate=self.dropout_p, deterministic=not train)(h)
            h = nn.relu(h)
        h = nn.Dense(self.idx_helper.learnable_preset_size,
                     name=f"fc{n_layers + 1}", dtype=self.dtype)(h)
        return preset_activation(h.astype(jnp.float32), self.idx_helper,
                                 self.cat_softmax_activation)


class FlowRegression(nn.Module):
    """Invertible flow mapping z_K <-> learnable preset v
    (reference: regression.py:105-189). ``fast_forward_flow`` selects which
    flow direction implements z_K -> v (reference: regression.py:168-184)."""

    architecture: str  # e.g. 'realnvp_6l300'
    dim_z: int
    idx_helper: PresetIndexesHelper
    dropout_p: float = 0.0
    fast_forward_flow: bool = True
    cat_softmax_activation: bool = False
    dtype: jnp.dtype = jnp.float32  # conditioner GEMM dtype (flows.py)

    def setup(self):
        assert self.dim_z == self.idx_helper.learnable_preset_size, (
            "flow regression requires dim_z == learnable preset length "
            "(reference: model/build.py:70, data/build.py:37-39)"
        )
        self.flow = RegressionFlow(
            flow_arch=self.architecture,
            features=self.dim_z,
            dropout_p=self.dropout_p,
            dtype=self.dtype,
        )

    def _zk_to_v(self, z_K, train):
        if self.fast_forward_flow:
            return self.flow.forward(z_K, train=train)
        return self.flow.inverse(z_K, train=train)

    def flow_inverse(self, v, train: bool = False):
        """v -> z_K direction (used by FlowParamsLoss, reference loss.py:340)."""
        if self.fast_forward_flow:
            return self.flow.inverse(v, train=train)
        return self.flow.forward(v, train=train)

    def __call__(self, z_K, train: bool = True):
        v_out, _ = self._zk_to_v(z_K, train)
        return preset_activation(v_out, self.idx_helper, self.cat_softmax_activation)
