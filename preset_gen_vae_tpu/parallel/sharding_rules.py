"""Parameter sharding rules: tensor parallelism for the large dense layers.

The reference has no tensor parallelism (its only distribution is
DataParallel replication, SURVEY.md §2.10); on TPU the natural extension is
a 2-D mesh ``(data, model)`` where the handful of very large kernels — the
encoder's flatten->2*dim_z projection, the decoder's dim_z->feature-map
projection, and the widest flow-conditioner matrices — are sharded over the
``model`` axis. GSPMD inserts the all-gather / reduce-scatter pairs; no
layer code changes.

The rule is size-driven rather than name-driven: any 2-D kernel with at
least ``min_elements`` entries whose larger dimension divides the model-axis
size gets sharded along that dimension. Everything else (biases, BN stats,
small kernels, conv filters) stays replicated — sharding small tensors
costs more in collective latency than it saves in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def param_spec(path_leaf, mesh: Mesh, min_elements: int = 1 << 18) -> P:
    """PartitionSpec for one parameter leaf (see module docstring)."""
    x = path_leaf
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model <= 1 or x.ndim != 2 or x.size < min_elements:
        return P()
    d_out, d_in = x.shape[1], x.shape[0]
    if d_out % n_model == 0:
        return P(None, MODEL_AXIS)  # column (output-feature) sharding
    if d_in % n_model == 0:
        return P(MODEL_AXIS, None)  # row (input-feature) sharding
    return P()


def shard_params(params, mesh: Mesh, min_elements: int = 1 << 18):
    """Places a params pytree on the mesh with TP rules applied."""

    def _place(x):
        return jax.device_put(
            x, NamedSharding(mesh, param_spec(x, mesh, min_elements))
        )

    return jax.tree_util.tree_map(_place, params)


def count_sharded(params, mesh: Mesh, min_elements: int = 1 << 18):
    """(n_sharded_leaves, sharded_elements, total_elements) — for logging."""
    n, se, te = 0, 0, 0
    for x in jax.tree_util.tree_leaves(params):
        te += x.size
        if param_spec(x, mesh, min_elements) != P():
            n += 1
            se += x.size
    return n, se, te
