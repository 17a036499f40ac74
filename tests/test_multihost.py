"""Multi-host helpers on a single process (process_count == 1): the global
mesh covers all 8 virtual devices, host item ranges tile the corpus, and a
process-local batch becomes a correctly sharded global array."""

import jax
import numpy as np

from preset_gen_vae_tpu.parallel.multihost import (
    global_mesh,
    host_item_range,
    initialize_distributed,
    make_global_batch,
)


def test_initialize_noop_single_process():
    initialize_distributed()  # must not raise or connect anything
    assert jax.process_count() == 1


def test_host_item_range_tiles_corpus():
    start, end = host_item_range(1000)
    assert (start, end) == (0, 1000)  # single process owns everything


def test_make_global_batch_sharded():
    mesh = global_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    batch = make_global_batch(mesh, {"x": x})
    gx = batch["x"]
    assert gx.shape == (16, 3)
    # sharded over the data axis: each of the 8 devices holds 2 rows
    assert len(gx.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(gx), x)


def test_tp_sharding_rules():
    """Tensor-parallel param rules: big 2-D kernels shard over 'model',
    small tensors and mismatched dims stay replicated."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from preset_gen_vae_tpu.parallel.sharding_rules import (
        make_2d_mesh,
        param_spec,
        shard_params,
    )

    mesh = make_2d_mesh(4, 2)
    big = jnp.zeros((512, 1024))
    small = jnp.zeros((16, 16))
    bias = jnp.zeros((1024,))
    odd = jnp.zeros((513, 1023))  # neither dim divisible by 2... 513 odd
    assert param_spec(big, mesh, 1 << 14) == P(None, "model")
    assert param_spec(small, mesh, 1 << 14) == P()
    assert param_spec(bias, mesh, 1 << 14) == P()
    assert param_spec(odd, mesh, 1 << 14) == P()
    placed = shard_params({"k": big, "b": bias}, mesh, 1 << 14)
    assert len(placed["k"].sharding.device_set) == 8
