"""Train/eval step tests: one SPMD step over the virtual 8-device CPU mesh,
loss decrease over a few steps, LR override plumbing, plateau scheduler
semantics, NaN guard."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.parallel import make_mesh, shard_batch
from preset_gen_vae_tpu.training import (
    ReduceLROnPlateau,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from preset_gen_vae_tpu.training.train_step import (
    get_learning_rate,
    set_learning_rate,
)


@pytest.fixture(scope="module")
def helper():
    return PresetIndexesHelper(build_dexed_preset_spec(operators=[1, 2]))


def _small_setup(helper, latent_flow=None, reg="mlp_2l64", dim_z=16):
    model_c = cfg.ModelConfig(
        latent_flow_arch=latent_flow,
        params_regression_architecture=reg,
        dim_z=dim_z,
        encoder_architecture="speccnn8l1_bn",
    )
    train_c = cfg.TrainConfig(minibatch_size=8, compute_dtype="float32")
    model_c, train_c = cfg.resolve(model_c, train_c)
    model_c = dataclasses.replace(
        model_c,
        learnable_params_tensor_length=helper.learnable_preset_size,
        synth_params_count=helper.learnable_preset_size,
    )
    if reg.startswith("flow_"):
        model_c = dataclasses.replace(model_c, dim_z=helper.learnable_preset_size)
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    return model_c, train_c, ext, variables


def _fake_batch(helper, B, rng):
    x = rng.standard_normal((B, 1, 257, 347)).astype(np.float32)
    full = rng.random((B, helper.full_preset_size)).astype(np.float32)
    v = helper.full_to_learnable_batch(full)
    info = np.stack(
        [np.arange(B), np.full(B, 60), np.full(B, 85)], axis=1
    ).astype(np.int32)
    return x, v, info


@pytest.mark.slow
def test_train_step_runs_and_learns(helper):
    model_c, train_c, ext, variables = _small_setup(helper)
    state = create_train_state(ext, variables, train_c)
    step = jax.jit(make_train_step(ext, model_c, train_c, helper))
    # fixed-seed batch: the overfit assertion below must not depend on
    # which tests consumed the shared session rng first
    x, v, info = _fake_batch(helper, 8, np.random.default_rng(42))
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        state, metrics = step(state, x, v, info, key, jnp.float32(0.2))
        losses.append(float(metrics["TotalLoss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch must overfit quickly
    assert int(state.step) == 4
    # metric shapes
    assert metrics["latents"]["z0_mu"].shape == (8, model_c.dim_z)


@pytest.mark.slow
def test_train_step_sharded_on_mesh(helper, rng):
    """The same step, explicitly sharded over all 8 virtual devices —
    validates the GSPMD data-parallel path (replacement for DataParallel,
    reference train.py:95-97)."""
    model_c, train_c, ext, variables = _small_setup(helper)
    state = create_train_state(ext, variables, train_c)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 8
    step = jax.jit(make_train_step(ext, model_c, train_c, helper))
    x, v, info = _fake_batch(helper, 2 * n_dev, rng)
    xb, vb, ib = shard_batch(mesh, (x, v, info))
    state, metrics = step(state, xb, vb, ib, jax.random.PRNGKey(0), jnp.float32(0.2))
    assert np.isfinite(float(metrics["TotalLoss"]))


@pytest.mark.slow
def test_eval_step_deterministic(helper, rng):
    model_c, train_c, ext, variables = _small_setup(helper)
    state = create_train_state(ext, variables, train_c)
    estep = jax.jit(
        make_eval_step(ext, model_c, train_c, helper, return_outputs=True)
    )
    x, v, info = _fake_batch(helper, 8, rng)
    m1 = estep(state, x, v, info)
    m2 = estep(state, x, v, info)
    np.testing.assert_array_equal(np.asarray(m1["x_out"]), np.asarray(m2["x_out"]))
    assert m1["v_out"].shape == (8, helper.learnable_preset_size)


@pytest.mark.slow
def test_learning_rate_override(helper):
    _, train_c, ext, variables = _small_setup(helper)
    state = create_train_state(ext, variables, train_c)
    assert get_learning_rate(state) == pytest.approx(train_c.initial_learning_rate)
    state = set_learning_rate(state, 1e-5)
    assert get_learning_rate(state) == pytest.approx(1e-5)


def test_reduce_lr_on_plateau_semantics():
    s = ReduceLROnPlateau(1e-3, factor=0.1, patience=2, cooldown=1, threshold=1e-4)
    # improving: no reduction
    for v in [10.0, 9.0, 8.0]:
        assert s.step(v) == pytest.approx(1e-3)
    # plateau: reduction after patience+1 bad epochs
    assert s.step(8.0) == pytest.approx(1e-3)  # bad 1
    assert s.step(8.0) == pytest.approx(1e-3)  # bad 2
    assert s.step(8.0) == pytest.approx(1e-4)  # bad 3 > patience -> reduce
    # cooldown absorbs the next bad epoch
    assert s.step(8.0) == pytest.approx(1e-4)
    # round-trip state
    d = s.state_dict()
    s2 = ReduceLROnPlateau(1e-3)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best


@pytest.mark.slow
def test_remat_matches_baseline(helper):
    """jax.checkpoint rematerialization must not change the math."""
    model_c, train_c, ext, variables = _small_setup(helper)
    x, v, info = _fake_batch(helper, 8, np.random.default_rng(5))
    key = jax.random.PRNGKey(1)
    outs = []
    for remat in (False, True):
        tc = dataclasses.replace(train_c, remat=remat)
        state = create_train_state(ext, variables, tc)
        step = jax.jit(make_train_step(ext, model_c, tc, helper))
        state, m = step(state, x, v, info, key, jnp.float32(0.2))
        outs.append(float(m["TotalLoss"]))
    assert outs[0] == pytest.approx(outs[1], rel=1e-5)
