"""Model zoo tests: shapes through the full extended AE, flow invertibility,
torch-geometry transposed conv, preset activation semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from preset_gen_vae_tpu import config as cfg
from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.models import flows as F
from preset_gen_vae_tpu.models.layers import TorchConvTranspose2d
from preset_gen_vae_tpu.models.regression import preset_activation


def test_tconv_matches_torch_geometry_and_values(rng):
    """Our transposed conv must equal torch ConvTranspose2d bit-for-bit
    (same weights), since the reference decoders rely on its geometry
    (reference: model/decoder.py:199-220)."""
    B, Cin, Cout, H, W = 2, 3, 5, 7, 9
    # Integer-valued weights/inputs make f32 products exact, so ANY
    # difference is structural (orientation/padding), not rounding
    # (torch-CPU oneDNN reorders accumulation otherwise).
    for (k, s, p, op) in [((4, 4), (2, 2), (2, 2), (1, 0)),
                          ((5, 5), (2, 2), (2, 2), (0, 0)),
                          ((1, 1), (1, 1), (0, 0), (0, 0)),
                          ((7, 7), (2, 2), (3, 3), (1, 1))]:
        x = rng.integers(-3, 4, (B, Cin, H, W)).astype(np.float32)
        w = rng.integers(-3, 4, (Cin, Cout, k[0], k[1])).astype(np.float32)
        b = rng.integers(-3, 4, (Cout,)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(Cin, Cout, k, s, p, op, bias=True)
        with torch.no_grad():
            tconv.weight.copy_(torch.tensor(w))
            tconv.bias.copy_(torch.tensor(b))
        ref = tconv(torch.tensor(x)).detach().numpy()
        mod = TorchConvTranspose2d(
            features=Cout, kernel_size=k, strides=s, padding=p, output_padding=op
        )
        variables = {
            "params": {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
                "bias": jnp.asarray(b),
            }
        }
        ours = mod.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=0.0)


@pytest.fixture(scope="module")
def small_helper():
    """A reduced Dexed spec (2 operators) keeps flow dims small for tests."""
    return PresetIndexesHelper(build_dexed_preset_spec(operators=[1, 2]))


def _tiny_configs(model_kwargs=None, train_kwargs=None):
    m = cfg.ModelConfig(**(model_kwargs or {}))
    t = cfg.TrainConfig(minibatch_size=2, compute_dtype="float32",
                        **(train_kwargs or {}))
    return cfg.resolve(m, t)


@pytest.mark.slow
def test_basic_vae_mlp_regression_shapes(small_helper):
    model_c, train_c = _tiny_configs(
        dict(latent_flow_arch=None, params_regression_architecture="mlp_2l128",
             dim_z=32)
    )
    model_c = dataclasses.replace(
        model_c, learnable_params_tensor_length=small_helper.learnable_preset_size
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, small_helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    x = jnp.zeros((2, 1, 257, 347), dtype=jnp.float32)
    info = jnp.zeros((2, 3), dtype=jnp.int32)
    outs, _ = ext.apply(
        variables, x, info, train=True, method=ext.forward_full,
        rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    z0_mu_logvar, z0, zK, logdet, x_out, v_out = outs
    assert z0_mu_logvar.shape == (2, 2, 32)
    assert z0.shape == (2, 32) and zK.shape == (2, 32)
    assert logdet.shape == (2,) and np.allclose(np.asarray(logdet), 0.0)
    assert x_out.shape == (2, 1, 257, 347)
    assert v_out.shape == (2, small_helper.learnable_preset_size)
    assert np.isfinite(np.asarray(x_out)).all()
    # Hardtanh output bound (reference: decoder Hardtanh, regression Hardtanh)
    assert np.asarray(x_out).min() >= -1.0 and np.asarray(x_out).max() <= 1.0


@pytest.mark.slow
def test_flow_vae_flow_regression_shapes(small_helper):
    L = small_helper.learnable_preset_size
    model_c, train_c = _tiny_configs(
        dict(latent_flow_arch="realnvp_4l64",
             params_regression_architecture="flow_realnvp_4l64")
    )
    # flow regression: dim_z forced to learnable length (data/build.py:37-39)
    model_c = dataclasses.replace(
        model_c, dim_z=L, learnable_params_tensor_length=L
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, small_helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    x = jnp.zeros((2, 1, 257, 347), dtype=jnp.float32)
    info = jnp.asarray([[0, 60, 85], [1, 60, 85]], dtype=jnp.int32)
    outs, _ = ext.apply(
        variables, x, info, train=True, method=ext.forward_full,
        rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    z0_mu_logvar, z0, zK, logdet, x_out, v_out = outs
    assert zK.shape == (2, L) and v_out.shape == (2, L)
    assert not np.allclose(np.asarray(logdet), 0.0)  # flow actually transforms
    assert np.isfinite(np.asarray(v_out)).all()
    # categorical groups sum to 1 is NOT expected here (params_reg_softmax
    # defaults False -> hardtanh on all outputs, reference config.py:27)
    assert np.asarray(v_out).min() >= 0.0 and np.asarray(v_out).max() <= 1.0


@pytest.mark.slow
def test_realnvp_inverse_consistency():
    """The inverse is analytically exact; each inverse coupling step divides
    by s, so at random init f32 rounding can amplify by orders of magnitude
    through a 4-layer stack. Verify exactness in f64 (~1e-10) and only
    boundedness in f32."""
    flow = F.LatentFlow(flow_arch="realnvp_4l32", features=16)
    x32 = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)), jnp.float32)
    variables = flow.init(jax.random.PRNGKey(0), x32, train=False)
    y, ld = flow.apply(variables, x32, train=False, method=flow.forward)
    x_rec, ld_inv = flow.apply(variables, y, train=False, method=flow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x32), atol=0.5)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=0.1)
    try:
        jax.config.update("jax_enable_x64", True)
        x64 = x32.astype(jnp.float64)
        v64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a,
            variables,
        )
        y, ld = flow.apply(v64, x64, train=False, method=flow.forward)
        x_rec, ld_inv = flow.apply(v64, y, train=False, method=flow.inverse)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x64), atol=1e-8)
        np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_regression_flow_bn_inverse_consistency_eval():
    """BN-between-layers flows are invertible in eval mode only
    (reference caveat: VAE.py:122)."""
    flow = F.RegressionFlow(flow_arch="realnvp_4l32", features=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16)), jnp.float32)
    variables = flow.init(jax.random.PRNGKey(0), x, train=True)
    # run some train steps to move BN running stats
    for i in range(3):
        _, updates = flow.apply(
            variables, x + 0.1 * i, train=True, method=flow.forward,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(i)},
        )
        variables = {**variables, "batch_stats": updates["batch_stats"]}
    y, ld = flow.apply(variables, x, train=False, method=flow.forward)
    x_rec, ld_inv = flow.apply(variables, y, train=False, method=flow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-3)


def test_maf_forward_inverse_consistency():
    flow = F.LatentFlow(flow_arch="maf_2l32", features=8)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 8)), jnp.float32)
    variables = flow.init(jax.random.PRNGKey(0), x, train=False)
    y, ld = flow.apply(variables, x, train=False, method=flow.forward)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    x_rec, ld_inv = flow.apply(variables, y, train=False, method=flow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-3)


@pytest.mark.slow
def test_maf_autoregressive_property():
    """Output dim d of the MADE conditioner must not depend on inputs >= d."""
    made = F.MaskedAffineAutoregressive(features=6, hidden_features=16)
    x = jnp.zeros((1, 6))
    variables = made.init(jax.random.PRNGKey(0), x, train=False)

    def out_d(x_flat):
        y, _ = made.apply(variables, x_flat[None, :], train=False,
                          method=made.forward)
        return y[0]

    J = jax.jacobian(out_d)(jnp.ones((6,)))  # (6, 6)
    J = np.asarray(J)
    # strictly autoregressive in the affine params: dy_d/dx_e == 0 for e > d
    upper = np.triu(np.ones((6, 6)), k=1).astype(bool)
    assert np.allclose(J[upper], 0.0), J


def test_preset_activation_softmax_groups(small_helper):
    h = small_helper
    B, L = 3, h.learnable_preset_size
    x = jnp.asarray(np.random.default_rng(3).standard_normal((B, L)), jnp.float32)
    out = np.asarray(preset_activation(x, h, cat_softmax=True))
    # numerical slots clipped to [0, 1]
    num = out[:, h.num_learn_idx]
    assert num.min() >= 0.0 and num.max() <= 1.0
    # each categorical group sums to 1
    for g in range(h.n_cat_groups):
        idxs = h.cat_group_idx_matrix[g][h.cat_group_mask[g]]
        np.testing.assert_allclose(out[:, idxs].sum(axis=1), 1.0, atol=1e-5)
    # hardtanh-everything mode
    out2 = np.asarray(preset_activation(x, h, cat_softmax=False))
    assert out2.min() >= 0.0 and out2.max() <= 1.0


@pytest.mark.slow
def test_encoder_all_architectures_shapes():
    """Every published architecture must produce (B, 2, dim_z) on the
    reference 257x347 input (reference: encoder.py:8-20)."""
    from preset_gen_vae_tpu.models.encoder import (
        SpectrogramEncoder,
        available_architectures,
    )

    x = jnp.zeros((1, 1, 257, 347), dtype=jnp.float32)
    for arch in available_architectures():
        enc = SpectrogramEncoder(architecture=arch, dim_z=16, fc_dropout=0.0)
        variables = enc.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False
        )
        out = enc.apply(variables, x, train=False)
        assert out.shape == (1, 2, 16), arch


@pytest.mark.slow
def test_params_reg_softmax_activation(small_helper):
    """params_reg_softmax=True: categorical groups leave the regression head
    as softmax distributions summing to 1 (reference: regression.py:20-53,
    config.py:27)."""
    model_c, train_c = _tiny_configs(
        dict(latent_flow_arch=None, params_regression_architecture="mlp_2l64",
             dim_z=16, params_reg_softmax=True)
    )
    model_c = dataclasses.replace(
        model_c, learnable_params_tensor_length=small_helper.learnable_preset_size
    )
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, small_helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    x = jnp.zeros((2, 1, 257, 347), dtype=jnp.float32)
    info = jnp.asarray([[0, 60, 85], [1, 60, 85]], dtype=jnp.int32)
    outs = ext.apply(variables, x, info, train=False, method=ext.forward_full)
    v_out = np.asarray(outs[-1])
    h = small_helper
    for g in range(h.n_cat_groups):
        idx = h.cat_group_idx_matrix[g][h.cat_group_mask[g]]
        np.testing.assert_allclose(v_out[:, idx].sum(axis=1), 1.0, atol=1e-5)
