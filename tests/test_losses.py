"""Loss parity tests: the vectorized losses must match a straightforward
per-row/per-group oracle implementing the reference semantics
(reference: model/loss.py:73-315)."""

import numpy as np
import pytest

from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper
from preset_gen_vae_tpu.losses import (
    CategoricalParamsAccuracy,
    QuantizedNumericalParamsLoss,
    SynthParamsLoss,
)
from preset_gen_vae_tpu.synth import dexed_params as dx


@pytest.fixture(scope="module")
def helper():
    return PresetIndexesHelper(build_dexed_preset_spec(operators=[1, 2, 3]))


@pytest.fixture(scope="module")
def batch(helper, rng):
    """Random valid (v_out, v_in) learnable batch with some muted operators."""
    B = 12
    full = rng.random((B, 155)).astype(np.float32)
    card = helper.spec.cardinalities
    for i in range(155):
        if card[i] >= 2:
            full[:, i] = np.rint(full[:, i] * (card[i] - 1)) / (card[i] - 1)
    # mute operator 2 in some rows to exercise useless-param masking
    for b in (0, 3, 7):
        full[b, dx.op_param_index(2, dx.OFF_OUTPUT_LEVEL)] = 0.0
    v_in = helper.full_to_learnable_batch(full)
    v_out = np.clip(
        v_in + rng.normal(0, 0.15, v_in.shape).astype(np.float32), 0.0, 1.0
    )
    # make categorical outputs quasi-probabilities (post-hardtanh regression)
    return v_out, v_in


def _oracle_synth_params_loss(
    h, v_out, v_in, normalize, cat_factor, cat_bce, cat_softmax, cat_softmax_t
):
    """Literal per-row transcription of reference loss.py:117-183."""
    v_in = v_in.copy()
    v_out = v_out.copy()
    B = v_in.shape[0]
    useless_num, useless_cat = [], []
    for b in range(B):
        n, c = h.get_useless_learned_params_indexes(v_in[b])
        useless_num.append(set(n))
        useless_cat.append(set(c))
    num_idx = list(h.num_learn_idx)
    for b in range(B):
        for i in num_idx:
            if i in useless_num[b]:
                v_in[b, i] = 0.0
                v_out[b, i] = 0.0
    if normalize:
        num_loss = np.mean((v_out[:, num_idx] - v_in[:, num_idx]) ** 2)
    else:
        num_loss = np.sum((v_out[:, num_idx] - v_in[:, num_idx]) ** 2) / B
    cat_loss = 0.0
    groups = h.get_categorical_learnable_indexes()
    for g_idx in groups:
        rows = [b for b in range(B) if g_idx[0] not in useless_cat[b]]
        q = v_out[np.ix_(rows, g_idx)]
        t = v_in[np.ix_(rows, g_idx)]
        if not cat_bce:
            if cat_softmax:
                e = np.exp(q / cat_softmax_t - np.max(q / cat_softmax_t, axis=1, keepdims=True))
                q = e / e.sum(axis=1, keepdims=True)
            sel = q[t.astype(bool)]
            cat_loss += -np.sum(np.log(np.maximum(sel, 1e-38))) / len(rows)
        else:
            qc = np.clip(q, 1e-7, 1 - 1e-7)
            bce = -(t * np.log(qc) + (1 - t) * np.log(1 - qc))
            cat_loss += bce.mean() / 8.0
    if normalize:
        cat_loss /= len(groups)
    return num_loss + cat_loss * cat_factor


@pytest.mark.parametrize("normalize", [True, False])
def test_synth_params_loss_cce(helper, batch, normalize):
    v_out, v_in = batch
    loss = SynthParamsLoss(helper, normalize, cat_bce=False, cat_softmax=False)
    ours = float(loss(v_out, v_in))
    ref = _oracle_synth_params_loss(
        helper, v_out, v_in, normalize, 0.2, False, False, 0.1
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_synth_params_loss_cce_softmax(helper, batch):
    v_out, v_in = batch
    loss = SynthParamsLoss(
        helper, True, cat_bce=False, cat_softmax=True, cat_softmax_t=0.2
    )
    ours = float(loss(v_out, v_in))
    ref = _oracle_synth_params_loss(helper, v_out, v_in, True, 0.2, False, True, 0.2)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_synth_params_loss_bce(helper, batch):
    v_out, v_in = batch
    loss = SynthParamsLoss(helper, True, cat_bce=True, cat_softmax=False)
    ours = float(loss(v_out, v_in))
    ref = _oracle_synth_params_loss(helper, v_out, v_in, True, 0.2, True, False, 0.1)
    assert ours == pytest.approx(ref, rel=1e-4)


def _oracle_quantized_loss(h, v_out, v_in, kind, limited=None):
    """Literal transcription of reference loss.py:216-261."""
    cols_in, cols_out = [], []
    for vst_idx, learn_idx in sorted(h.num_idx_learned_as_num.items()):
        if limited is not None and vst_idx not in limited:
            continue
        u_in = v_in[:, learn_idx].copy()
        u_out = v_out[:, learn_idx].copy()
        card = h.spec.cardinalities[vst_idx]
        if card > 0:
            u_out = np.rint(u_out * (card - 1.0)) / (card - 1.0)
        cols_in.append(u_in)
        cols_out.append(u_out)
    for vst_idx, learn_idxs in sorted(h.num_idx_learned_as_cat.items()):
        if limited is not None and vst_idx not in limited:
            continue
        card = len(learn_idxs)
        cols_in.append(np.argmax(v_in[:, learn_idxs], axis=-1) / (card - 1.0))
        cols_out.append(np.argmax(v_out[:, learn_idxs], axis=-1) / (card - 1.0))
    n_total = len(h.num_idx_learned_as_num) + len(h.num_idx_learned_as_cat)
    U_in = np.zeros((v_in.shape[0], n_total))
    U_out = np.zeros((v_in.shape[0], n_total))
    for c, (ci, co) in enumerate(zip(cols_in, cols_out)):
        U_in[:, c], U_out[:, c] = ci, co
    err = U_out - U_in
    return float(np.mean(err ** 2) if kind == "mse" else np.mean(np.abs(err)))


@pytest.mark.parametrize("kind", ["mse", "mae"])
def test_quantized_numerical_loss(helper, batch, kind):
    v_out, v_in = batch
    loss = QuantizedNumericalParamsLoss(helper, loss=kind)
    ours = float(loss(v_out, v_in))
    ref = _oracle_quantized_loss(helper, v_out, v_in, kind)
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-7)


def test_quantized_numerical_loss_limited_subset(helper, batch):
    v_out, v_in = batch
    limited = set(dx.midi_key_related_param_indexes())
    loss = QuantizedNumericalParamsLoss(
        helper, loss="mae", limited_vst_params_indexes=sorted(limited)
    )
    ours = float(loss(v_out, v_in))
    ref = _oracle_quantized_loss(helper, v_out, v_in, "mae", limited=limited)
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-7)


def _oracle_accuracy(h, v_out, v_in, limited=None):
    accs = {}
    for vst_idx, learn_idx in sorted(h.cat_idx_learned_as_num.items()):
        if limited is not None and vst_idx not in limited:
            continue
        card = h.spec.cardinalities[vst_idx]
        t = np.rint(v_in[:, learn_idx] * (card - 1.0)).astype(int)
        o = np.rint(v_out[:, learn_idx] * (card - 1.0)).astype(int)
        accs[vst_idx] = float((t == o).mean())
    for vst_idx, learn_idxs in sorted(h.cat_idx_learned_as_cat.items()):
        if limited is not None and vst_idx not in limited:
            continue
        t = np.argmax(v_in[:, learn_idxs], axis=-1)
        o = np.argmax(v_out[:, learn_idxs], axis=-1)
        accs[vst_idx] = float((t == o).mean())
    return 100.0 * np.mean(list(accs.values()))


def test_categorical_accuracy(helper, batch):
    v_out, v_in = batch
    acc = CategoricalParamsAccuracy(helper, reduce=True, percentage_output=True)
    ours = float(acc(v_out, v_in))
    ref = _oracle_accuracy(helper, v_out, v_in)
    assert ours == pytest.approx(ref, rel=1e-5)
    # perfect prediction -> 100%
    assert float(acc(v_in, v_in)) == pytest.approx(100.0)


def test_categorical_accuracy_limited(helper, batch):
    v_out, v_in = batch
    limited = set(dx.midi_key_related_param_indexes())
    acc = CategoricalParamsAccuracy(
        helper, reduce=True, limited_vst_params_indexes=sorted(limited)
    )
    ours = float(acc(v_out, v_in))
    ref = _oracle_accuracy(helper, v_out, v_in, limited=limited)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_vae_losses_basic_shapes():
    import jax.numpy as jnp

    from preset_gen_vae_tpu.losses import (
        GaussianDkl,
        L2Loss,
        flow_vae_latent_loss,
        latent_dkl_loss,
        reconstruction_loss,
    )

    B, D = 4, 8
    g = np.random.default_rng(0)
    x_in = jnp.asarray(g.standard_normal((B, 1, 16, 16)), jnp.float32)
    x_out = x_in + 0.1
    # normalized MSE == mean of squares
    assert float(reconstruction_loss(x_out, x_in, True)) == pytest.approx(0.01, rel=1e-3)
    # non-normalized L2 == sum / batch
    assert float(L2Loss()(x_out, x_in)) == pytest.approx(0.01 * 256, rel=1e-3)
    mu_logvar = jnp.zeros((B, 2, D))
    # standard normal posterior -> zero Dkl
    assert float(latent_dkl_loss(mu_logvar, True)) == pytest.approx(0.0, abs=1e-6)
    assert float(GaussianDkl(False)(mu_logvar[:, 0], mu_logvar[:, 1])) == pytest.approx(
        0.0, abs=1e-6
    )
    z = jnp.asarray(g.standard_normal((B, D)), jnp.float32)
    ld = jnp.zeros((B,))
    # identity flow, q == p at mu=0 logvar=0: loss = -E[log p(z) - log q(z)] = 0
    assert float(flow_vae_latent_loss(mu_logvar, z, z, ld, False)) == pytest.approx(
        0.0, abs=1e-5
    )
