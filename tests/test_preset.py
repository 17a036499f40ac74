"""Preset domain layer tests: index translation, one-hot round trip, useless
parameter masks. Parity targets cited from reference data/preset.py and
data/dexeddataset.py."""

import numpy as np
import pytest

from preset_gen_vae_tpu.data.dexed_spec import build_dexed_preset_spec
from preset_gen_vae_tpu.data.preset import PresetIndexesHelper, PresetSpec
from preset_gen_vae_tpu.synth import dexed_params as dx


@pytest.fixture(scope="module")
def helper_default():
    """Default train config: all algos, all ops, 'all<=32' categorical."""
    return PresetIndexesHelper(build_dexed_preset_spec())


@pytest.fixture(scope="module")
def helper_num_only():
    return PresetIndexesHelper(
        build_dexed_preset_spec(vst_params_learned_as_categorical=None)
    )


def test_metadata_tables_match_reference():
    """Cardinalities / num / cat tables vs values printed by the reference
    (synth/dexed.py:385-452)."""
    card = dx.param_cardinalities()
    assert card[4] == 32 and card[5] == 8 and card[12] == 6
    assert card[32] == 2 and card[33] == 32 and card[35] == 15
    assert card[39] == 4 and card[41] == 8 and card[44] == 2
    assert card[31] == -1 and card[0] == -1  # continuous
    num = dx.numerical_param_indexes()
    cat = dx.categorical_param_indexes()
    assert len(set(num) & set(cat)) == 0
    assert sorted(num + cat) == list(range(155))  # exhaustive partition
    assert len(cat) == 4 + 6 * 4
    # midi-key related: 7 param types x 6 ops (synth/dexed.py:360-374)
    assert len(dx.midi_key_related_param_indexes()) == 42
    assert dx.mod_wheel_related_param_indexes()[-1] == 14


def test_default_spec_learnable_sizes(helper_default):
    """With all algos/ops + constant filter/tune, 155 - 5 - 6 = 144 learnable
    params (reference: synth/dexed.py:133 'about 144 learnable')."""
    spec = helper_default.spec
    learnable_count = sum(m is not None for m in spec.learnable_model)
    assert learnable_count == 144
    # 'all<=32' representation => large one-hot expansion; exact value checked
    # as a regression anchor (610 with the reference's default config).
    assert helper_default.learnable_preset_size == 610


def test_identity_spec():
    h = PresetIndexesHelper(PresetSpec.identity(10))
    assert h.learnable_preset_size == 10
    assert list(h.num_learn_idx) == list(range(10))
    assert h.n_cat_groups == 0


def test_full_to_learnable_layout_is_sequential(helper_default):
    """full_to_learnable must allocate learnable slots in ascending VST order
    (reference: data/preset.py:64-83)."""
    cur = 0
    for vst_idx, li in enumerate(helper_default.full_to_learnable):
        if li is None:
            continue
        if isinstance(li, int):
            assert li == cur
            cur += 1
        else:
            assert li == list(range(cur, cur + len(li)))
            cur += len(li)
    assert cur == helper_default.learnable_preset_size


def test_one_hot_round_trip(helper_default, rng):
    """full -> learnable -> full must be the identity on quantized params
    (reference semantics: data/preset.py:341-391)."""
    h = helper_default
    B = 16
    full = rng.random((B, 155)).astype(np.float32)
    # Quantize discrete params to valid grid values so round-trip is exact
    card = h.spec.cardinalities
    for i in range(155):
        if card[i] >= 2:
            full[:, i] = np.rint(full[:, i] * (card[i] - 1)) / (card[i] - 1)
    learnable = h.full_to_learnable_batch(full)
    assert learnable.shape == (B, h.learnable_preset_size)
    # one-hot groups sum to exactly 1
    for g in range(h.n_cat_groups):
        idxs = h.cat_group_idx_matrix[g][h.cat_group_mask[g]]
        np.testing.assert_allclose(learnable[:, idxs].sum(axis=1), 1.0)
    back = h.learnable_to_full_batch(learnable)
    # learnable params recovered exactly
    for vst_idx, li in enumerate(h.full_to_learnable):
        if li is None:
            continue
        np.testing.assert_allclose(back[:, vst_idx], full[:, vst_idx], atol=1e-6)
    # constrained defaults applied on non-learnable slots
    for vst_idx, v in h.spec.default_values.items():
        if h.spec.learnable_model[vst_idx] is None:
            np.testing.assert_allclose(back[:, vst_idx], v)


def test_num_only_spec_has_no_cat_groups(helper_num_only):
    assert helper_num_only.n_cat_groups == 0
    assert helper_num_only.learnable_preset_size == 144


def test_useless_masks_zero_volume_operator(helper_default, rng):
    h = helper_default
    B = 4
    full = rng.random((B, 155)).astype(np.float32) * 0.5 + 0.25
    # Row 0: operator 3 volume ~ 0 -> its params useless
    full[0, dx.op_param_index(3, dx.OFF_OUTPUT_LEVEL)] = 0.0
    # Other rows: all volumes > threshold
    v_in = h.full_to_learnable_batch(full)
    num_mask, cat_mask = h.useless_masks_batch(v_in)
    assert num_mask.shape == (B, h.learnable_preset_size)
    # rows 1..3: nothing masked
    assert not num_mask[1:].any() and not cat_mask[1:].any()
    # row 0: op-3 EG rate 1 (vst 23+44=67) must be masked
    eg1_learn = h.full_to_learnable[dx.op_param_index(3, 0)]
    assert num_mask[0, eg1_learn]
    # row 0: op-3 mode (categorical group) masked, op-2 mode not masked
    g3 = np.where(h.cat_group_vst_idx == dx.op_param_index(3, dx.OFF_MODE))[0][0]
    g2 = np.where(h.cat_group_vst_idx == dx.op_param_index(2, dx.OFF_MODE))[0][0]
    assert cat_mask[0, g3] and not cat_mask[0, g2]
    # volume itself and switches are never masked (reference: preset.py:264 comment)
    vol_learn = h.full_to_learnable[dx.op_param_index(3, dx.OFF_OUTPUT_LEVEL)]
    assert not num_mask[0, vol_learn]


def test_useless_masks_match_rowwise_api(helper_default, rng):
    """Batch mask API must agree with the reference-compatible per-row API."""
    h = helper_default
    full = rng.random((8, 155)).astype(np.float32)
    # randomly zero some operator volumes
    for b in range(8):
        for op in range(1, 7):
            if rng.random() < 0.3:
                full[b, dx.op_param_index(op, dx.OFF_OUTPUT_LEVEL)] = 0.0
    v_in = h.full_to_learnable_batch(full)
    num_mask, cat_mask = h.useless_masks_batch(v_in)
    for b in range(8):
        num_idx, cat_idx = h.get_useless_learned_params_indexes(v_in[b])
        expected_num = sorted(
            int(i) for i in np.nonzero(num_mask[b])[0] if h.learn_idx_is_num[i]
        )
        assert num_idx == expected_num
        expected_cat = sorted(int(h.cat_group_start[g]) for g in np.nonzero(cat_mask[b])[0])
        assert sorted(cat_idx) == expected_cat


def test_quantized_steps(helper_default):
    h = helper_default
    # First learnable numerical continuous param -> None
    cont_idx = None
    for li, vst in zip(h.num_learn_idx, h.num_vst_idx):
        if h.spec.cardinalities[vst] < 2:
            cont_idx = int(li)
            break
    assert h.get_learnable_param_quantized_steps(cont_idx) is None
    # A categorical slot -> [0, 1]
    cat_slot = int(h.cat_group_idx_matrix[0, 0])
    np.testing.assert_allclose(
        h.get_learnable_param_quantized_steps(cat_slot), [0.0, 1.0]
    )
