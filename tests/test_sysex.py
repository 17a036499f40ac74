"""DX7 SysEx cartridge import/export (synth/sysex.py): round-trip through
the public 32-voice packed bulk-dump format, checksum validation, and the
.syx -> sqlite -> DexedDataset flow (the reference's corpus was built from
such cartridges; reference synth/dexed.py:65-102)."""

import numpy as np
import pytest

from preset_gen_vae_tpu.synth import dexed_params as dx
from preset_gen_vae_tpu.synth import sysex
from preset_gen_vae_tpu.synth.database import generate_structured_corpus_v2


def _grid_exact_corpus(n, seed=0):
    """Presets whose cartridge-carried params all sit on the syx grid, so
    pack->unpack is exact: snap EVERY param to its DX7 step count."""
    p, names, _ = generate_structured_corpus_v2(n, seed=seed)
    steps = {dx.op_param_index(op, off): s
             for op in range(1, 7)
             for off, s in [(dx.OFF_BREAKPOINT, 99), (dx.OFF_L_DEPTH, 99),
                            (dx.OFF_R_DEPTH, 99), (dx.OFF_OUTPUT_LEVEL, 99),
                            (dx.OFF_FREQ_FINE, 99)]}
    for op in range(1, 7):
        for j in range(4):
            steps[dx.op_param_index(op, dx.OFF_EG_RATES[j])] = 99
            steps[dx.op_param_index(op, dx.OFF_EG_LEVELS[j])] = 99
    for j in range(8):
        steps[dx.IDX_PITCH_EG_FIRST + j] = 99
    for i in (dx.IDX_LFO_SPEED, dx.IDX_LFO_DELAY, dx.IDX_LFO_PM_DEPTH,
              dx.IDX_LFO_AM_DEPTH):
        steps[i] = 99
    steps[dx.IDX_TRANSPOSE] = 48
    for i, s in steps.items():
        p[:, i] = np.rint(p[:, i] * s) / s
    return p, names


def test_syx_roundtrip_exact():
    p, names = _grid_exact_corpus(40, seed=3)
    blob = sysex.write_syx(p, names)
    # 40 voices -> 2 banks of (6 header + 4096 + 2) bytes
    assert len(blob) == 2 * (6 + 4096 + 2)
    p2, names2 = sysex.parse_syx(blob)
    assert p2.shape == (64, dx.N_PARAMS)  # final bank pads to 32
    # cartridge-carried params round-trip exactly; the rest are defaults
    carried = np.ones(dx.N_PARAMS, dtype=bool)
    carried[[dx.IDX_CUTOFF, dx.IDX_RESO, dx.IDX_OUTPUT,
             dx.IDX_MASTER_TUNE]] = False
    carried[dx.operator_switch_indexes()] = False
    q = p.copy()
    dx.set_default_general_filter_and_tune_params(q)
    np.testing.assert_allclose(p2[:40][:, carried], q[:, carried], atol=6e-3)
    # voice names survive (10-char field, stripped)
    assert names2[0] == names[0][:10].strip()


def test_syx_checksum_rejected():
    p, names = _grid_exact_corpus(32)
    blob = bytearray(sysex.write_syx(p, names))
    blob[100] ^= 0x05  # corrupt one data byte
    with pytest.raises(ValueError, match="checksum"):
        sysex.parse_syx(bytes(blob))


def test_syx_no_bank_found():
    with pytest.raises(ValueError, match="no DX7"):
        sysex.parse_syx(b"\xf0\x43\x00\x01\x02\xf7")


def test_syx_import_to_dataset(tmp_path):
    """Full real-data path: cartridges -> sqlite -> DexedDataset."""
    p, names = _grid_exact_corpus(64, seed=9)
    syx_path = tmp_path / "bank.syx"
    syx_path.write_bytes(sysex.write_syx(p, names))
    db_path = tmp_path / "real.sqlite"
    presets, nm, labels = sysex.import_syx_banks([syx_path],
                                                 out_sqlite=db_path)
    assert presets.shape == (64, dx.N_PARAMS)
    assert set(labels) <= {"harmonic", "percussive", "sfx"}

    from preset_gen_vae_tpu.data.dexed_dataset import DexedDataset

    ds = DexedDataset(db_path=str(db_path), data_root=str(tmp_path / "dr"))
    uids = ds.valid_preset_UIDs
    assert len(uids) == 64
    v = ds.get_full_preset_params(int(uids[0]))
    assert v.shape == (dx.N_PARAMS,) and 0.0 <= v.min() and v.max() <= 1.0
