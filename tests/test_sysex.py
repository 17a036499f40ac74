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


def test_syx_checksum_rejected_strict():
    p, names = _grid_exact_corpus(32)
    blob = bytearray(sysex.write_syx(p, names))
    blob[100] ^= 0x05  # corrupt one data byte
    with pytest.raises(ValueError, match="checksum"):
        sysex.parse_syx(bytes(blob), strict=True)


def test_syx_checksum_tolerated_lenient():
    """Wild cartridges routinely carry stale checksums (edited dumps):
    lenient mode (default) keeps the bank and reports the problem."""
    p, names = _grid_exact_corpus(32)
    blob = bytearray(sysex.write_syx(p, names))
    blob[100] ^= 0x05
    problems = []
    p2, names2 = sysex.parse_syx(bytes(blob), problems=problems)
    assert p2.shape == (32, dx.N_PARAMS)
    assert any("checksum mismatch" in s for s in problems)


def test_syx_no_bank_found():
    with pytest.raises(ValueError, match="no DX7"):
        sysex.parse_syx(b"\xf0\x43\x00\x01\x02\xf7")


def test_syx_headerless_bank_recovered():
    """A raw 4096-byte bank image (rip that lost its SysEx framing) must
    import; same for the data+checksum (4097) variant."""
    p, names = _grid_exact_corpus(32, seed=5)
    blob = sysex.write_syx(p, names)
    data = blob[6 : 6 + sysex.BANK_DATA_BYTES]
    for raw in (data, data + blob[-2:-1]):  # bare, and +checksum
        problems = []
        p2, names2 = sysex.parse_syx(raw, problems=problems)
        assert p2.shape == (32, dx.N_PARAMS)
        assert any("headerless" in s for s in problems)
        assert names2[0] == names[0][:10].strip()


def test_syx_single_voice_vced():
    """Single-voice 155-byte VCED dumps (edit-buffer transmit) import as
    one voice; carried params agree with the packed-bank encoding of the
    same preset."""
    p, names = _grid_exact_corpus(32, seed=7)
    # build a VCED blob for preset 0 from its known normalized values
    v = np.zeros(155, dtype=np.uint8)
    for slot in range(6):
        op = 6 - slot
        b = slot * 21
        base = dx.op_param_index(op, 0)
        for j in range(4):
            v[b + j] = round(float(p[0, base + dx.OFF_EG_RATES[j]]) * 99)
            v[b + 4 + j] = round(float(p[0, base + dx.OFF_EG_LEVELS[j]]) * 99)
        v[b + 8] = round(float(p[0, base + dx.OFF_BREAKPOINT]) * 99)
        v[b + 9] = round(float(p[0, base + dx.OFF_L_DEPTH]) * 99)
        v[b + 10] = round(float(p[0, base + dx.OFF_R_DEPTH]) * 99)
        v[b + 11] = round(float(p[0, base + dx.OFF_L_CURVE]) * 3)
        v[b + 12] = round(float(p[0, base + dx.OFF_R_CURVE]) * 3)
        v[b + 13] = round(float(p[0, base + dx.OFF_RATE_SCALING]) * 7)
        v[b + 14] = round(float(p[0, base + dx.OFF_AMP_MOD_SENS]) * 3)
        v[b + 15] = round(float(p[0, base + dx.OFF_KEY_VELOCITY]) * 7)
        v[b + 16] = round(float(p[0, base + dx.OFF_OUTPUT_LEVEL]) * 99)
        v[b + 17] = round(float(p[0, base + dx.OFF_MODE]))
        v[b + 18] = round(float(p[0, base + dx.OFF_FREQ_COARSE]) * 31)
        v[b + 19] = round(float(p[0, base + dx.OFF_FREQ_FINE]) * 99)
        v[b + 20] = round(float(p[0, base + dx.OFF_DETUNE]) * 14)
    for j in range(8):
        v[126 + j] = round(float(p[0, dx.IDX_PITCH_EG_FIRST + j]) * 99)
    v[134] = round(float(p[0, dx.IDX_ALGORITHM]) * 31)
    v[135] = round(float(p[0, dx.IDX_FEEDBACK]) * 7)
    v[136] = round(float(p[0, dx.IDX_OSC_KEY_SYNC]))
    v[137] = round(float(p[0, dx.IDX_LFO_SPEED]) * 99)
    v[138] = round(float(p[0, dx.IDX_LFO_DELAY]) * 99)
    v[139] = round(float(p[0, dx.IDX_LFO_PM_DEPTH]) * 99)
    v[140] = round(float(p[0, dx.IDX_LFO_AM_DEPTH]) * 99)
    v[141] = round(float(p[0, dx.IDX_LFO_KEY_SYNC]))
    v[142] = round(float(p[0, dx.IDX_LFO_WAVE]) * 5)
    v[143] = round(float(p[0, dx.IDX_PITCH_MOD_SENS]) * 7)
    v[144] = round(float(p[0, dx.IDX_TRANSPOSE]) * 48)
    v[145:155] = np.frombuffer(b"VCEDVOICE ", dtype=np.uint8)
    csum = (128 - (int(v.sum()) & 0x7F)) & 0x7F
    blob = bytes([0xF0, 0x43, 0x00, 0x00, 0x01, 0x1B]) + v.tobytes() + bytes(
        [csum, 0xF7]
    )
    p2, names2 = sysex.parse_syx(blob)
    assert p2.shape == (1, dx.N_PARAMS)
    assert names2[0] == "VCEDVOICE"
    # must match the packed-bank decoding of the same preset
    p3, _ = sysex.parse_syx(sysex.write_syx(p[:1], [names[0]]))
    np.testing.assert_allclose(p2[0], p3[0], atol=6e-3)


def test_syx_fuzz_never_crashes():
    """Random garbage (including embedded F0 43 runs) must either parse
    or raise ValueError — never crash or loop."""
    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(0, 9000))
        raw = rng.integers(0, 256, size=n, dtype=np.uint8)
        # salt with plausible header fragments to stress the scanners
        for frag in (b"\xf0\x43\x00\x09\x20\x00", b"\xf0\x43\x00\x00\x01\x1b"):
            if n > 700:
                off = int(rng.integers(0, n - 7))
                raw[off : off + 6] = np.frombuffer(frag, dtype=np.uint8)
        try:
            pr, _ = sysex.parse_syx(raw.tobytes())
            assert pr.shape[1] == dx.N_PARAMS
            assert np.isfinite(pr).all() and pr.min() >= 0.0 and pr.max() <= 1.0
        except ValueError:
            pass


def test_import_syx_banks_skips_corrupt_file(tmp_path, capsys):
    """A corrupt cartridge among good ones is skipped with a report, not
    fatal (scripts/train_from_syx.py relies on this)."""
    p, names = _grid_exact_corpus(32, seed=11)
    good = tmp_path / "good.syx"
    good.write_bytes(sysex.write_syx(p, names))
    bad = tmp_path / "bad.syx"
    bad.write_bytes(b"\x00\x01\x02 not a cartridge at all")
    presets, nm, labels = sysex.import_syx_banks([good, bad])
    assert presets.shape == (32, dx.N_PARAMS)
    out = capsys.readouterr().out
    assert "skipped 1 unparseable file" in out and "bad.syx" in out
    # all-corrupt input still raises
    with pytest.raises(ValueError, match="no DX7 voices"):
        sysex.import_syx_banks([bad])


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
