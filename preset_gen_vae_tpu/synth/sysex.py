"""DX7 SysEx cartridge import/export (32-voice bulk dump, format 9).

The reference's 30k-preset corpus (`dexed_presets.sqlite`, reference
synth/dexed.py:65-102) was built from human-made DX7 cartridges, but the
data asset itself ships via git-lfs and is unobtainable here. This module
closes the gap as far as possible without the asset: it reads REAL DX7
`.syx` cartridge banks — the public Yamaha 32-voice packed bulk-dump
format every vintage bank on the internet uses — into this framework's
normalized (N, 155) preset matrix, and writes generated corpora back out
as cartridges loadable by actual DX7 hardware or the Dexed VST.

Format (public Yamaha spec; byte layout also implemented by Dexed's
sysex.cc): header F0 43 0n 09 20 00, then 4096 data bytes = 32 voices x
128 packed bytes (operators stored OP6 first), a 2's-complement checksum
of the data bytes, F7. Per-voice packed layout:

  op*17 + 0..3   EG rates R1-R4 (0-99)        op*17 + 4..7  EG levels
  +8 breakpoint  +9 left depth  +10 right depth
  +11 bits0-1 left curve, bits2-3 right curve
  +12 bits0-2 rate scaling, bits3-6 detune (0-14)
  +13 bits0-1 AM sens, bits2-4 key velocity
  +14 output level   +15 bit0 osc mode, bits1-5 freq coarse
  +16 freq fine
  102-109 pitch EG rates+levels   110 algorithm (0-31)
  111 bits0-2 feedback, bit3 osc key sync
  112-115 LFO speed/delay/PM depth/AM depth
  116 bit0 LFO key sync, bits1-3 LFO wave, bits4-6 pitch mod sens
  117 transpose (0-48, 24 = center)   118-127 voice name (ASCII)

Params the cartridge does not carry (filter cutoff/resonance, output,
master tune, per-op on/off switches) take the reference's defaults
(synth/dexed.py:309-312; switches all on).
"""

from __future__ import annotations

import pathlib
from typing import List, Sequence, Tuple

import numpy as np

from . import dexed_params as dx

VOICES_PER_BANK = 32
PACKED_VOICE_BYTES = 128
BANK_DATA_BYTES = VOICES_PER_BANK * PACKED_VOICE_BYTES  # 4096
_HEADER_LEN = 6  # F0 43 0n 09 20 00


def _checksum(data: np.ndarray) -> int:
    """2's-complement checksum over the 4096 data bytes (masked to 7 bits)."""
    return int((128 - (int(data.sum()) & 0x7F)) & 0x7F)


def _find_banks(raw: bytes) -> List[np.ndarray]:
    """All 32-voice bulk dumps in a .syx blob (files often concatenate
    several dumps); returns each bank's 4096 data bytes."""
    buf = np.frombuffer(raw, dtype=np.uint8)
    banks = []
    i = 0
    while i < len(buf):
        if buf[i] != 0xF0:
            i += 1
            continue
        # Yamaha 32-voice bulk dump: F0 43 0n 09 20 00 <4096> <sum> F7
        end = i + _HEADER_LEN + BANK_DATA_BYTES + 2
        if (
            end <= len(buf)
            and buf[i + 1] == 0x43
            and (buf[i + 2] & 0xF0) == 0x00
            and buf[i + 3] == 0x09
            and buf[i + 4] == 0x20
            and buf[i + 5] == 0x00
            and buf[end - 1] == 0xF7
        ):
            data = buf[i + _HEADER_LEN : i + _HEADER_LEN + BANK_DATA_BYTES]
            if int(buf[end - 2]) != _checksum(data):
                raise ValueError(
                    f"DX7 bank at byte {i}: checksum mismatch "
                    f"(stored {int(buf[end - 2])}, computed {_checksum(data)})"
                )
            banks.append(data.copy())
            i = end
        else:
            i += 1
    return banks


def _unpack_voice(v: np.ndarray) -> Tuple[np.ndarray, str]:
    """128 packed bytes -> ((155,) normalized preset, voice name)."""
    p = np.zeros((dx.N_PARAMS,), dtype=np.float32)
    dx.set_default_general_filter_and_tune_params(p)
    v = v.astype(np.int64)

    for slot in range(6):  # dump order: OP6 first
        op = 6 - slot
        b = slot * 17
        base = dx.op_param_index(op, 0)
        for j in range(4):
            p[base + dx.OFF_EG_RATES[j]] = min(v[b + j], 99) / 99.0
            p[base + dx.OFF_EG_LEVELS[j]] = min(v[b + 4 + j], 99) / 99.0
        p[base + dx.OFF_BREAKPOINT] = min(v[b + 8], 99) / 99.0
        p[base + dx.OFF_L_DEPTH] = min(v[b + 9], 99) / 99.0
        p[base + dx.OFF_R_DEPTH] = min(v[b + 10], 99) / 99.0
        p[base + dx.OFF_L_CURVE] = (v[b + 11] & 0x03) / 3.0
        p[base + dx.OFF_R_CURVE] = ((v[b + 11] >> 2) & 0x03) / 3.0
        p[base + dx.OFF_RATE_SCALING] = (v[b + 12] & 0x07) / 7.0
        p[base + dx.OFF_DETUNE] = min((v[b + 12] >> 3) & 0x0F, 14) / 14.0
        p[base + dx.OFF_AMP_MOD_SENS] = (v[b + 13] & 0x03) / 3.0
        p[base + dx.OFF_KEY_VELOCITY] = ((v[b + 13] >> 2) & 0x07) / 7.0
        p[base + dx.OFF_OUTPUT_LEVEL] = min(v[b + 14], 99) / 99.0
        p[base + dx.OFF_MODE] = float(v[b + 15] & 0x01)
        p[base + dx.OFF_FREQ_COARSE] = ((v[b + 15] >> 1) & 0x1F) / 31.0
        p[base + dx.OFF_FREQ_FINE] = min(v[b + 16], 99) / 99.0
        p[base + dx.OFF_SWITCH] = 1.0  # not in the dump: all ops on

    for j in range(8):  # pitch EG rates 1-4 then levels 1-4
        p[dx.IDX_PITCH_EG_FIRST + j] = min(v[102 + j], 99) / 99.0
    p[dx.IDX_ALGORITHM] = min(v[110], 31) / 31.0
    p[dx.IDX_FEEDBACK] = (v[111] & 0x07) / 7.0
    p[dx.IDX_OSC_KEY_SYNC] = float((v[111] >> 3) & 0x01)
    p[dx.IDX_LFO_SPEED] = min(v[112], 99) / 99.0
    p[dx.IDX_LFO_DELAY] = min(v[113], 99) / 99.0
    p[dx.IDX_LFO_PM_DEPTH] = min(v[114], 99) / 99.0
    p[dx.IDX_LFO_AM_DEPTH] = min(v[115], 99) / 99.0
    p[dx.IDX_LFO_KEY_SYNC] = float(v[116] & 0x01)
    p[dx.IDX_LFO_WAVE] = min((v[116] >> 1) & 0x07, 5) / 5.0
    p[dx.IDX_PITCH_MOD_SENS] = min((v[116] >> 4) & 0x07, 7) / 7.0
    p[dx.IDX_TRANSPOSE] = min(v[117], 48) / 48.0

    name = bytes(int(c) & 0x7F for c in v[118:128]).decode(
        "ascii", errors="replace"
    ).strip()
    return p, name


def _pack_voice(p: np.ndarray, name: str) -> np.ndarray:
    """(155,) normalized preset -> 128 packed bytes (inverse of
    ``_unpack_voice``; lossy only for params the cartridge lacks)."""
    v = np.zeros((PACKED_VOICE_BYTES,), dtype=np.uint8)

    def q(x, steps):  # [0,1] -> 0..steps
        return int(np.clip(np.rint(float(x) * steps), 0, steps))

    for slot in range(6):
        op = 6 - slot
        b = slot * 17
        base = dx.op_param_index(op, 0)
        for j in range(4):
            v[b + j] = q(p[base + dx.OFF_EG_RATES[j]], 99)
            v[b + 4 + j] = q(p[base + dx.OFF_EG_LEVELS[j]], 99)
        v[b + 8] = q(p[base + dx.OFF_BREAKPOINT], 99)
        v[b + 9] = q(p[base + dx.OFF_L_DEPTH], 99)
        v[b + 10] = q(p[base + dx.OFF_R_DEPTH], 99)
        v[b + 11] = q(p[base + dx.OFF_L_CURVE], 3) | (
            q(p[base + dx.OFF_R_CURVE], 3) << 2
        )
        v[b + 12] = q(p[base + dx.OFF_RATE_SCALING], 7) | (
            q(p[base + dx.OFF_DETUNE], 14) << 3
        )
        v[b + 13] = q(p[base + dx.OFF_AMP_MOD_SENS], 3) | (
            q(p[base + dx.OFF_KEY_VELOCITY], 7) << 2
        )
        v[b + 14] = q(p[base + dx.OFF_OUTPUT_LEVEL], 99)
        v[b + 15] = q(p[base + dx.OFF_MODE], 1) | (
            q(p[base + dx.OFF_FREQ_COARSE], 31) << 1
        )
        v[b + 16] = q(p[base + dx.OFF_FREQ_FINE], 99)

    for j in range(8):
        v[102 + j] = q(p[dx.IDX_PITCH_EG_FIRST + j], 99)
    v[110] = q(p[dx.IDX_ALGORITHM], 31)
    v[111] = q(p[dx.IDX_FEEDBACK], 7) | (q(p[dx.IDX_OSC_KEY_SYNC], 1) << 3)
    v[112] = q(p[dx.IDX_LFO_SPEED], 99)
    v[113] = q(p[dx.IDX_LFO_DELAY], 99)
    v[114] = q(p[dx.IDX_LFO_PM_DEPTH], 99)
    v[115] = q(p[dx.IDX_LFO_AM_DEPTH], 99)
    v[116] = q(p[dx.IDX_LFO_KEY_SYNC], 1) | (q(p[dx.IDX_LFO_WAVE], 5) << 1) | (
        q(p[dx.IDX_PITCH_MOD_SENS], 7) << 4
    )
    v[117] = q(p[dx.IDX_TRANSPOSE], 48)
    nm = name.encode("ascii", errors="replace")[:10].ljust(10, b" ")
    v[118:128] = np.frombuffer(nm, dtype=np.uint8)
    return v


def parse_syx(raw: bytes) -> Tuple[np.ndarray, List[str]]:
    """.syx blob -> ((N, 155) normalized presets, voice names). N is a
    multiple of 32 (one bank per bulk dump found in the blob)."""
    banks = _find_banks(raw)
    if not banks:
        raise ValueError(
            "no DX7 32-voice bulk dump (F0 43 0n 09 20 00 ...) found"
        )
    presets, names = [], []
    for data in banks:
        for k in range(VOICES_PER_BANK):
            p, name = _unpack_voice(
                data[k * PACKED_VOICE_BYTES : (k + 1) * PACKED_VOICE_BYTES]
            )
            presets.append(p)
            names.append(name)
    return np.stack(presets), names


def write_syx(presets: np.ndarray, names: Sequence[str] | None = None) -> bytes:
    """(N, 155) normalized presets -> .syx bytes (one 32-voice bulk dump per
    32 presets; the final bank is padded by repeating the last preset)."""
    presets = np.asarray(presets, dtype=np.float32)
    n = presets.shape[0]
    assert n > 0 and presets.shape[1] == dx.N_PARAMS
    names = list(names) if names is not None else [f"VOICE {i:04d}" for i in range(n)]
    out = bytearray()
    for s in range(0, n, VOICES_PER_BANK):
        chunk = list(range(s, min(s + VOICES_PER_BANK, n)))
        while len(chunk) < VOICES_PER_BANK:
            chunk.append(chunk[-1])
        data = np.concatenate(
            [_pack_voice(presets[i], names[i]) for i in chunk]
        )
        out += bytes([0xF0, 0x43, 0x00, 0x09, 0x20, 0x00])
        out += data.tobytes()
        out += bytes([_checksum(data), 0xF7])
    return bytes(out)


def import_syx_banks(paths, out_sqlite=None):
    """Reads DX7 cartridge files into a corpus; optionally writes the
    reference-layout sqlite so the standard ``db_path`` dataset flow
    (data/dexed_dataset.py) serves REAL human presets.

    Labels use the same carrier-envelope heuristic as the synthetic
    generators (vocab parity with the reference's scraped labels,
    synth/dexed.py:205-206).

    :returns: (presets (N, 155), names, labels)
    """
    presets, names = [], []
    for path in ([paths] if isinstance(paths, (str, pathlib.Path)) else paths):
        p, nm = parse_syx(pathlib.Path(path).read_bytes())
        presets.append(p)
        names.extend(nm)
    presets = np.concatenate(presets)

    # carrier-envelope label heuristic (as generate_structured_corpus)
    alg = np.rint(presets[:, dx.IDX_ALGORITHM] * 31.0).astype(int)
    masks = np.asarray([dx.ALGORITHM_CARRIER_MASKS[a] for a in alg])
    carrier = ((masks[:, None] >> np.arange(6)[None, :]) & 1).astype(bool)
    sus = np.stack(
        [presets[:, dx.op_param_index(op, dx.OFF_EG_LEVELS[2])]
         for op in range(1, 7)], axis=1,
    )
    car_sus = np.where(carrier, sus, np.nan)
    percussive = np.nanmean(car_sus, axis=1) < 0.3
    fixed_any = np.zeros(len(presets), dtype=bool)
    for op in range(1, 7):
        fixed_any |= presets[:, dx.op_param_index(op, dx.OFF_MODE)] > 0.5
    labels = np.where(
        fixed_any, "sfx", np.where(percussive, "percussive", "harmonic")
    ).tolist()

    if out_sqlite is not None:
        from .database import create_database

        create_database(out_sqlite, presets, names, labels)
    return presets, names, labels


if __name__ == "__main__":  # python -m preset_gen_vae_tpu.synth.sysex
    import argparse

    ap = argparse.ArgumentParser(
        description="Import DX7 .syx cartridges into a training database"
    )
    ap.add_argument("syx", nargs="+", help=".syx cartridge files")
    ap.add_argument("-o", "--out", required=True,
                    help="output sqlite path (reference schema)")
    args = ap.parse_args()
    pr, nm, lb = import_syx_banks(args.syx, out_sqlite=args.out)
    import collections

    print(f"imported {len(pr)} voices from {len(args.syx)} file(s) "
          f"-> {args.out}; labels: {dict(collections.Counter(lb))}")
