"""Fast host-side float32 -> bfloat16 conversion.

``ndarray.astype(ml_dtypes.bfloat16)`` goes through a scalar path at well
under 10 MB/s — casting a 10.9 GB corpus took ~20 minutes of the training
setup. bf16 is just the top 16 bits of f32, so the conversion is a
vectorized uint32 round-to-nearest-even and a 16-bit shift: ~GB/s.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np


def f32_to_bf16(x: np.ndarray) -> np.ndarray:
    """float32 array -> bfloat16 (ml_dtypes) array, round-to-nearest-even —
    bit-identical to the IEEE conversion jax/XLA performs."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    u = x.view(np.uint32)
    # RNE: add 0x7FFF plus the LSB of the kept mantissa, then truncate
    bias = np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1))
    u16 = ((u + bias) >> np.uint32(16)).astype(np.uint16)
    return u16.view(ml_dtypes.bfloat16)
