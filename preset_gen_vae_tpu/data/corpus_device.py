"""Column-chunked 2-D row layout for the device-resident corpus.

Why this layout (measured, ``saved/r5_gather_probe.log``): inside the
K-step ``lax.scan`` the 4-D corpus gather ``cx[idx]`` makes XLA's layout
assignment materialize a full-corpus relayout copy plus a corpus-shaped
gather temp — at P=8,192 x 3-note the gather added 5.5 GB of temps over
a pre-gathered control, and 16,384 x 3-note failed to COMPILE on the
15.75 GB chip (round-4 OOM at 24.56G; scripts/run_stack3_v2_r4.py).
Storing the corpus as 2-D ``(rows, cols)`` arrays whose minor dim is
128-lane aligned and whose element count stays below 2**31 turns the
same gather into contiguous row dynamic-slices with no corpus-scale
temps: probe variant F compiles 16,384 x 3-note at 11.55G total and its
gather temps sit at the control level (2.35G vs control 2.42G at 8k;
scripts/probe_gather_hbm_r4.py).

Layout: rows = presets. Columns = ``n_notes`` consecutive per-note
spans, each padded to ``HW_PAD = ceil(H*W/128)*128`` lanes. A note span
is split into the minimum number of 128-aligned column chunks keeping
``rows * width < 2**31`` (XLA's int32 addressing limit re-triggers the
relayout copy above it — probe variant E vs F at 16k+); each chunk is a
separate device array. Pad columns hold zeros (or affine(0) after
normalization) and are sliced off at gather time, never observed.

The un-stacked multi-note dataset mode (reference
abstract_dataset.py item demux: items = presets x notes) is a VIEW over
the same chunks — item index -> (row = i // n_notes, note = i % n_notes)
resolved inside the gather — so no ``(P*n, 1, H, W)`` reshape buffer
ever exists (round-4 advisor finding: that reshape transiently held ~2x
the corpus in HBM).

The reference framework has no analog of any of this: its corpus is a
directory of per-preset wav/spectrogram files loaded by DataLoader
workers (dexeddataset.py:278-328, data/build.py:43-79).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

LANE = 128  # TPU minor-dim tile (pallas_guide: lane dimension)
MAX_CHUNK_ELEMENTS = 1 << 31  # int32 addressing limit (probe variant F)


def plan_note_chunks(n_rows: int, hw: int) -> Tuple[int, list]:
    """Column plan for one note span: returns ``(hw_pad, [(off, width)])``
    with every offset/width LANE-aligned (the final width included —
    hw_pad is a LANE multiple) and ``n_rows * width < 2**31``."""
    hw_pad = -(-hw // LANE) * LANE
    n_split = max(1, -(-(n_rows * hw_pad) // MAX_CHUNK_ELEMENTS))
    width = -(-hw_pad // (n_split * LANE)) * LANE
    spans = []
    off = 0
    while off < hw_pad:
        spans.append((off, min(width, hw_pad - off)))
        off += width
    return hw_pad, spans


@dataclasses.dataclass(frozen=True)
class ChunkedDeviceCorpus:
    """The x-corpus as a tuple of 2-D ``(rows, width)`` device arrays.

    ``chunks`` are the arrays, ordered note-major then column-offset
    (i.e. global column order); ``spans`` records each chunk's
    ``(note, col_off, width)``. ``unstacked`` selects the item->(row,
    note) view (see module docstring). All metadata is static Python —
    ``device_gather`` closes over it and traces only the arrays, so the
    chunks tuple can be passed straight into ``jax.jit`` as a pytree.
    """

    chunks: Tuple  # tuple of jax arrays, each (n_rows, width)
    n_rows: int
    n_notes: int
    h: int
    w: int
    hw_pad: int
    spans: Tuple[Tuple[int, int, int], ...]  # (note, off, width)
    unstacked: bool = False

    # -- shape/metadata -------------------------------------------------
    @property
    def hw(self) -> int:
        return self.h * self.w

    @property
    def n_items(self) -> int:
        return self.n_rows * self.n_notes if self.unstacked else self.n_rows

    @property
    def item_channels(self) -> int:
        return 1 if self.unstacked else self.n_notes

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        return (self.n_items, self.item_channels, self.h, self.w)

    @property
    def dtype(self):
        return self.chunks[0].dtype

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(c.shape)) * c.dtype.itemsize
                   for c in self.chunks)

    def __len__(self) -> int:
        return self.n_items

    # -- views / placement ----------------------------------------------
    def as_unstacked(self) -> "ChunkedDeviceCorpus":
        """Un-stacked multi-note item view sharing the SAME device chunks
        (items = rows x notes, note-major per preset — the reference's
        item demux order, abstract_dataset._demux)."""
        return dataclasses.replace(self, unstacked=True)

    def with_chunks(self, chunks: Sequence) -> "ChunkedDeviceCorpus":
        return dataclasses.replace(self, chunks=tuple(chunks))

    def placed(self, put: Callable, dtype=None) -> "ChunkedDeviceCorpus":
        """Re-place (and optionally cast) every chunk through ``put`` —
        e.g. ``lambda a: jax.device_put(a, sharding)``. Casting runs
        per chunk so no corpus-sized cast buffer ever materializes."""
        out = []
        for c in self.chunks:
            if dtype is not None and c.dtype != np.dtype(dtype):
                c = c.astype(dtype)
            out.append(put(c))
        return self.with_chunks(out)

    # -- gather (traceable) ----------------------------------------------
    def device_gather(self, chunks, idx):
        """Batch gather inside jit: ``chunks`` are the traced arrays (the
        same pytree as ``self.chunks``), ``idx`` a traced ``(B,)`` int
        vector of ITEM indices. Returns ``(B, C, H, W)`` in the corpus
        dtype. Per-chunk row indexing keeps every slice contiguous and
        below the int32 addressing limit (module docstring)."""
        import jax.numpy as jnp

        idx = jnp.asarray(idx)
        rows = idx // self.n_notes if self.unstacked else idx
        parts = [c[rows] for c in chunks]
        x2 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        b = x2.shape[0]
        x3 = x2.reshape(b, self.n_notes, self.hw_pad)[:, :, : self.hw]
        if self.unstacked:
            note = (idx % self.n_notes)[:, None, None]
            x3 = jnp.take_along_axis(x3, note, axis=1)
            return x3.reshape(b, 1, self.h, self.w)
        return x3.reshape(b, self.n_notes, self.h, self.w)

    # -- host access (eval / figures / tests) ----------------------------
    def __getitem__(self, sel) -> np.ndarray:
        """Numpy fancy indexing compatibility for host consumers (the
        SplitLoader's ``epoch_batches``, evaluation targets, the first
        validation-batch figure): gathers on device, fetches, and
        upcasts to float32 so eval arithmetic is dtype-consistent across
        cache policies (the values still carry the corpus dtype's
        quantization — bf16 under the default training config; see
        load_spectrogram_corpus_device's numerical contract)."""
        import jax
        import jax.numpy as jnp

        sel = np.atleast_1d(np.asarray(sel, dtype=np.int64))
        out = jax.device_get(
            jax.jit(self.device_gather)(self.chunks, jnp.asarray(sel))
        )
        return np.asarray(out, dtype=np.float32)

    def as_numpy_4d(self) -> np.ndarray:
        """Whole corpus as ``(n_rows, n_notes, H, W)`` float32 on host
        (tests/debug only — this is the downlink fetch the device policy
        exists to avoid)."""
        import jax

        rows = []
        for c in self.chunks:
            rows.append(np.asarray(jax.device_get(c), dtype=np.float32))
        full = np.concatenate(rows, axis=-1)  # (n_rows, n_notes*hw_pad)
        full = full.reshape(self.n_rows, self.n_notes, self.hw_pad)
        return full[:, :, : self.hw].reshape(
            self.n_rows, self.n_notes, self.h, self.w
        )


def all_spans(n_rows: int, n_notes: int, hw: int):
    """Global chunk plan: per-note spans replicated across notes in
    note-major global column order."""
    hw_pad, spans = plan_note_chunks(n_rows, hw)
    return hw_pad, tuple(
        (note, off, width) for note in range(n_notes) for off, width in spans
    )


def from_host_array(
    x: np.ndarray,
    dtype=None,
    put: Optional[Callable] = None,
) -> ChunkedDeviceCorpus:
    """Build the chunked layout from a host ``(N, C, H, W)`` corpus,
    uploading ONE chunk at a time: host transient = one chunk buffer, HBM
    peak = 1x corpus (uploading 4-D then re-laying out on device would
    transiently hold 2x — OOM territory at the 16k x 3-note corpus).

    f32 -> bf16 casts route through utils.fast_cast (ml_dtypes' astype is
    ~1000x slower on corpus-scale arrays).
    """
    import jax
    import ml_dtypes

    from ..utils.fast_cast import f32_to_bf16

    x = np.asarray(x)
    n, c, h, w = x.shape
    hw = h * w
    hw_pad, spans = all_spans(n, c, hw)
    dtype = np.dtype(dtype if dtype is not None else x.dtype)
    put = put or jax.device_put
    want_fast_bf16 = (dtype == np.dtype(ml_dtypes.bfloat16)
                      and x.dtype == np.float32)
    chunks = []
    for note, off, width in spans:
        flat = x[:, note].reshape(n, hw)
        end = min(off + width, hw)
        buf = np.zeros((n, width), dtype)
        if off < hw:
            src = flat[:, off:end]
            buf[:, : end - off] = f32_to_bf16(src) if want_fast_bf16 else src
        chunks.append(put(buf))
        del buf
    return ChunkedDeviceCorpus(
        tuple(chunks), n, c, h, w, hw_pad,
        spans,
    )


def from_device_array(x, dtype=None, put: Optional[Callable] = None
                      ) -> ChunkedDeviceCorpus:
    """Chunk an already-device-resident 4-D corpus. Transiently holds up
    to ~2x the corpus in HBM (the source stays alive while chunks are
    cut), so this is for small/test corpora and legacy callers — the
    production render pass builds the chunked layout directly
    (abstract_dataset.load_spectrogram_corpus_device)."""
    import jax
    import jax.numpy as jnp

    n, c, h, w = x.shape
    hw = h * w
    hw_pad, spans = all_spans(n, c, hw)
    put = put or (lambda a: a)
    chunks = []
    for note, off, width in spans:
        flat = x[:, note].reshape(n, hw)
        end = min(off + width, hw)
        piece = flat[:, off:end]
        if width > end - off:
            piece = jnp.pad(piece, ((0, 0), (0, width - (end - off))))
        if dtype is not None:
            piece = piece.astype(dtype)
        chunks.append(put(piece))
    return ChunkedDeviceCorpus(tuple(chunks), n, c, h, w, hw_pad, spans)
