"""Column-chunked 2-D corpus layout (data/corpus_device.py).

The layout exists because the 4-D corpus gather inside the K-step
``lax.scan`` cost corpus-scale XLA temps (round-4 compile OOM at
16,384 x 3-note; measured variant table in saved/r5_gather_probe.log).
These tests pin the pure-layout invariants and the gather's value
equivalence to dense fancy indexing, on the CPU test platform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from preset_gen_vae_tpu.data.corpus_device import (
    LANE,
    MAX_CHUNK_ELEMENTS,
    ChunkedDeviceCorpus,
    from_device_array,
    from_host_array,
    plan_note_chunks,
)


def test_plan_note_chunks_alignment_and_limit():
    # real corpus shapes: H*W = 257*347 at several preset counts
    hw = 257 * 347
    for n_rows in (64, 8192, 16384, 30720, 61440):
        hw_pad, spans = plan_note_chunks(n_rows, hw)
        assert hw_pad % LANE == 0 and hw_pad >= hw and hw_pad - hw < LANE
        # spans tile [0, hw_pad) exactly, in order, LANE-aligned
        assert spans[0][0] == 0
        end = 0
        for off, width in spans:
            assert off == end and off % LANE == 0 and width % LANE == 0
            assert n_rows * width < MAX_CHUNK_ELEMENTS
            end = off + width
        assert end == hw_pad


def test_plan_splits_only_when_needed():
    hw = 257 * 347  # hw_pad = 89216
    assert len(plan_note_chunks(16384, hw)[1]) == 1  # 1.46e9 < 2^31
    assert len(plan_note_chunks(30720, hw)[1]) == 2  # 2.74e9 > 2^31


def _dense(n, c, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, c, h, w)).astype(np.float32)


def test_gather_matches_dense_stacked():
    x = _dense(12, 3, 5, 7)
    corpus = from_host_array(x)
    assert corpus.shape == x.shape and corpus.n_items == 12
    idx = np.asarray([0, 11, 3, 3, 7])
    got = jax.jit(corpus.device_gather)(corpus.chunks, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), x[idx])
    # host fancy indexing path (eval targets / figures)
    np.testing.assert_array_equal(corpus[idx], x[idx])


def test_gather_matches_dense_unstacked_view():
    # un-stacked multi-note: items = presets x notes, note-major per
    # preset (reference abstract_dataset item demux) — resolved inside
    # the gather with NO reshape buffer
    n, c, h, w = 6, 3, 4, 5
    x = _dense(n, c, h, w, seed=1)
    corpus = from_host_array(x).as_unstacked()
    dense_items = x.reshape(n * c, 1, h, w)
    assert corpus.n_items == n * c
    assert corpus.shape == dense_items.shape
    idx = np.asarray([0, 1, 2, 17, 9, 9, 4])
    got = jax.jit(corpus.device_gather)(corpus.chunks, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), dense_items[idx])
    np.testing.assert_array_equal(corpus[idx], dense_items[idx])
    # the view shares the device buffers — zero-copy (round-4 advisor:
    # the old reshape held ~2x the corpus transiently)
    stacked = from_host_array(x)
    assert all(
        a.shape == b.shape for a, b in zip(stacked.chunks, corpus.chunks)
    )


def test_multi_chunk_column_split_gathers_exactly():
    # force a column split by shrinking the element limit via monkey
    # shapes: rows*width must exceed 2^31 / ... too big for a unit test,
    # so instead split manually through plan by using a tall-thin corpus
    # and checking a hand-built 2-chunk layout gathers identically.
    n, h, w = 8, 3, 100  # hw=300 -> hw_pad=384
    x = _dense(n, 1, h, w, seed=2)
    hw, hw_pad = h * w, 384
    flat = np.zeros((n, hw_pad), np.float32)
    flat[:, :hw] = x[:, 0].reshape(n, hw)
    chunks = (jnp.asarray(flat[:, :128]), jnp.asarray(flat[:, 128:]))
    corpus = ChunkedDeviceCorpus(
        chunks, n, 1, h, w, hw_pad, ((0, 0, 128), (0, 128, 256))
    )
    idx = np.asarray([5, 0, 2])
    got = jax.jit(corpus.device_gather)(corpus.chunks, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), x[idx])


def test_from_host_array_bf16_uses_rne_cast():
    x = _dense(4, 1, 8, 16, seed=3)
    corpus = from_host_array(x, dtype=jnp.bfloat16)
    assert corpus.dtype == jnp.bfloat16
    expect = jnp.asarray(x).astype(jnp.bfloat16)  # XLA RNE cast
    got = jax.jit(corpus.device_gather)(
        corpus.chunks, jnp.arange(4)
    )
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(expect, np.float32)
    )
    # __getitem__ upcasts to f32 for dtype-consistent eval arithmetic
    assert corpus[np.asarray([1])].dtype == np.float32


def test_from_device_array_matches_host_path():
    x = _dense(5, 2, 6, 9, seed=4)
    a = from_host_array(x)
    b = from_device_array(jnp.asarray(x))
    assert a.spans == b.spans and a.hw_pad == b.hw_pad
    idx = np.arange(5)
    np.testing.assert_array_equal(a[idx], b[idx])


def test_nbytes_near_one_corpus():
    # padding overhead is < LANE columns per note span
    n, c, h, w = 32, 2, 257, 347
    corpus = from_host_array(_dense(n, c, h, w), dtype=jnp.bfloat16)
    ideal = n * c * h * w * 2
    assert ideal <= corpus.nbytes <= ideal * (1 + LANE / (h * w))
