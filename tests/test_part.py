"""Partitioned wide-histogram kernels (ops/part_pallas) vs numpy.

Fast default-suite tests cover the novel machinery (bitonic sort,
partition boundaries, window extraction) with a numpy reconstruction of
the final reduction; the slow tests run the full path including the MXU
sub-histogram kernel in interpret mode.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nthash_tpu.ops import part_pallas as pp
from nthash_tpu.ops.hist_pallas import bit_index, word_index


def _np_counts(idx, width):
    idx = idx[(idx >= 0) & (idx < width)]
    return np.bincount(idx, minlength=width).astype(np.int32)


def test_plan_ranges():
    for w in range(pp.PART_MIN_WIDTH_LOG2, pp.PART_MAX_WIDTH_LOG2 + 1):
        p_log2, sub_log2, rows = pp.plan(w)
        assert p_log2 + sub_log2 == w
        assert rows * pp.LANES >= 8192
        assert rows >= (1 << p_log2)
    with pytest.raises(ValueError):
        pp.plan(18)
    with pytest.raises(ValueError):
        pp.plan(24)


def test_sort_chunks_exact(rng):
    wlog = 19
    p_log2, sub_log2, _ = pp.plan(wlog)
    x = rng.integers(0, 1 << wlog, size=(2, 2, 8, pp.LANES), dtype=np.int32)
    srt, fb = pp.sort_chunks(
        jnp.asarray(x), sub_log2, p_log2, interpret=True
    )
    exp = np.sort(x.reshape(2, 2, -1), axis=-1).reshape(x.shape)
    assert np.array_equal(np.asarray(srt), exp)
    # fused boundary table: fb[p] = #rows fully below p * sub
    lastq = exp[..., :, pp.LANES - 1] >> sub_log2
    for ri in range(2):
        for gi in range(2):
            for pi in range(1 << p_log2):
                assert np.asarray(fb)[ri, gi, 0, pi] == int(
                    (lastq[ri, gi] < pi).sum())


def test_windows_cover_all_partitions(rng):
    """Sort + boundaries + windows: reconstructing counts from localized
    windows (dropping out-of-range entries, numpy reduction) must equal
    bincount — proving no element is lost or duplicated."""
    width_log2 = 19
    p_log2, sub_log2, _ = pp.plan(width_log2)
    rows, width, sub = 8, 1 << width_log2, 1 << sub_log2
    r, g = 2, 3
    idx = rng.integers(0, width, size=(r, g * rows * pp.LANES), dtype=np.int32)
    chunks = pp._pad_chunks(jnp.asarray(idx), width, rows * pp.LANES)
    sorted_idx, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    overflow = pp.check_overflow(fb, p_log2, rows)
    wins = np.asarray(pp.partition_windows(
        sorted_idx, fb, p_log2, sub_log2, interpret=True
    ))
    assert not bool(overflow)
    for ri in range(r):
        got = np.zeros(width, np.int32)
        for p in range(1 << p_log2):
            local = wins[ri, p].reshape(-1)
            local = local[(local >= 0) & (local < sub)]
            got[p * sub : (p + 1) * sub] = np.bincount(local, minlength=sub)
        assert np.array_equal(got, _np_counts(idx[ri], width))


def test_overflow_detected_on_skew(rng):
    """All-identical buckets overflow every window; the flag must fire."""
    width_log2 = 19
    p_log2, sub_log2, _ = pp.plan(width_log2)
    rows = 8
    idx = jnp.full((1, 4 * rows * pp.LANES), 7, jnp.int32)
    chunks = pp._pad_chunks(idx, 1 << width_log2, rows * pp.LANES)
    _, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    assert bool(pp.check_overflow(fb, p_log2, rows))


@pytest.mark.slow
def test_partitioned_histogram_exact(rng):
    width_log2 = 19
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=(2, 2048), dtype=np.int32)
    got = np.asarray(pp.partitioned_histogram_rows(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8
    ))
    for ri in range(2):
        assert np.array_equal(got[ri], _np_counts(idx[ri], width))


@pytest.mark.slow
def test_partitioned_histogram_skew_fallback(rng):
    """Pathological skew must produce exact counts via the fallback."""
    width_log2 = 19
    width = 1 << width_log2
    idx = np.full(2048, 123, dtype=np.int32)
    idx[:64] = rng.integers(0, width, size=64)
    got = np.asarray(pp.partitioned_histogram(
        jnp.asarray(idx), width_log2, interpret=True
    ))
    assert np.array_equal(got, _np_counts(idx, width))


@pytest.mark.slow
def test_partitioned_bloom_words(rng):
    width_log2 = 19
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=4096, dtype=np.int32)
    words = np.asarray(pp.partitioned_bloom_words(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8
    ))
    exp = np.zeros(width // 32, np.uint32)
    for b in idx[idx < width]:
        exp[word_index(b)] |= np.uint32(1) << np.uint32(bit_index(b))
    assert np.array_equal(words, exp)


def test_sketch_resolve_ingestion_ranges(monkeypatch):
    import jax

    from nthash_tpu.models import sketch as cms

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cms.resolve_ingestion("auto", 14) == "mxu"
    assert cms.resolve_ingestion("auto", 18) == "mxu"
    assert cms.resolve_ingestion("auto", 19) == "partitioned"
    assert cms.resolve_ingestion("auto", 23) == "partitioned"
    assert cms.resolve_ingestion("auto", 24) == "scatter"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert cms.resolve_ingestion("auto", 20) == "scatter"
    with pytest.raises(ValueError):
        cms.resolve_ingestion("bogus", 20)


@pytest.mark.slow
def test_sketch_update_partitioned_matches_scatter(rng):
    """update(ingestion='partitioned') == update(ingestion='scatter') at a
    wide width, including invalid-window masking."""
    import jax.numpy as jnp

    from nthash_tpu.models import sketch as cms
    from nthash_tpu.u64 import U64

    wlog, rows, n = 19, 2, 600
    vals = rng.integers(0, 1 << 32, size=(n, rows), dtype=np.uint32)
    hashes = U64(jnp.zeros((n, rows), jnp.uint32), jnp.asarray(vals))
    valid = jnp.asarray(rng.integers(0, 2, size=(n,), dtype=np.int32) > 0)
    sk0 = cms.CountMinSketch.zeros(rows, wlog)
    a = cms.update(sk0, hashes, valid, wlog, ingestion="partitioned")
    b = cms.update(sk0, hashes, valid, wlog, ingestion="scatter")
    assert np.array_equal(np.asarray(a.rows), np.asarray(b.rows))
