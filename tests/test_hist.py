"""MXU histogram / Bloom-pack kernels: exactness vs np.bincount.

Runs the Pallas kernels in interpret mode on CPU (TPU execution is covered
by bench.py's parity-gated counting step). Covers the cases the advisor
flagged in round 1: full-range int32 weights (digit planes), width sweep,
padding, out-of-range drop semantics, and the packed-word bijection.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu.ops.hist_pallas import (
    CHUNK,
    bit_index,
    mxu_bloom_words,
    mxu_histogram,
    mxu_histogram_rows,
    word_index,
)


def _expect(idx, w, width):
    """np.bincount with uint32 modular wraparound (matches int32 counts)."""
    keep = (idx >= 0) & (idx < width)
    exp = np.bincount(
        idx[keep], weights=w[keep].astype(np.int64), minlength=width
    )
    return (exp.astype(np.int64) % (1 << 32)).astype(np.uint32).view(np.int32)


@pytest.mark.parametrize("width_log2", [10, 12, 14, 17])
def test_exact_vs_bincount_full_range_weights(rng, width_log2):
    width = 1 << width_log2
    n = 3 * CHUNK + 17  # exercises padding
    idx = rng.integers(0, width, size=n).astype(np.int32)
    w = rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.int32)
    got = np.asarray(
        mxu_histogram(jnp.asarray(idx), jnp.asarray(w), width_log2,
                      interpret=True)
    )
    assert np.array_equal(got, _expect(idx, w, width))


def test_weight_bits_1_mask(rng):
    idx = rng.integers(0, 4096, size=2 * CHUNK).astype(np.int32)
    w = rng.integers(0, 2, size=2 * CHUNK).astype(np.int32)
    got = np.asarray(
        mxu_histogram(jnp.asarray(idx), jnp.asarray(w), 12, weight_bits=1,
                      interpret=True)
    )
    assert np.array_equal(got, _expect(idx, w, 4096))


def test_none_weight_counts_once(rng):
    idx = rng.integers(0, 1024, size=100).astype(np.int32)
    got = np.asarray(mxu_histogram(jnp.asarray(idx), None, 10, interpret=True))
    assert np.array_equal(got, np.bincount(idx, minlength=1024))


def test_out_of_range_dropped():
    width = 1 << 12
    idx = np.array([0, 5, width, width + 7, -1, 5], dtype=np.int32)
    got = np.asarray(mxu_histogram(jnp.asarray(idx), None, 12, interpret=True))
    assert got[0] == 1 and got[5] == 2 and got.sum() == 3


def test_rows_independent(rng):
    rows, n, wl = 4, 2 * CHUNK + 5, 12
    idx = rng.integers(0, 1 << wl, size=(rows, n)).astype(np.int32)
    v = rng.integers(0, 2, size=n).astype(np.int32)  # shared mask
    got = np.asarray(
        mxu_histogram_rows(jnp.asarray(idx), jnp.asarray(v), wl,
                           weight_bits=1, interpret=True)
    )
    for r in range(rows):
        assert np.array_equal(got[r], _expect(idx[r], v, 1 << wl))


def test_hi_tiling_large_width(rng):
    # width 2^19 -> hi = 4096 = 2 hi-tiles of HI_TILE=2048
    wl, n = 19, CHUNK
    idx = rng.integers(0, 1 << wl, size=n).astype(np.int32)
    got = np.asarray(mxu_histogram(jnp.asarray(idx), None, wl, interpret=True))
    assert np.array_equal(got, np.bincount(idx, minlength=1 << wl))


def test_width_bounds():
    idx = jnp.zeros(8, jnp.int32)
    with pytest.raises(ValueError, match="width_log2"):
        mxu_histogram(idx, None, 9, interpret=True)
    with pytest.raises(ValueError, match="width_log2"):
        mxu_histogram(idx, None, 27, interpret=True)


def test_bloom_words_bijection(rng):
    wl = 13
    width = 1 << wl
    idx = rng.integers(0, width + 10, size=2 * CHUNK).astype(np.int32)
    valid = rng.integers(0, 2, size=2 * CHUNK).astype(np.int32)
    words = np.asarray(
        mxu_bloom_words(jnp.asarray(idx), jnp.asarray(valid), wl,
                        interpret=True)
    )
    assert words.size == width // 32
    exp = np.zeros(width, bool)
    inb = (valid == 1) & (idx < width)
    exp[idx[inb]] = True
    b = np.arange(width)
    got = ((words[word_index(b)] >> bit_index(b)) & 1).astype(bool)
    assert np.array_equal(got, exp)


def test_sketch_update_mxu_matches_scatter(rng):
    from nthash_tpu.models import sketch as cms
    from nthash_tpu.ops.kmer_jnp import hash_kmers

    codes = rng.integers(0, 5, size=(4, 40), dtype=np.uint8)  # incl. Ns
    res = hash_kmers(jnp.asarray(codes), 9, 4)
    z = cms.CountMinSketch.zeros(4, 12)
    a = cms.update(z, res.hashes, res.valid, 12, ingestion="scatter")
    b = cms.update(z, res.hashes, res.valid, 12, ingestion="mxu")
    assert np.array_equal(np.asarray(a.rows), np.asarray(b.rows))
