"""jnp k-mer engine vs the host oracle: fuzz across k, N placement, RNA, case."""

import numpy as np
import pytest

from nthash_tpu import oracle
from nthash_tpu.constants import encode_ascii
from nthash_tpu.ops.kmer_jnp import hash_kmers, window_valid


def check_batch(codes, k, h):
    res = hash_kmers(codes, k, h)
    fwd, rev, hashes = res.fwd.to_np(), res.rev.to_np(), res.hashes.to_np()
    valid = np.asarray(res.valid)
    if codes.ndim == 1:
        codes = codes[None]
        fwd, rev, hashes, valid = fwd[None], rev[None], hashes[None], valid[None]
    for b in range(codes.shape[0]):
        of, orv, oh, ov = oracle.hash_all_windows(codes[b], k, h)
        assert np.array_equal(valid[b], ov)
        # all windows must match (N windows too: both sides use zero-seed)
        assert np.array_equal(fwd[b], of)
        assert np.array_equal(rev[b], orv)
        assert np.array_equal(hashes[b], oh)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 8, 31, 32, 33, 63, 64, 65, 100])
def test_fuzz_k(rng, k):
    codes = rng.integers(0, 5, size=(4, 120), dtype=np.uint8)
    check_batch(codes, k, 3)


def test_single_read_1d(rng):
    codes = rng.integers(0, 4, size=50, dtype=np.uint8)
    check_batch(codes, 7, 2)


def test_k_equals_len(rng):
    codes = rng.integers(0, 4, size=(2, 24), dtype=np.uint8)
    check_batch(codes, 24, 4)


def test_n_dense(rng):
    codes = rng.integers(0, 5, size=(3, 60), dtype=np.uint8)
    codes[0, ::3] = 4  # every third base invalid
    codes[1, :] = 4    # fully invalid read
    check_batch(codes, 5, 2)
    assert not np.asarray(hash_kmers(codes, 5, 1).valid)[1].any()


def test_rna_equals_dna():
    dna = encode_ascii("ACGTACACTGGACTGAGTCTACGG")
    rna = encode_ascii("ACGUACACUGGACUGAGUCUACGG")
    a = hash_kmers(dna, 20, 3).hashes.to_np()
    b = hash_kmers(rna, 20, 3).hashes.to_np()
    assert np.array_equal(a, b)


def test_case_folding():
    a = hash_kmers(encode_ascii("acgtacactggactgagtct"), 6, 2).hashes.to_np()
    b = hash_kmers(encode_ascii("ACGTACACTGGACTGAGTCT"), 6, 2).hashes.to_np()
    assert np.array_equal(a, b)


def test_canonical_strand_neutral():
    seq_f = "ACGTACACTGGACTGAGTCT"
    seq_r = "AGACTCAGTCCAGTGTACGT"  # reverse complement
    a = hash_kmers(encode_ascii(seq_f), len(seq_f), 3).hashes.to_np()
    b = hash_kmers(encode_ascii(seq_r), len(seq_r), 3).hashes.to_np()
    assert np.array_equal(a, b)


def test_window_valid_matches_oracle(rng):
    codes = rng.integers(0, 5, size=(5, 40), dtype=np.uint8)
    for k in [1, 3, 11]:
        got = np.asarray(window_valid(codes.astype(np.int32), k))
        for b in range(5):
            assert np.array_equal(got[b], oracle.window_valid(codes[b], k))


def test_errors():
    codes = np.zeros((2, 10), dtype=np.uint8)
    with pytest.raises(ValueError):
        hash_kmers(codes, 0, 1)
    with pytest.raises(ValueError):
        hash_kmers(codes, 11, 1)
