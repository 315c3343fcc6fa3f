"""Pallas kernel correctness (interpret mode on CPU) vs the jnp engine/oracle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu import oracle
from nthash_tpu.ops.kmer_jnp import hash_kmers
from nthash_tpu.ops.kmer_pallas import (
    hash_kmers_batch,
    hash_kmers_tm,
    pad_reads,
    prepare_codes,
)


@pytest.mark.slow
@pytest.mark.parametrize("k,h", [(9, 3)])
def test_kernel_matches_jnp(rng, k, h):
    # Interpret mode costs seconds per unrolled step, so CI keeps one tiny
    # config; bench.py re-verifies parity on the real TPU at full size.
    B, L = 8, 24
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    res, valid = hash_kmers_batch(jnp.asarray(codes), k, h,
                                  interleave=1, interpret=True)
    ref = hash_kmers(jnp.asarray(codes), k, h)
    assert np.array_equal(res.to_np(), ref.hashes.to_np())
    assert np.array_equal(np.asarray(valid), np.asarray(ref.valid))


@pytest.mark.slow
def test_kernel_emit_fwd_rev(rng):
    B, L, k = 8, 24, 7
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    tm = prepare_codes(jnp.asarray(codes), 1)
    outs = hash_kmers_tm(tm, k, 1, interleave=1, emit_fwd_rev=True,
                         interpret=True)
    assert len(outs) == 3  # canonical, fwd, rev
    ref = hash_kmers(jnp.asarray(codes), k, 1)
    assert np.array_equal(outs[1].to_np().T[:B], ref.fwd.to_np())
    assert np.array_equal(outs[2].to_np().T[:B], ref.rev.to_np())


def test_kernel_golden(rng):
    # README golden vector through the kernel path
    from nthash_tpu.constants import encode_ascii

    seq = "TGACTGATCGAGTCGTACTAG"
    codes = np.tile(encode_ascii(seq), (4, 1))
    res, valid = hash_kmers_batch(jnp.asarray(codes), 5, 1,
                                  interleave=1, interpret=True)
    h = res.to_np()
    assert h[0, 0, 0] == 0x606F60C2A6FD7D2D
    assert h[3, 16, 0] == 0x80D9E6D93C77AD71


def test_pad_reads():
    assert pad_reads(1, 1) == 1024
    assert pad_reads(1024, 1) == 1024
    assert pad_reads(1025, 1) == 2048
    assert pad_reads(5000, 4) == 8192


def test_padding_reads_are_invalid(rng):
    # padded (phantom) reads must not produce valid windows
    B, L, k = 3, 30, 5
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    tm = prepare_codes(jnp.asarray(codes), 1)
    assert tm.shape == (L, 1024)
    assert np.all(np.asarray(tm)[:, B:] == 4)
