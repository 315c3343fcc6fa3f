"""FASTA/FASTQ loader tests."""

import gzip

import numpy as np
import pytest

from nthash_tpu.io.fasta import (
    BatchConfig,
    encode_batch,
    read_fasta,
    read_fastq,
    read_fastx,
    stream_batches,
)

FASTA = b""">read1 some description
ACGTACGT
ACGT
>read2
NNNNACGT
"""

FASTQ = b"""@read1
ACGTACGTACGT
+
IIIIIIIIIIII
@read2 desc
ACGTNNNN
+
IIIIIIII
"""


def test_read_fasta(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(FASTA)
    recs = list(read_fasta(p))
    assert recs == [("read1", b"ACGTACGTACGT"), ("read2", b"NNNNACGT")]


def test_read_fasta_gz(tmp_path):
    p = tmp_path / "x.fa.gz"
    p.write_bytes(gzip.compress(FASTA))
    recs = list(read_fasta(p))
    assert len(recs) == 2 and recs[0][1] == b"ACGTACGTACGT"


def test_read_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_bytes(FASTQ)
    recs = list(read_fastq(p))
    assert recs[0] == ("read1", b"ACGTACGTACGT", b"IIIIIIIIIIII")
    assert recs[1][1] == b"ACGTNNNN"


def test_read_fastx_sniffs(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_bytes(FASTA)
    fq = tmp_path / "a.fq"
    fq.write_bytes(FASTQ)
    assert [n for n, _ in read_fastx(fa)] == ["read1", "read2"]
    assert [n for n, _ in read_fastx(fq)] == ["read1", "read2"]


def test_encode_batch_padding():
    batch = encode_batch([b"ACGT", b"AC"], length=6)
    assert batch.shape == (2, 6)
    assert list(batch[0]) == [0, 1, 2, 3, 4, 4]
    assert list(batch[1]) == [0, 1, 4, 4, 4, 4]


def test_stream_batches(tmp_path):
    p = tmp_path / "many.fa"
    with open(p, "wb") as fh:
        for i in range(10):
            fh.write(f">r{i}\nACGTACGT\n".encode())
    batches = list(stream_batches(p, BatchConfig(batch_size=4)))
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    assert all(b.shape[1] == 8 for b in batches)


def test_end_to_end_file_hash(tmp_path):
    """File -> loader -> engine == oracle on the same sequences."""
    from nthash_tpu import oracle
    from nthash_tpu.ops.kmer_jnp import hash_kmers
    import jax.numpy as jnp

    p = tmp_path / "e2e.fa"
    p.write_bytes(b">a\nACGTACACTGGACTGAGTCT\n>b\nTTTTNNACGTACGTACGTAC\n")
    batch = next(stream_batches(p))
    res = hash_kmers(jnp.asarray(batch), 5, 2)
    for i, seq in enumerate([b"ACGTACACTGGACTGAGTCT", b"TTTTNNACGTACGTACGTAC"]):
        _, _, expect, v = oracle.hash_all_windows(seq, 5, 2)
        assert np.array_equal(res.hashes.to_np()[i], expect)
        assert np.array_equal(np.asarray(res.valid)[i], v)
