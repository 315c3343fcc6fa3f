"""Streaming front-end: fixed-shape batches, native/numpy parity,
prefetch thread, end-to-end pipeline streaming."""

import numpy as np
import pytest

from nthash_tpu.io import native_loader
from nthash_tpu.io.stream import (
    Prefetcher,
    sniff_read_length,
    stream_code_batches,
)


@pytest.fixture
def fastq(tmp_path, rng):
    path = tmp_path / "reads.fq"
    n, L = 700, 40
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    seqs = bases[rng.integers(0, 5, size=(n, L))]
    with open(path, "wb") as f:
        for i in range(n):
            f.write(b"@r%d\n" % i)
            f.write(seqs[i].tobytes() + b"\n+\n" + b"I" * L + b"\n")
    return path, seqs, n, L


def _codes(seqs):
    from nthash_tpu.constants import ASCII_TO_CODE

    return ASCII_TO_CODE[seqs]


def test_stream_fixed_shapes_and_padding(fastq):
    path, seqs, n, L = fastq
    batches = list(stream_code_batches(path, 256, use_native="numpy"))
    assert [b.shape for b, _ in batches] == [(256, L)] * 3
    assert [m for _, m in batches] == [256, 256, n - 512]
    got = np.concatenate([b for b, _ in batches])[:n]
    assert np.array_equal(got, _codes(seqs))
    # padded tail rows are all-invalid
    assert (batches[-1][0][n - 512:] == 4).all()


@pytest.mark.skipif(not native_loader.available(), reason="no toolchain")
def test_stream_native_matches_numpy(fastq):
    path, *_ = fastq
    a = [b for b, _ in stream_code_batches(path, 128, use_native="native")]
    b = [b2 for b2, _ in stream_code_batches(path, 128, use_native="numpy")]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_sniff_read_length(fastq):
    path, _, _, L = fastq
    assert sniff_read_length(path) == L


def test_prefetcher_order_and_errors():
    assert list(Prefetcher(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("parse failed")

    it = iter(Prefetcher(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="parse failed"):
        next(it)


def test_pipeline_run_file_counts(fastq, rng):
    from nthash_tpu.models.pipeline import PipelineConfig, ReadHashingPipeline
    from nthash_tpu.ops.kmer_jnp import hash_kmers

    path, seqs, n, L = fastq
    import jax.numpy as jnp

    pipe = ReadHashingPipeline(
        PipelineConfig(k=11, num_hashes=2, sketch_width_log2=12, n_devices=1)
    )
    total = pipe.run_file(path, batch_size=256, read_length=L)
    ref = hash_kmers(jnp.asarray(_codes(seqs)), 11, 2)
    assert total == int(np.asarray(ref.valid).sum())


def test_pipeline_count_file_fused(fastq):
    from nthash_tpu.models.pipeline import PipelineConfig, ReadHashingPipeline
    from nthash_tpu.ops.kmer_jnp import hash_kmers
    from nthash_tpu.models import sketch as cms

    path, seqs, n, L = fastq
    import jax.numpy as jnp

    pipe = ReadHashingPipeline(
        PipelineConfig(k=13, num_hashes=2, sketch_width_log2=12, n_devices=1)
    )
    total = pipe.count_file(path, batch_size=256, read_length=L)
    assert total == n
    ref = hash_kmers(jnp.asarray(_codes(seqs)), 13, 2)
    nvalid = int(np.asarray(ref.valid).sum())
    for r in range(2):
        assert int(pipe.sketch.rows[r].sum()) == nvalid


def test_count_file_checkpoint_resume(fastq, tmp_path):
    """Resuming from a mid-stream checkpoint == an uninterrupted run,
    bit-identically (deterministic batching; sketch + batch cursor
    persist via utils.checkpoint)."""
    import jax
    import jax.numpy as jnp

    from nthash_tpu.io.stream import stream_code_batches
    from nthash_tpu.models.pipeline import PipelineConfig, ReadHashingPipeline
    from nthash_tpu.parallel import dp
    from nthash_tpu.utils import checkpoint

    path, seqs, n, L = fastq
    cfg = dict(k=9, num_hashes=2, sketch_width_log2=12, n_devices=1)

    ref = ReadHashingPipeline(PipelineConfig(**cfg))
    total_ref = ref.count_file(path, batch_size=128, read_length=L)

    # simulate a run that crashed after checkpointing 2 completed batches
    crashed = ReadHashingPipeline(PipelineConfig(**cfg))
    reads_done = 0
    for i, (batch, m) in enumerate(stream_code_batches(path, 128, L)):
        if i == 2:
            break
        codes = dp.shard_reads(jnp.asarray(batch), crashed.mesh)
        crashed.sketch = dp.fused_count(
            codes, crashed.sketch, 9, crashed.mesh,
            interpret=jax.default_backend() != "tpu")
        reads_done += m
    ckpt = tmp_path / "stream.ckpt.npz"
    checkpoint.save(ckpt, {"rows": crashed.sketch.rows,
                           "reads": np.int64(reads_done),
                           "batches": np.int64(2)})

    # a fresh pipeline resumes from the checkpoint and finishes the file
    resumed = ReadHashingPipeline(PipelineConfig(**cfg))
    total = resumed.count_file(path, batch_size=128, read_length=L,
                               checkpoint_path=ckpt)
    assert total == total_ref == n
    assert np.array_equal(np.asarray(resumed.sketch.rows),
                          np.asarray(ref.sketch.rows))
