"""The flagship end-to-end model: streaming reads -> hashes -> merged sketch.

Mirrors the north-star deployment (BASELINE.json): FASTA/FASTQ read batches
stream data-parallel across chips/hosts, every k-mer window is hashed
(canonical + nte64 extensions, bit-exact ntHash2), and per-chip count-min
sketches merge via all-reduce. This is the "training step" the multichip
dry-run compiles.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sketch as cms
from ..parallel import dp
from ..parallel.mesh import device_mesh
from ..u64 import U64


@dataclass
class PipelineConfig:
    k: int = 32
    num_hashes: int = 4
    sketch_width_log2: int = 20
    n_devices: int | None = None  # default: all visible devices
    engine: str = "auto"  # "auto": Pallas kernel on TPU, jnp elsewhere


def fused_count_step(codes_tm, sketch, k: int, *, interpret: bool = False):
    """The fast hash->count step: Pallas bucket emission feeding the MXU
    histogram, no 64-bit hash ever written to HBM.

    codes_tm: [L, R] int32 time-major codes (kmer_pallas.prepare_codes);
    one sketch row per nte64 hash. Returns the updated CountMinSketch.
    Jit this (it is pure); bench.py times it as the flagship e2e metric.
    """
    from ..ops.kmer_pallas import hash_kmers_tm

    num_rows, width = sketch.rows.shape
    width_log2 = width.bit_length() - 1
    buckets = hash_kmers_tm(
        codes_tm, k, num_rows, emit_buckets=width_log2, interpret=interpret
    )
    return cms.update_from_buckets(
        sketch, buckets, emitted_width_log2=width_log2, interpret=interpret
    )


class ReadHashingPipeline:
    """Stateful convenience wrapper around the distributed hash+sketch step.

    >>> pipe = ReadHashingPipeline(PipelineConfig(k=32, num_hashes=4))
    >>> hashes, valid = pipe.step(codes_batch)   # [B, W, H] hashes
    >>> counts = pipe.query(hashes)              # count-min estimates
    """

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self.mesh = device_mesh(config.n_devices)
        self.sketch = cms.CountMinSketch.zeros(
            config.num_hashes, config.sketch_width_log2
        )

    def step(self, codes: np.ndarray | jnp.ndarray):
        """Hash one [B, L] batch (B divisible by mesh size) and fold its
        k-mers into the global sketch. Returns (hashes U64 [B, W, H],
        valid [B, W])."""
        cfg = self.config
        codes = dp.shard_reads(jnp.asarray(codes), self.mesh)
        hashes, valid, self.sketch = dp.hash_and_sketch(
            codes,
            self.sketch,
            cfg.k,
            cfg.num_hashes,
            cfg.sketch_width_log2,
            self.mesh,
            cfg.engine,
        )
        return hashes, valid

    def query(self, hashes: U64) -> jnp.ndarray:
        """Count-min multiplicity estimates for the given window hashes."""
        return cms.query(self.sketch, hashes, self.config.sketch_width_log2)

    def run_file(self, path, batch_size: int = 65536,
                 read_length: int | None = None, prefetch: int = 2):
        """Stream a FASTA/FASTQ file through the full hash+sketch pipeline.

        Parsing runs in a background thread (io/stream.Prefetcher over the
        native C++ parser when available), and per-batch valid-k-mer
        counts accumulate as *device* scalars — the single host sync
        happens at the end, so parse / H2D / compute overlap across the
        whole stream. Returns the total number of valid k-mers hashed.
        """
        from ..io.stream import Prefetcher, stream_code_batches

        batch_size += (-batch_size) % self.mesh.devices.size
        counts = []
        for batch, _ in Prefetcher(
            stream_code_batches(path, batch_size, read_length),
            depth=prefetch,
        ):
            _, valid = self.step(batch)
            counts.append(jnp.sum(valid.astype(jnp.int32)))
        return int(np.sum([np.asarray(c) for c in counts], dtype=np.int64))

    def count_file(self, path, batch_size: int = 1 << 18,
                   read_length: int | None = None, prefetch: int = 2,
                   checkpoint_path=None, checkpoint_every: int = 0):
        """Stream a file through the *fused* hash->count pipeline (bucket
        emission in-kernel, MXU histogram; no 64-bit hash reaches HBM) —
        the production streaming configuration (BASELINE config 5).

        Same overlap structure as :meth:`run_file`; every batch has a
        fixed shape so the distributed step compiles exactly once.

        ``checkpoint_path`` + ``checkpoint_every`` (batches) enable
        crash recovery: the sketch and stream position persist via
        utils.checkpoint (FN_NAME-tagged), and a rerun with the same
        path/batch_size resumes after the last completed checkpoint —
        batching is deterministic, so the resumed sketch is bit-identical
        to an uninterrupted run. The reference's analogue is that its
        iterator state (pos, fwd, rev) is resumable by construction
        (reference nthash.hpp:72-78); here the carried state is the
        sketch plus the batch cursor.

        Returns (reads_streamed including any resumed prefix).
        """
        from ..io.stream import Prefetcher, stream_code_batches
        from ..parallel import dp
        from ..utils import checkpoint

        batch_size += (-batch_size) % self.mesh.devices.size
        cfg = self.config
        total = 0
        done_batches = 0
        if checkpoint_path is not None:
            from pathlib import Path

            if Path(checkpoint_path).exists():
                state = checkpoint.load(checkpoint_path, {
                    "rows": self.sketch.rows,
                    "reads": np.int64(0),
                    "batches": np.int64(0),
                })
                self.sketch = cms.CountMinSketch(jnp.asarray(state["rows"]))
                total = int(state["reads"])
                done_batches = int(state["batches"])

        seen = 0
        for batch, n in Prefetcher(
            stream_code_batches(path, batch_size, read_length),
            depth=prefetch,
        ):
            seen += 1
            if seen <= done_batches:
                continue  # already counted before the checkpoint
            codes = dp.shard_reads(jnp.asarray(batch), self.mesh)
            self.sketch = dp.fused_count(
                codes, self.sketch, cfg.k, self.mesh,
                interpret=jax.default_backend() != "tpu",
            )
            total += n
            if (checkpoint_path is not None and checkpoint_every
                    and (seen - done_batches) % checkpoint_every == 0):
                jax.block_until_ready(self.sketch.rows)
                checkpoint.save(checkpoint_path, {
                    "rows": self.sketch.rows,
                    "reads": np.int64(total),
                    "batches": np.int64(seen),
                })
        jax.block_until_ready(self.sketch.rows)
        if checkpoint_path is not None:
            checkpoint.save(checkpoint_path, {
                "rows": self.sketch.rows,
                "reads": np.int64(total),
                "batches": np.int64(seen),
            })
        return total
