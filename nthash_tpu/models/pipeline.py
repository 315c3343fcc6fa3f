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

    def run_file(self, path, batch_size: int = 65536):
        """Stream a FASTA/FASTQ file through the pipeline; returns total
        number of valid k-mers hashed."""
        from ..io.fasta import BatchConfig, stream_batches

        n = self.mesh.devices.size
        total = 0
        for batch in stream_batches(path, BatchConfig(batch_size=batch_size)):
            b = batch.shape[0]
            pad = (-b) % n
            if pad:
                batch = np.pad(batch, ((0, pad), (0, 0)), constant_values=4)
            _, valid = self.step(batch)
            total += int(jnp.sum(valid.astype(jnp.int32)))
        return total
