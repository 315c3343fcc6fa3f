"""Pallas TPU kernel: histogram / count-sketch ingestion on the MXU.

XLA's TPU scatter-add lowers to a serialized per-element loop (~2 ns per
update measured on v5e — docs/design.md §7), which makes *counting* the
bottleneck of the hash -> count-min pipeline even though hashing itself runs
at >10^10 windows/s. This kernel replaces the scatter with matrix math:

  decompose bucket index   b = hi * 128 + lo
  counts as a matrix       C[hi, lo] = sum_n  w_n * [hi_n == hi] * [lo_n == lo]
                                     = A^T @ B
  with one-hot operands    A[n, hi] = (idx_n >> 7 == hi)      (bf16)
                           B[n, lo] = w_n * (idx_n & 127 == lo) (bf16)

A and B are generated **inside the kernel** (VPU iota-compare in VMEM — they
never touch HBM) and contracted on the MXU with f32 accumulation. Exactness:
one-hot entries are exact in bf16, per-chunk partial sums are <= CHUNK < 2^24
so the f32 matmul is exact, and cross-chunk accumulation is int32.

Cost per update is width/128 MAC columns -> width * 1e-5 ns at v5e bf16 peak,
vs ~2 ns for scatter: the MXU path wins below width ~2^17 and is ~20x faster
at typical count-min widths (2^12..2^14). `auto` ingestion in models/sketch
picks per-width. The reference has no counting at all (hashing feeds btllib
Bloom filters, reference include/nthash/nthash.hpp:56-58); this is part of
the scale-out consumer layer SURVEY.md §2.7 mandates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 128  # lane-dim digit: bucket % 128
CHUNK = 2048  # updates ingested per grid step (contraction length)


def _kernel(idx_ref, w_ref, out_ref, *, hi: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[0]  # [CHUNK, 1]
    w = w_ref[0]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, hi), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LO), 1)
    a = ((idx >> 7) == hi_iota).astype(jnp.bfloat16)
    b = jnp.where((idx & 127) == lo_iota, w, 0).astype(jnp.bfloat16)
    c = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[:] += c.astype(jnp.int32)


@partial(jax.jit, static_argnames=("width_log2", "interpret"))
def mxu_histogram(
    idx: jnp.ndarray,
    weight: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted histogram of ``idx`` (any shape, int32 in [0, 2**width_log2))
    with int32 ``weight`` of the same shape. Returns int32 [2**width_log2].

    Requires width_log2 >= 10 (the [width/128, 128] count matrix must tile
    (8, 128)); models/sketch falls back to scatter below that / above the
    measured crossover.
    """
    if not 10 <= width_log2 <= 22:
        raise ValueError(f"width_log2 ({width_log2}) must be in [10, 22]")
    hi = (1 << width_log2) // LO
    idx = idx.reshape(-1).astype(jnp.int32)
    weight = weight.reshape(-1).astype(jnp.int32)
    n = idx.shape[0]
    pad = (-n) % CHUNK
    if pad:
        idx = jnp.pad(idx, (0, pad))
        weight = jnp.pad(weight, (0, pad))
    g = (n + pad) // CHUNK

    counts = pl.pallas_call(
        partial(_kernel, hi=hi),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, CHUNK, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, CHUNK, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (hi, LO), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hi, LO), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx.reshape(g, CHUNK, 1), weight.reshape(g, CHUNK, 1))
    return counts.reshape(-1)
