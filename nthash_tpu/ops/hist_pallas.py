"""Pallas TPU kernels: histogram / count-sketch / Bloom ingestion on the MXU.

XLA's TPU scatter-add lowers to a serialized per-element loop (~7 ns per
update measured on v5e at width 2^20 — docs/design.md §7), which makes
*counting* the bottleneck of the hash -> count-min pipeline even though
hashing itself runs at >10^10 windows/s. These kernels replace the scatter
with matrix math:

  decompose bucket index   b = hi * 128 + lo
  counts as a matrix       C[hi, lo] = sum_n  w_n * [hi_n == hi] * [lo_n == lo]
                                     = A @ B^T
  with one-hot operands    A[hi, n] = (idx_n >> 7 == hi)
                           B[lo, n] = w_n * (idx_n & 127 == lo)

Operand orientation matters on TPU: updates live on the *lane* (minor)
dimension of both A and B, so they broadcast straight out of a [1, CHUNK]
VMEM row with no relayout, and the contraction runs over the minor dims
(``x @ y.T``, a native MXU fast path). The transposed-column orientation
(updates on sublanes) would force either an in-kernel relayout or — worse —
a [..., CHUNK, 1] HBM operand whose trailing unit dim XLA pads to 128 lanes
(a measured 128x memory blowup at batch scale).

A and B are generated **inside the kernel** (VPU iota-compare in VMEM — they
never touch HBM) and contracted on the MXU. Exactness for arbitrary int32
weights comes from *digit planes*: the weight is split into 8-bit digits
(one matmul per plane; `weight_bits` controls the plane count), each digit
is exact in bf16, per-chunk partial sums stay below 2^24 so the f32 matmul
is exact, and planes recombine with int32 shifts whose wraparound matches
uint32 modular arithmetic. Cross-chunk accumulation is int32.

Out-of-range indices (idx < 0 or idx >= width) match no one-hot column and
are dropped for free — callers encode "invalid" as idx = width instead of
carrying a separate mask.

Cost per update is `width` MACs (one one-hot column dot) plus
`width/128 + 128` VPU compares for operand generation. Measured on v5e:
0.21 ns/update at width 2^14, 0.71 ns at 2^16 — linear in width, crossing
the ~7 ns scatter around width ~2^19. models/sketch's "auto" ingestion
switches at MXU_MAX_WIDTH_LOG2.

Three entry points:
- :func:`mxu_histogram`       — flat weighted histogram, int32 [width]
- :func:`mxu_histogram_rows`  — R independent histograms in one launch
                                (count-min sketch rows), int32 [R, width]
- :func:`mxu_bloom_words`     — presence only, bit-packed uint32 words
                                (Bloom filter ingestion at 1 bit/bucket)

The reference has no counting at all (hashing feeds btllib Bloom filters,
reference include/nthash/nthash.hpp:56-58); this is part of the scale-out
consumer layer SURVEY.md §2.7 mandates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 128        # lane-dim digit: bucket % 128
CHUNK = 8192    # updates per one-hot matmul (contraction length)
GSUB = 8        # chunks ingested per grid step when rows are long (block
                # sublane dim: Mosaic requires the 2nd-minor block dim be
                # a multiple of 8 — or equal to the whole array dim, which
                # is how short rows avoid padding to 8 chunks; see _prep)
GSUB_MAX_WHOLE = 64  # rows up to this many chunks run in ONE grid step
                     # (block == array dim): the partitioned huge-width
                     # path has 16K+ short rows, and padding each to
                     # CHUNK*GSUB would cost GBs of HBM for padding alone
HI_TILE = 512   # max sublane-dim tile of the count matrix per grid step
PACK = 32       # bits per packed Bloom word

#: Widths where the MXU one-hot matmul beats XLA's serialized scatter
#: (~7 ns/update): measured 0.21 ns at 2^14 and 0.71 ns at 2^16 on v5e,
#: linear in width -> crossover ~2^19; 18 keeps a safety margin
#: (docs/design.md §7).
MXU_MIN_WIDTH_LOG2 = 10
MXU_MAX_WIDTH_LOG2 = 18


def _planes(weight_bits: int) -> int:
    """8-bit digit planes needed for exact ``weight_bits``-bit weights."""
    if not 1 <= weight_bits <= 32:
        raise ValueError(f"weight_bits ({weight_bits}) must be in [1, 32]")
    return (weight_bits + 7) // 8


def _onehot_counts(idx, w, hi_tile: int, hi_base, planes: int):
    """Exact int32 count matrix [hi_tile, LO] for one chunk of updates.

    idx: [1, CHUNK] int32 (updates on lanes); w: [1, CHUNK] int32 or None
    (count each update once — skips the weight load and select entirely,
    and contracts int8 x int8 -> int32: exact for 0/1 operands with
    <= CHUNK per-dot sums, and measured 9-31% faster than bf16 across
    widths 2^14..2^16 on v5e).
    Weighted: one bf16 matmul per 8-bit weight digit plane; digits
    (0..255) are exact in bf16, per-plane chunk sums < 256*CHUNK < 2^24
    are exact in f32, and the int32 shift-recombination wraps exactly
    like uint32 modular arithmetic (so full-range int32 weights are
    exact).
    """
    hi_iota = hi_base + jax.lax.broadcasted_iota(jnp.int32, (hi_tile, CHUNK), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, CHUNK), 0)
    hi_match = (idx >> 7) == hi_iota                  # [hi_tile, CHUNK]
    lo_match = (idx & 127) == lo_iota                 # [LO, CHUNK]

    if w is None:
        # unweighted: int8 x int8 -> int32 runs the MXU at 2x the bf16
        # rate on v5e; 0/1 operands and <=CHUNK per-dot sums are exact
        return jax.lax.dot_general(
            hi_match.astype(jnp.int8), lo_match.astype(jnp.int8),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )
    a = hi_match.astype(jnp.bfloat16)

    def dot(b):
        # contract the minor (lane) dims of both operands: A @ B^T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.int32)
    wu = w.astype(jnp.uint32)
    acc = None
    for p in range(planes):
        digit = ((wu >> (8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
        c = dot(jnp.where(lo_match, digit, 0).astype(jnp.bfloat16))
        c = c << (8 * p)
        acc = c if acc is None else acc + c
    return acc


def _hist_kernel(*refs, hi_tile: int, planes: int, has_w: bool, gsub: int):
    """grid = (rows, hi_tiles, chunks); out block [1, hi_tile, LO] stays
    resident in VMEM across the chunk dimension (innermost grid dim)."""
    if has_w:
        idx_ref, w_ref, out_ref = refs
    else:
        (idx_ref, out_ref), w_ref = refs, None

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    hi_base = pl.program_id(1) * hi_tile
    total = None
    for j in range(gsub):
        c = _onehot_counts(
            idx_ref[0, j : j + 1],
            None if w_ref is None else w_ref[0, j : j + 1],
            hi_tile, hi_base, planes,
        )
        total = c if total is None else total + c
    out_ref[0] += total


def _bloom_kernel(idx_ref, out_ref, acc_ref, *, hi_tile: int, nchunks: int,
                  gsub: int):
    """Presence accumulation in VMEM scratch; last chunk packs 32 sublanes
    per lane into one uint32 word (bit b of word [q, j] = bucket presence at
    hi = 32q + b, lo = j — see word_index/bit_index for the bijection)."""
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hi_base = pl.program_id(0) * hi_tile
    total = None
    for j in range(gsub):
        c = _onehot_counts(idx_ref[0, j : j + 1], None, hi_tile, hi_base, 1)
        total = c if total is None else total + c
    acc_ref[:] += total

    @pl.when(pl.program_id(1) == nchunks - 1)
    def _pack():
        # int32 throughout (Mosaic can't reduce unsigned ints); the bit
        # pattern is identical, bitcast at the end. Unrolled OR instead of
        # a sum-reduction over the middle axis for the same reason.
        present = (acc_ref[:] > 0).astype(jnp.int32)
        present = present.reshape(hi_tile // PACK, PACK, LO)
        word = None
        for j in range(PACK):
            bit = present[:, j, :] << j
            word = bit if word is None else word | bit
        out_ref[0] = jax.lax.bitcast_convert_type(word, jnp.uint32)


def _prep(idx: jnp.ndarray, weight: jnp.ndarray | None, width_log2: int):
    """Flatten rows, clamp-pad, and pick grid/tiling. Returns
    (idx [R, G, CHUNK], w [R, G, CHUNK], rows, g, gsub, hi, hi_tile)
    where ``gsub`` is the chunks-per-grid-step block: rows of up to
    GSUB_MAX_WHOLE chunks run whole (block dim == array dim, no group
    padding — many-short-row callers like the partitioned huge widths
    would otherwise pay GBs of padding); longer rows pad to a multiple of
    GSUB chunks.

    Updates stay on the minor (lane) dimension end to end — see the module
    docstring for why a trailing unit dim is catastrophic here.
    """
    rows = idx.shape[0]
    idx = idx.reshape(rows, -1).astype(jnp.int32)
    n = idx.shape[1]
    if weight is not None:
        weight = jnp.broadcast_to(
            weight.astype(jnp.int32).reshape(-1, n), (rows, n)
        )
    g0 = max(1, -(-n // CHUNK))
    quantum = CHUNK * (1 if g0 <= GSUB_MAX_WHOLE else GSUB)
    pad = (-n) % quantum
    if pad:
        # padded entries: idx = -1 matches no one-hot column => dropped
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        if weight is not None:
            weight = jnp.pad(weight, ((0, 0), (0, pad)))
    g = (n + pad) // CHUNK
    gsub = g if g <= GSUB_MAX_WHOLE else GSUB
    hi = (1 << width_log2) // LO
    hi_tile = min(hi, HI_TILE)
    return (
        idx.reshape(rows, g, CHUNK),
        None if weight is None else weight.reshape(rows, g, CHUNK),
        rows, g, gsub, hi, hi_tile,
    )


@partial(
    jax.jit, static_argnames=("width_log2", "weight_bits", "interpret")
)
def mxu_histogram_rows(
    idx: jnp.ndarray,
    weight: jnp.ndarray | None,
    width_log2: int,
    *,
    weight_bits: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """R independent weighted histograms in one kernel launch.

    Args:
      idx: [R, ...] int32 bucket indices; entries outside [0, 2**width_log2)
        are dropped (encode invalid updates as e.g. ``width``).
      weight: int32, either broadcastable [...] (shared across rows) or
        [R, ...]; ``None`` counts each update once.
      width_log2: log2 of the histogram width, in [10, 26].
      weight_bits: how many low bits of the weights are significant; one
        bf16 matmul per 8 bits. 32 (default) is exact for any int32 weight
        (two's-complement wraparound included); pass 1 for 0/1 masks.

    Returns:
      int32 [R, 2**width_log2], bit-exact vs np.bincount per row.
    """
    if not 10 <= width_log2 <= 26:
        raise ValueError(f"width_log2 ({width_log2}) must be in [10, 26]")
    planes = _planes(weight_bits)
    idxb, wb, rows, g, gsub, hi, hi_tile = _prep(idx, weight, width_log2)

    spec = pl.BlockSpec((1, gsub, CHUNK), lambda r, h, i: (r, i, 0),
                        memory_space=pltpu.VMEM)
    operands = (idxb,) if wb is None else (idxb, wb)
    counts = pl.pallas_call(
        partial(_hist_kernel, hi_tile=hi_tile, planes=planes,
                has_w=wb is not None, gsub=gsub),
        grid=(rows, hi // hi_tile, g // gsub),
        in_specs=[spec] * len(operands),
        out_specs=pl.BlockSpec((1, hi_tile, LO), lambda r, h, i: (r, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hi, LO), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return counts.reshape(rows, -1)


def mxu_histogram(
    idx: jnp.ndarray,
    weight: jnp.ndarray | None,
    width_log2: int,
    *,
    weight_bits: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flat weighted histogram of ``idx`` (any shape) -> int32 [width].

    See :func:`mxu_histogram_rows`; this is the single-row convenience.
    """
    return mxu_histogram_rows(
        idx.reshape(1, -1),
        None if weight is None else weight.reshape(1, -1),
        width_log2,
        weight_bits=weight_bits,
        interpret=interpret,
    )[0]


def _bloom_rows_kernel(idx_ref, out_ref, acc_ref, *, hi_tile: int,
                       nchunks: int, gsub: int):
    """Rows variant of _bloom_kernel: grid = (rows, hi_tiles, chunks)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hi_base = pl.program_id(1) * hi_tile
    total = None
    for j in range(gsub):
        c = _onehot_counts(idx_ref[0, j : j + 1], None, hi_tile, hi_base, 1)
        total = c if total is None else total + c
    acc_ref[:] += total

    @pl.when(pl.program_id(2) == nchunks - 1)
    def _pack():
        present = (acc_ref[:] > 0).astype(jnp.int32)
        present = present.reshape(hi_tile // PACK, PACK, LO)
        word = None
        for j in range(PACK):
            bit = present[:, j, :] << j
            word = bit if word is None else word | bit
        out_ref[0, 0] = jax.lax.bitcast_convert_type(word, jnp.uint32)


@partial(jax.jit, static_argnames=("width_log2", "interpret"))
def mxu_bloom_words_rows(
    idx: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """R independent bit-packed presence maps -> uint32 [R, width / 32].

    Rows variant of :func:`mxu_bloom_words` (same word_index/bit_index
    bijection per row); used by ops/part_pallas.partitioned_bloom_words
    with one row per partition. idx entries outside [0, 2**width_log2)
    are dropped.
    """
    if not 12 <= width_log2 <= 26:
        raise ValueError(f"width_log2 ({width_log2}) must be in [12, 26]")
    idxb, _, rows, g, gsub, hi, hi_tile = _prep(idx, None, width_log2)

    words = pl.pallas_call(
        partial(_bloom_rows_kernel, hi_tile=hi_tile, nchunks=g // gsub,
                gsub=gsub),
        grid=(rows, hi // hi_tile, g // gsub),
        in_specs=[
            pl.BlockSpec((1, gsub, CHUNK), lambda r, h, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hi_tile // PACK, LO),
                               lambda r, h, i: (r, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (rows, hi // hi_tile, hi_tile // PACK, LO), jnp.uint32
        ),
        scratch_shapes=[pltpu.VMEM((hi_tile, LO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idxb)
    return words.reshape(rows, -1)


def word_index(bucket):
    """Packed-word bijection used by mxu_bloom_words: bucket b lives in word
    ``((b >> 12) << 7) | (b & 127)`` at bit ``(b >> 7) & 31`` (32 sublanes of
    the count matrix pack into one word; lanes stay the minor dim)."""
    return ((bucket >> 12) << 7) | (bucket & 127)


def bit_index(bucket):
    return (bucket >> 7) & 31


@partial(jax.jit, static_argnames=("width_log2", "interpret"))
def mxu_bloom_words(
    idx: jnp.ndarray,
    weight: jnp.ndarray | None,
    width_log2: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bit-packed presence of ``idx`` -> uint32 [2**width_log2 / 32].

    The scatter-OR a Bloom filter needs, as one-hot matmuls plus an
    in-kernel 32-sublane pack: HBM only ever sees 1 bit per bucket (the
    full-width count matrix lives in VMEM tiles). Bit layout is the
    :func:`word_index`/:func:`bit_index` bijection. idx outside
    [0, 2**width_log2) (e.g. invalid windows encoded as ``width``) and
    entries with weight 0 are dropped.
    """
    if not 12 <= width_log2 <= 26:
        raise ValueError(f"width_log2 ({width_log2}) must be in [12, 26]")
    if weight is not None:
        # presence needs only w != 0; fold into idx to keep one plane
        idx = jnp.where(weight.astype(jnp.int32) != 0, idx, -1)
    idxb, _, rows, g, gsub, hi, hi_tile = _prep(
        idx.reshape(1, -1), None, width_log2)

    words = pl.pallas_call(
        partial(_bloom_kernel, hi_tile=hi_tile, nchunks=g // gsub,
                gsub=gsub),
        grid=(hi // hi_tile, g // gsub),
        in_specs=[
            pl.BlockSpec((1, gsub, CHUNK), lambda h, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hi_tile // PACK, LO),
                               lambda h, i: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (hi // hi_tile, hi_tile // PACK, LO), jnp.uint32
        ),
        scratch_shapes=[pltpu.VMEM((hi_tile, LO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idxb)
    return words.reshape(-1)
