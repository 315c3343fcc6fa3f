"""Partitioned MXU histograms: exact counting above the one-hot crossover.

The direct one-hot matmul histogram (ops/hist_pallas.py) costs ``width``
MACs per update, so past width ~2^18 it loses to even XLA's serialized
~8 ns/update scatter. This module breaks that ceiling for widths
2^19..2^23 by *partitioning* updates on their high bits so each update
only pays for a narrow sub-histogram:

1. **Sort** — a Pallas bitonic network sorts each chunk of ``128 * P``
   updates in VMEM (values stay on-chip for all O(log^2) stages; measured
   ~1.5 ns/update on v5e vs ~1.8-2.9 ns for XLA's HBM-roundtrip sort).
   Sorting groups each chunk's updates by partition id (the top
   ``log2(P)`` bits) into contiguous runs.
2. **Windows** — for each partition p the kernel copies a fixed
   3-sublane-row (384-element) window starting at p's first row into a
   dense [P, G, 3, 128] layout. Windows are sublane-aligned (dynamic
   sublane slicing is cheap; per-element gathers are not), so they
   include neighbors' elements at the edges — those fall outside
   [p*sub, (p+1)*sub) after localization and are dropped for free by the
   one-hot sub-histogram, exactly like the invalid-window sentinel.
   Chunk size 128*P keeps the expected partition load at 128 per chunk,
   so the 3-row window (guaranteed capacity >= 257 after alignment)
   overflows only under extreme skew — which is *detected exactly* from
   the row boundaries and routed to a bit-exact scatter fallback via
   ``lax.cond`` (counts are never silently dropped).
3. **Sub-histograms** — the existing exact MXU one-hot kernel
   (ops/hist_pallas.mxu_histogram_rows) runs per (row, partition) at
   sub-width ``width / P`` <= 2^14-2^15, i.e. 0.2-0.4 ns/update instead
   of ``width`` MACs.

The same partitioning feeds packed Bloom ingestion (OR semantics) via
:func:`partitioned_bloom_words`, which keeps the 1-bit/bucket HBM format
at widths where models/bloom.py previously fell back to a scatter with an
unpacked transient.

The reference has no counting (hashing feeds btllib Bloom filters,
reference include/nthash/nthash.hpp:56-58); this is the scale-out
consumer layer SURVEY.md §2.7 mandates, at the genome-scale widths
(2^20+) those filters actually use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hist_pallas import mxu_histogram_rows

LANES = 128
CAP_ROWS = 3        # sublane rows per partition window (capacity >= 257)
MIN_ROWS = 64       # minimum chunk sublane rows (chunk >= 8192 updates)
MAX_P = 512         # unrolled partition-window loop bound

#: Width range where the partitioned path beats both the direct MXU
#: histogram (linear in width) and the ~8 ns/update scatter (measured on
#: v5e: partitioned ~2-3 ns/update across this range, docs/design.md §7).
PART_MIN_WIDTH_LOG2 = 19
PART_MAX_WIDTH_LOG2 = 23


def plan(width_log2: int) -> tuple[int, int, int]:
    """(p_log2, sub_log2, chunk_rows) for a width: P <= MAX_P partitions
    of sub-width <= 2^15, chunk = 128 * max(P, 64) updates."""
    if not PART_MIN_WIDTH_LOG2 <= width_log2 <= PART_MAX_WIDTH_LOG2:
        raise ValueError(
            f"width_log2 ({width_log2}) must be in "
            f"[{PART_MIN_WIDTH_LOG2}, {PART_MAX_WIDTH_LOG2}]"
        )
    p_log2 = min(width_log2 - 14, MAX_P.bit_length() - 1)
    sub_log2 = width_log2 - p_log2
    chunk_rows = max(MIN_ROWS, 1 << p_log2)
    return p_log2, sub_log2, chunk_rows


def _bitonic_sort(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Ascending bitonic sort of a (rows, LANES) int32 tile (flat
    row-major order). Compare-exchange partner at distance j is i ^ j:
    for j < LANES the partner sits j lanes away (never wrapping for the
    selected elements), for j >= LANES it sits j/LANES sublane rows away,
    so both directions are single lane/sublane rolls.
    """
    i_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    n = rows * LANES
    # hoist the per-stage masks: only log2(n) distinct "upper" (bit j of
    # i) and "ascending" (bit k of i clear) patterns exist, and the final
    # take-hi select mask is their XNOR — computing each once instead of
    # per stage cuts the VPU work per compare-exchange to 7 ops
    upper = {}
    asc = {}
    j = 1
    while j < n:
        upper[j] = (i_flat & j) != 0
        asc[2 * j] = (i_flat & (2 * j)) == 0
        j *= 2
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            if j < LANES:
                fwd = pltpu.roll(x, LANES - j, 1)   # x[i + j]
                bwd = pltpu.roll(x, j, 1)           # x[i - j]
            else:
                jr = j // LANES
                fwd = pltpu.roll(x, rows - jr, 0)
                bwd = pltpu.roll(x, jr, 0)
            partner = jnp.where(upper[j], bwd, fwd)
            lo = jnp.minimum(x, partner)
            hi = jnp.maximum(x, partner)
            # lower index keeps min iff ascending; upper keeps max iff
            # ascending -> take hi where (upper == ascending). For the
            # final merge (k == n) every element ascends.
            take_hi = (
                upper[j] if k == n else upper[j] == asc[k]
            )
            x = jnp.where(take_hi, hi, lo)
            j //= 2
        k *= 2
    return x


def _sort_kernel(in_ref, out_ref, fb_ref, *, rows: int, sub_log2: int,
                 p_pad: int):
    srt = _bitonic_sort(in_ref[0, 0], rows)
    out_ref[0, 0] = srt
    # partition start rows, fused here while the sorted chunk is still in
    # registers: fb[p] = #rows whose last (maximal) element is < p*sub
    lastq = srt[:, LANES - 1 :] >> sub_log2              # (rows, 1)
    pids = jax.lax.broadcasted_iota(jnp.int32, (rows, p_pad), 1)
    fb_ref[0, 0, 0] = jnp.sum(
        (lastq < pids).astype(jnp.int32), axis=0
    )


@partial(jax.jit, static_argnames=("sub_log2", "p_log2", "interpret"))
def sort_chunks(idx: jnp.ndarray, sub_log2: int, p_log2: int = 0,
                *, interpret: bool = False):
    """Sort each (rows, LANES) chunk of [R, G, rows, LANES] ascending and
    emit each chunk's partition start-row table (full_below) in the same
    kernel — the sorted data never round-trips HBM for the boundary scan.

    Returns (sorted [R, G, rows, LANES], full_below [R, G, p_pad] int32)
    with p_pad = max(128, P) lanes (entries past P are meaningless).
    """
    r, g, rows, lanes = idx.shape
    assert lanes == LANES and rows & (rows - 1) == 0
    p_pad = max(LANES, 1 << p_log2)
    return pl.pallas_call(
        partial(_sort_kernel, rows=rows, sub_log2=sub_log2, p_pad=p_pad),
        grid=(r, g),
        in_specs=[
            pl.BlockSpec((1, 1, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, g, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, g, 1, p_pad), jnp.int32),
        ),
        interpret=interpret,
    )(idx)


def _window_kernel(fb_ref, sorted_ref, out_ref, *, p: int, sub_log2: int,
                   rows: int, cg: int):
    """Copy each partition's 3-row window, localized to [0, sub) (elements
    of neighboring partitions / sentinels land outside and are dropped by
    the sub-histogram's one-hot for free). ``cg`` chunks per grid step
    amortize the per-step pipeline overhead (measured ~6 us/step)."""
    for ci in range(cg):
        for pi in range(p):
            start = jnp.minimum(fb_ref[0, ci, 0, pi], rows - CAP_ROWS)
            win = sorted_ref[0, ci, pl.ds(start, CAP_ROWS), :]
            out_ref[0, pi, ci] = win - jnp.int32(pi << sub_log2)


@partial(jax.jit, static_argnames=("p_log2", "sub_log2", "interpret"))
def partition_windows(
    sorted_idx: jnp.ndarray,
    full_below: jnp.ndarray,
    p_log2: int,
    sub_log2: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """[R, G, rows, LANES] sorted chunks + [R, G, 1, >=P] first-row table
    (both from :func:`sort_chunks`) -> localized windows
    [R, P, G, CAP_ROWS, LANES] int32 (out-of-partition entries fall
    outside [0, 2**sub_log2) and are dropped downstream)."""
    r, g, rows, _ = sorted_idx.shape
    p = 1 << p_log2
    p_pad = full_below.shape[-1]
    cg = next(c for c in (8, 4, 2, 1) if g % c == 0)
    return pl.pallas_call(
        partial(_window_kernel, p=p, sub_log2=sub_log2, rows=rows, cg=cg),
        grid=(r, g // cg),
        in_specs=[
            # (1, cg, 1, P) SMEM block: the trailing unit+lane dims keep
            # the last-two-dims == array-dims rule happy
            pl.BlockSpec((1, cg, 1, p_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cg, rows, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, cg, CAP_ROWS, LANES), lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r, p, g, CAP_ROWS, LANES), jnp.int32),
        interpret=interpret,
    )(full_below, sorted_idx)


def check_overflow(fb: jnp.ndarray, p_log2: int, rows: int) -> jnp.ndarray:
    """Window-coverage check from the kernel-emitted start-row table.

    fb[r, g, p] = number of sublane rows whose *last* (maximal) element is
    < p * sub — the first row that can contain partition p. Partition p's
    elements occupy rows [fb[p], fb[p+1]] inclusive, so the fixed
    CAP_ROWS window is sufficient iff fb[p+1] - fb[p] + 1 <= CAP_ROWS;
    the returned scalar reports (conservatively, exactly detecting every
    possible miss) whether any partition anywhere violates that.
    """
    p = 1 << p_log2
    fb = fb[..., :p]
    end = jnp.concatenate(
        [fb[..., 1:], jnp.full_like(fb[..., :1], rows)], axis=-1
    )
    return jnp.any(end - fb + 1 > CAP_ROWS)


def _pad_chunks(idx: jnp.ndarray, width: int, chunk: int) -> jnp.ndarray:
    """[R, N] -> [R, G, rows, LANES] with the sentinel ``width`` padding
    (sorts to the end, localizes out of range, and is dropped)."""
    r, n = idx.shape
    idx = jnp.where((idx < 0) | (idx > width), width, idx)
    pad = (-n) % chunk
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=width)
    return idx.reshape(r, (n + pad) // chunk, chunk // LANES, LANES)


@partial(jax.jit, static_argnames=("width_log2", "interpret", "chunk_rows"))
def partitioned_histogram_rows(
    idx: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
    chunk_rows: int | None = None,
) -> jnp.ndarray:
    """R exact histograms at widths 2^19..2^23 via sort-partitioned MXU.

    Args:
      idx: [R, N] int32 bucket indices; entries outside [0, 2**width_log2)
        are dropped (encode invalid updates as ``width``).
      width_log2: log2 of the histogram width, in [19, 23].
      chunk_rows: test-only override of the chunk sublane-row count
        (smaller chunks keep interpret-mode tests fast).

    Returns:
      int32 [R, 2**width_log2], bit-exact vs np.bincount per row — under
      partition-window overflow (pathological skew) an exact scatter
      fallback runs instead, so the result is always exact.
    """
    p_log2, sub_log2, rows = plan(width_log2)
    if chunk_rows is not None:
        rows = chunk_rows
    width = 1 << width_log2
    r = idx.shape[0]
    chunks = _pad_chunks(idx.reshape(r, -1), width, rows * LANES)

    sorted_idx, fb = sort_chunks(
        chunks, sub_log2, p_log2, interpret=interpret
    )
    overflow = check_overflow(fb, p_log2, rows)
    wins = partition_windows(
        sorted_idx, fb, p_log2, sub_log2, interpret=interpret
    )
    p = 1 << p_log2
    sub_counts = mxu_histogram_rows(
        wins.reshape(r * p, -1), None, sub_log2,
        weight_bits=1, interpret=interpret,
    )
    fast = sub_counts.reshape(r, width)

    def _scatter(x):
        return jnp.stack([
            jnp.zeros(width, jnp.int32).at[x[i]].add(1, mode="drop")
            for i in range(r)
        ])

    return jax.lax.cond(
        overflow, lambda f: _scatter(idx.reshape(r, -1)), lambda f: f, fast
    )


def partitioned_histogram(
    idx: jnp.ndarray, width_log2: int, *, interpret: bool = False
) -> jnp.ndarray:
    """Single-row convenience wrapper over partitioned_histogram_rows."""
    return partitioned_histogram_rows(
        idx.reshape(1, -1), width_log2, interpret=interpret
    )[0]


@partial(jax.jit, static_argnames=("width_log2", "interpret", "chunk_rows"))
def partitioned_bloom_words(
    idx: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
    chunk_rows: int | None = None,
) -> jnp.ndarray:
    """Bit-packed presence at widths 2^19..2^23: partition as above, then
    the packed-word MXU kernel per partition. HBM never sees more than
    1 bit per bucket (the unpacked presence exists only as VMEM tiles).

    Returns uint32 [2**width_log2 / 32] in the hist_pallas.word_index /
    bit_index bijection (each 2^12-bucket block packs independently and
    sub-widths are multiples of 2^12, so per-partition packing concatenates
    exactly).
    """
    from .hist_pallas import mxu_bloom_words_rows

    p_log2, sub_log2, rows = plan(width_log2)
    if chunk_rows is not None:
        rows = chunk_rows
    width = 1 << width_log2
    chunks = _pad_chunks(idx.reshape(1, -1), width, rows * LANES)

    sorted_idx, fb = sort_chunks(
        chunks, sub_log2, p_log2, interpret=interpret
    )
    overflow = check_overflow(fb, p_log2, rows)
    wins = partition_windows(
        sorted_idx, fb, p_log2, sub_log2, interpret=interpret
    )
    p = 1 << p_log2
    fast = mxu_bloom_words_rows(
        wins.reshape(p, -1), sub_log2, interpret=interpret
    ).reshape(-1)

    def _scatter(x):
        # exact fallback without any int32[width] transient: int8 presence
        # in bucket order, packed to words (runs only under extreme skew)
        from ..models.bloom import pack_presence

        presence = (
            jnp.zeros(width, jnp.int8).at[x].max(jnp.int8(1), mode="drop")
        )
        return pack_presence(presence)

    return jax.lax.cond(
        overflow, lambda f: _scatter(idx.reshape(-1)), lambda f: f, fast
    )
