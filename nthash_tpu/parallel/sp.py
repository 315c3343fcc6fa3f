"""Sequence parallelism: one genome-scale sequence sharded over devices.

The reference's NtHash is strictly sequential in pos (src/kmer.cpp:246-264).
Because the hash is position-decomposable (an XOR of independently-rotated
per-base terms, src/kmer.cpp:43-73), a length-L sequence can be chunked
across devices with only a (k-1)-base halo from the right neighbor — the
ring-attention moral equivalent for rolling hashes (SURVEY.md §5). The halo
moves over ICI with one ppermute; no sequential dependency crosses devices.

Each device then hashes its (chunk + halo) windows locally with the batched
engine. Device d owns global windows [d*C, d*C + C) (the last device's top
k-1 windows run off the sequence end and are masked invalid via halo padding
with invalid codes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.kmer_jnp import hash_kmers
from ..ops.seed_jnp import hash_kmers_seeds
from ..u64 import U64
from .mesh import SEQ_AXIS


def shard_sequence(codes: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [L] sequence sharded over the seq axis (L % n_devices == 0)."""
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


@partial(jax.jit, static_argnames=("k", "num_hashes", "mesh"))
def hash_long_sequence(
    codes: jnp.ndarray,
    k: int,
    num_hashes: int,
    mesh: Mesh,
):
    """Hash every window of a device-sharded long sequence.

    Args:
      codes: [L] base codes, sharded over the "seq" mesh axis.

    Returns (hashes U64 [L, H] sharded over seq, valid [L] sharded): entry w
    is the hash of window [w, w+k); the trailing k-1 entries (which would run
    off the end) are masked invalid, so every device owns exactly L/n entries.
    """
    n = mesh.shape[SEQ_AXIS]

    def local(chunk):
        ext = _halo_extend(chunk, k, n)
        res = hash_kmers(ext, k, num_hashes)  # W = C windows
        return res.hashes.hi, res.hashes.lo, res.valid

    hi, lo, valid = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS),),
        out_specs=(P(SEQ_AXIS), P(SEQ_AXIS), P(SEQ_AXIS)),
        check_vma=False,
    )(codes)
    return U64(hi, lo), valid


@partial(jax.jit, static_argnames=("seeds", "num_hashes_per_seed", "mesh"))
def hash_long_sequence_seeds(
    codes: jnp.ndarray,
    seeds: tuple[str, ...],
    num_hashes_per_seed: int,
    mesh: Mesh,
):
    """Spaced-seed hash of every window of a device-sharded long sequence.

    Same halo scheme as :func:`hash_long_sequence` (the spaced-seed hash is
    also position-decomposable, so only the (k-1)-base right halo crosses
    devices). Returns (hashes U64 [L, S*H] sharded over seq, valid [L]):
    entry w is the window starting at w; the trailing k-1 off-end entries
    are masked invalid.
    """
    n = mesh.shape[SEQ_AXIS]
    k = len(seeds[0])

    def local(chunk):
        ext = _halo_extend(chunk, k, n)
        res = hash_kmers_seeds(ext, seeds, num_hashes_per_seed)
        return res.hashes.hi, res.hashes.lo, res.valid

    hi, lo, valid = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS),),
        out_specs=(P(SEQ_AXIS), P(SEQ_AXIS), P(SEQ_AXIS)),
        check_vma=False,
    )(codes)
    return U64(hi, lo), valid
