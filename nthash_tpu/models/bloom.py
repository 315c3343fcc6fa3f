"""Bloom filter over k-mer hashes — the reference ecosystem's primary consumer.

ntHash exists to feed Bloom filters (reference include/nthash/nthash.hpp:56-58
points at btllib; the nte64 multi-hash extension exists precisely to derive
the h independent index functions a Bloom filter needs). This is the
TPU-native equivalent: a bit array stored as int32 words, vectorized
scatter-OR inserts, gather-AND queries, and a cross-device merge that is one
``psum`` (sum then clamp — OR for {0,1} words; same collective as the sketch).

False-positive tuning: m = 2**width_log2 bits, optimal h ~= (m/n) ln 2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..u64 import U64


class BloomFilter(NamedTuple):
    """bits[i]: 0/1 per bucket, one int32 per bit for conflict-free
    vectorized scatter (a packed-word variant would force read-modify-write
    races across lanes; HBM is the cheap resource here)."""

    bits: jnp.ndarray  # [width] int32, values in {0, 1}

    @staticmethod
    def zeros(width_log2: int) -> "BloomFilter":
        return BloomFilter(jnp.zeros(1 << width_log2, dtype=jnp.int32))

    @property
    def width(self) -> int:
        return self.bits.shape[0]


def _indices(hashes: U64, width_log2: int) -> jnp.ndarray:
    """Bucket per hash: low width_log2 bits (hashes are uniform uint64)."""
    mask = jnp.uint32((1 << width_log2) - 1)
    return (hashes.lo & mask).astype(jnp.int32)


def insert(bf: BloomFilter, hashes: U64, valid: jnp.ndarray,
           width_log2: int) -> BloomFilter:
    """Set the bit of every valid window's every hash.

    hashes: U64 [..., H] (H = hash functions per k-mer); valid: bool of
    hashes.shape[:-1].
    """
    idx = _indices(hashes, width_log2).reshape(-1)
    w = jnp.broadcast_to(
        valid.reshape(-1, 1), (valid.size, hashes.hi.shape[-1])
    ).reshape(-1)
    bits = bf.bits.at[idx].max(w.astype(jnp.int32), mode="drop")
    return BloomFilter(bits)


def contains(bf: BloomFilter, hashes: U64, width_log2: int) -> jnp.ndarray:
    """Membership: all H bits set. Returns bool of hashes.shape[:-1]."""
    idx = _indices(hashes, width_log2)
    got = jnp.take(bf.bits, idx, axis=0)
    return jnp.all(got > 0, axis=-1)


def merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Union (bitwise OR)."""
    return BloomFilter(jnp.minimum(a.bits + b.bits, 1))


def psum_merge(bits: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-device union inside shard_map: one psum then clamp to {0,1}."""
    return jnp.minimum(jax.lax.psum(bits, axis_name), 1)


def fill_ratio(bf: BloomFilter) -> jnp.ndarray:
    """Fraction of set bits (false-positive rate ~= ratio**H)."""
    return jnp.mean(bf.bits.astype(jnp.float32))
