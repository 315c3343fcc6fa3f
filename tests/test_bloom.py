"""Bloom filter model: insert/query/merge + distributed union."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu.models import bloom
from nthash_tpu.ops.kmer_jnp import hash_kmers

K, H, WL = 9, 3, 14


def _hash(codes):
    return hash_kmers(jnp.asarray(codes), K, H)


def test_insert_then_contains(rng):
    codes = rng.integers(0, 4, size=(8, 60), dtype=np.uint8)
    res = _hash(codes)
    bf = bloom.insert(bloom.BloomFilter.zeros(WL), res.hashes, res.valid, WL)
    assert bool(jnp.all(bloom.contains(bf, res.hashes, WL)))


def test_absent_kmers_mostly_miss(rng):
    a = rng.integers(0, 4, size=(4, 60), dtype=np.uint8)
    b = rng.integers(0, 4, size=(4, 60), dtype=np.uint8)
    ra, rb = _hash(a), _hash(b)
    bf = bloom.insert(bloom.BloomFilter.zeros(WL), ra.hashes, ra.valid, WL)
    hits = np.asarray(bloom.contains(bf, rb.hashes, WL))
    # fill ratio is tiny (~208*3/16384); P(false positive) = ratio^3 << 1%
    assert hits.mean() < 0.05


def test_invalid_windows_not_inserted(rng):
    codes = np.full((1, 30), 4, dtype=np.uint8)  # all-N read
    res = _hash(codes)
    bf = bloom.insert(bloom.BloomFilter.zeros(WL), res.hashes, res.valid, WL)
    assert int(jnp.sum(bf.bits)) == 0


def test_merge_is_union(rng):
    a = rng.integers(0, 4, size=(2, 40), dtype=np.uint8)
    b = rng.integers(0, 4, size=(2, 40), dtype=np.uint8)
    ra, rb = _hash(a), _hash(b)
    bfa = bloom.insert(bloom.BloomFilter.zeros(WL), ra.hashes, ra.valid, WL)
    bfb = bloom.insert(bloom.BloomFilter.zeros(WL), rb.hashes, rb.valid, WL)
    merged = bloom.merge(bfa, bfb)
    assert bool(jnp.all(bloom.contains(merged, ra.hashes, WL)))
    assert bool(jnp.all(bloom.contains(merged, rb.hashes, WL)))
    assert merged.bits.max() <= 1


def test_distributed_union(rng):
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nthash_tpu.parallel.mesh import READS_AXIS, device_mesh

    mesh = device_mesh(4)
    codes = rng.integers(0, 4, size=(8, 40), dtype=np.uint8)
    sharded = jax.device_put(
        jnp.asarray(codes), NamedSharding(mesh, P(READS_AXIS, None))
    )

    def local(local_codes):
        res = hash_kmers(local_codes, K, H)
        bf = bloom.insert(bloom.BloomFilter.zeros(WL), res.hashes, res.valid, WL)
        return bloom.psum_merge(bf.bits, READS_AXIS)

    bits = shard_map(
        local, mesh=mesh, in_specs=(P(READS_AXIS, None),), out_specs=P(),
        check_vma=False,
    )(sharded)
    merged = bloom.BloomFilter(bits)
    res = _hash(codes)
    assert bool(jnp.all(bloom.contains(merged, res.hashes, WL)))
    assert int(bits.max()) <= 1


def test_fill_ratio(rng):
    bf = bloom.BloomFilter(jnp.array([1, 0, 1, 0], dtype=jnp.int32))
    assert float(bloom.fill_ratio(bf)) == 0.5
