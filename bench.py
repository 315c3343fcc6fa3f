#!/usr/bin/env python
"""Throughput benchmark: k-mer hashes/s/chip at k=32 (headline metric).

Mirrors the reference benchmark harness (reference examples/benchmark.cpp:
28-45: in-memory random reads, roll-all, checksum) at the BASELINE.json
config: 1M x 150 bp reads, k=32. Baseline to beat: the reference measured
1.28e8 hashes/s at k=32 h=1 on one CPU core (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Methodology note: this TPU is reached through a tunnel with a ~30 ms
round-trip floor, so single-call timing measures the network. We queue N
async dispatches back-to-back and synchronize once — the device executes
them serially, so elapsed/N is true device time per batch.
"""

import json
import sys
import time

import numpy as np

BASELINE_H1 = 1.28e8  # reference k=32 h=1 hashes/s, 1 CPU thread (BASELINE.md)
BASELINE_H4 = 4.30e8  # reference k=32 h=4 hashes/s
BASELINE_SEED = 1.64e8  # reference SeedNtHash {10101,11011} h=3 hashes/s
SEEDS = ("10101", "11011")  # BASELINE.json spaced-seed config
SEED_H = 3


def main():
    import jax
    import jax.numpy as jnp

    from nthash_tpu import oracle
    from nthash_tpu.ops.kmer_pallas import hash_kmers_tm
    from nthash_tpu.ops.seed_pallas import hash_seeds_tm

    B, L, k = 1_048_576, 150, 32
    W = L - k + 1
    rng = np.random.default_rng(0xBE9C)
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    tm = jnp.asarray(np.ascontiguousarray(codes.T.astype(np.int32)))

    # --- parity gate: the kernel being timed must be bit-exact ----------
    # (run on a 4096-read slice so gate outputs don't pin multi-GB HBM)
    tm_small = tm[:, :4096]
    sample = hash_kmers_tm(tm_small, k, 2, interleave=4)
    got0 = np.asarray(sample[0].hi[:, 0]).astype(np.uint64) << np.uint64(32) | np.asarray(
        sample[0].lo[:, 0]
    ).astype(np.uint64)
    got1 = np.asarray(sample[1].hi[:, 0]).astype(np.uint64) << np.uint64(32) | np.asarray(
        sample[1].lo[:, 0]
    ).astype(np.uint64)
    _, _, expect, _ = oracle.hash_all_windows(codes[0], k, 2)
    if not (np.array_equal(got0, expect[:, 0]) and np.array_equal(got1, expect[:, 1])):
        print(json.dumps({"metric": "PARITY_FAILURE", "value": 0,
                          "unit": "hashes/s", "vs_baseline": 0}))
        sys.exit(1)
    del sample

    def measure(h, ni, n=16):
        f = jax.jit(
            lambda x: [o.hi[0, ::4096] for o in
                       hash_kmers_tm(x, k, h, interleave=ni)]
        )
        np.asarray(f(tm)[0])  # compile + warm
        t0 = time.time()
        rs = [f(tm) for _ in range(n)]
        np.asarray(rs[-1][0])
        dt = (time.time() - t0) / n
        return B * W * h / dt, B * W / dt

    h1_hashes, h1_kmers = measure(1, 4)
    h4_hashes, h4_kmers = measure(4, 4)

    # --- spaced seeds (BASELINE.json config: {10101,11011}, h=3) --------
    ks = len(SEEDS[0])
    ws = L - ks + 1
    seed_sample = hash_seeds_tm(tm_small, SEEDS, SEED_H)
    got_seed = np.asarray(seed_sample[0].hi[:, 1]).astype(np.uint64) << np.uint64(
        32
    ) | np.asarray(seed_sample[0].lo[:, 1]).astype(np.uint64)
    _, _, expect_seed = oracle.hash_all_windows_seeds(codes[1], SEEDS, SEED_H)
    if not np.array_equal(got_seed, expect_seed[:, 0]):
        print(json.dumps({"metric": "SEED_PARITY_FAILURE", "value": 0,
                          "unit": "hashes/s", "vs_baseline": 0}))
        sys.exit(1)
    del seed_sample

    def measure_seeds(n=16):
        f = jax.jit(
            lambda x: [o.hi[0, ::4096] for o in
                       hash_seeds_tm(x, SEEDS, SEED_H)]
        )
        np.asarray(f(tm)[0])
        t0 = time.time()
        rs = [f(tm) for _ in range(n)]
        np.asarray(rs[-1][0])
        dt = (time.time() - t0) / n
        return B * ws * len(SEEDS) * SEED_H / dt

    seed_hashes = measure_seeds()

    # --- end-to-end counting step (hash -> count-min scatter; the honest
    # pipeline number — scatter-bound, see docs/design.md §7) -------------
    from nthash_tpu.models import sketch as cms
    from nthash_tpu.ops.kmer_pallas import hash_kmers_batch

    Bp = 262_144
    codes_p = jnp.asarray(codes[:Bp])
    sk0 = cms.CountMinSketch.zeros(4, 20)

    @jax.jit
    def count_step(c, s):
        h, v = hash_kmers_batch(c, k, 4)
        return cms.update(s, h, v, 20).rows[0].sum()

    np.asarray(count_step(codes_p, sk0))
    t0 = time.time()
    rs = [count_step(codes_p, sk0) for _ in range(4)]
    np.asarray(rs[-1])
    dt_p = (time.time() - t0) / 4
    pipeline_kmers = Bp * W / dt_p

    print(json.dumps({
        "metric": "kmer_hashes_per_s_per_chip_k32_h1",
        "value": round(h1_hashes, 1),
        "unit": "hashes/s",
        "vs_baseline": round(h1_hashes / BASELINE_H1, 2),
        "k": k,
        "read_len": L,
        "reads": B,
        "h1_kmers_per_s": round(h1_kmers, 1),
        "h4_hashes_per_s": round(h4_hashes, 1),
        "h4_vs_baseline": round(h4_hashes / BASELINE_H4, 2),
        "seed_hashes_per_s": round(seed_hashes, 1),
        "seed_vs_baseline": round(seed_hashes / BASELINE_SEED, 2),
        "count_pipeline_kmers_per_s": round(pipeline_kmers, 1),
        "parity": "bit-exact (oracle-checked, kmer + spaced-seed)",
    }))


if __name__ == "__main__":
    main()
