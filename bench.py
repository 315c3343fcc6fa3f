#!/usr/bin/env python
"""Throughput benchmark: k-mer hashes/s/chip at k=32 (headline metric).

Mirrors the reference benchmark harness (reference examples/benchmark.cpp:
28-45: in-memory random reads, roll-all, checksum) at the BASELINE.json
config: 1M x 150 bp reads, k=32. Baseline to beat: the reference measured
1.28e8 hashes/s at k=32 h=1 on one CPU core (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Parity gates (all fatal): before timing, the kernels' FULL output arrays
(every window, every hash index, fwd+rev) are compared bit-for-bit against
the host NumPy oracle on a 1024-read slice — wide enough that a lane
permutation or tile-indexing bug anywhere in the batch cannot pass. The
fused counting path is additionally checked against oracle-derived bucket
histograms, and the DP shard_map step (engine="pallas") runs on-chip with
its own oracle check.

Methodology note: this TPU is reached through a tunnel with a ~30 ms
round-trip floor, so single-call timing measures the network. We queue N
async dispatches back-to-back and synchronize once (utils.profiling.timeit
does exactly this, with a host-transfer fence — block_until_ready does not
synchronize through the tunnel, docs/design.md §7).
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
GATE_READS = 1024     # full-array parity slice (VERDICT r1 weak #4)
COUNT_WIDTH_LOG2 = 14  # count-min row width for the fused counting metric
COUNT_ROWS = 4
BLOOM_WIDTH_LOG2 = 17  # Bloom bits for the insert metric (MXU regime:
                       # one-hot matmul cost scales with width, so the
                       # packed-VMEM kernel wins only below ~2^18; larger
                       # filters fall back to scatter — docs/design.md §7)


def fail(metric):
    print(json.dumps({"metric": metric, "value": 0,
                      "unit": "hashes/s", "vs_baseline": 0}))
    sys.exit(1)


def to_u64(u):
    return (np.asarray(u.hi).astype(np.uint64) << np.uint64(32)
            | np.asarray(u.lo).astype(np.uint64))


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

    # ---- k-mer parity gate: FULL arrays (windows x hashes + fwd/rev) on a
    # 1024-read slice vs the host oracle --------------------------------
    tm_gate = tm[:, :GATE_READS]
    outs = hash_kmers_tm(tm_gate, k, 2, interleave=1, emit_fwd_rev=True)
    got = [to_u64(o) for o in outs]  # [h0, h1, fwd, rev] each [W, GATE]
    del outs
    exp_h = np.zeros((GATE_READS, W, 2), dtype=np.uint64)
    exp_f = np.zeros((GATE_READS, W), dtype=np.uint64)
    exp_r = np.zeros((GATE_READS, W), dtype=np.uint64)
    for b in range(GATE_READS):
        f, r, ext, _ = oracle.hash_all_windows(codes[b], k, 2)
        exp_h[b], exp_f[b], exp_r[b] = ext, f, r
    ok = (np.array_equal(got[0].T, exp_h[:, :, 0])
          and np.array_equal(got[1].T, exp_h[:, :, 1])
          and np.array_equal(got[2].T, exp_f)
          and np.array_equal(got[3].T, exp_r))
    if not ok:
        fail("PARITY_FAILURE")
    del got

    def measure(fn, *args, n=16):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+warm
        t0 = time.time()
        rs = [fn(*args) for _ in range(n)]
        np.asarray(jax.tree_util.tree_leaves(rs[-1])[0])
        return (time.time() - t0) / n

    def measure_hash(h, ni):
        f = jax.jit(
            lambda x: [o.hi[0, ::4096] for o in
                       hash_kmers_tm(x, k, h, interleave=ni)]
        )
        dt = measure(f, tm)
        return B * W * h / dt, B * W / dt

    h1_hashes, h1_kmers = measure_hash(1, 4)
    h4_hashes, h4_kmers = measure_hash(4, 4)

    # ---- spaced seeds: same full-array gate ----------------------------
    ks = len(SEEDS[0])
    ws = L - ks + 1
    souts = hash_seeds_tm(tm_gate, SEEDS, SEED_H, interleave=1)
    sgot = [to_u64(o) for o in souts]  # 6 arrays [Ws, GATE]
    del souts
    exp_s = np.zeros((GATE_READS, ws, len(SEEDS) * SEED_H), dtype=np.uint64)
    for b in range(GATE_READS):
        _, _, hs = oracle.hash_all_windows_seeds(codes[b], SEEDS, SEED_H)
        exp_s[b] = hs
    if not all(np.array_equal(sgot[i].T, exp_s[:, :, i])
               for i in range(len(sgot))):
        fail("SEED_PARITY_FAILURE")
    del sgot

    f_seeds = jax.jit(
        lambda x: [o.hi[0, ::4096] for o in hash_seeds_tm(x, SEEDS, SEED_H)]
    )
    seed_hashes = B * ws * len(SEEDS) * SEED_H / measure(f_seeds, tm)

    # ---- fused counting pipeline: hash -> in-kernel buckets -> MXU
    # histogram (the flagship e2e metric; VERDICT r1 next #1/#5) ---------
    from nthash_tpu.models import sketch as cms
    from nthash_tpu.models.pipeline import fused_count_step

    sk0 = cms.CountMinSketch.zeros(COUNT_ROWS, COUNT_WIDTH_LOG2)

    # gate: fused counts on the slice == oracle bucket histogram
    sk_gate = fused_count_step(tm_gate, sk0, k)
    exp_counts = np.zeros((COUNT_ROWS, 1 << COUNT_WIDTH_LOG2), np.int32)
    mask = np.uint64((1 << COUNT_WIDTH_LOG2) - 1)
    for b in range(GATE_READS):
        _, _, ext, valid = oracle.hash_all_windows(codes[b], k, COUNT_ROWS)
        for w_i in range(W):
            if valid[w_i]:
                for r_i in range(COUNT_ROWS):
                    exp_counts[r_i, int(ext[w_i, r_i] & mask)] += 1
    if not np.array_equal(np.asarray(sk_gate.rows), exp_counts):
        fail("COUNT_PARITY_FAILURE")
    del sk_gate

    count_fn = jax.jit(
        lambda x, s: fused_count_step(x, s, k).rows[:, ::4096]
    )
    pipeline_kmers = B * W / measure(count_fn, tm, sk0, n=8)

    # ---- Bloom insert pipeline (1 bit/bucket end to end) ---------------
    from nthash_tpu.models.bloom import BloomFilter, insert_from_buckets
    from nthash_tpu.ops.kmer_pallas import hash_kmers_tm as _hk

    bf0 = BloomFilter.zeros(BLOOM_WIDTH_LOG2)

    def bloom_step(x, words):
        bucks = _hk(x, k, COUNT_ROWS, emit_buckets=BLOOM_WIDTH_LOG2)
        return insert_from_buckets(
            BloomFilter(words), bucks, emitted_width_log2=BLOOM_WIDTH_LOG2
        ).words[::65536]

    bloom_kmers = B * W / measure(jax.jit(bloom_step), tm, bf0.words, n=8)

    # ---- DP shard_map step with the Pallas engine ON the chip
    # (VERDICT r1 weak #5) ----------------------------------------------
    from nthash_tpu.models import sketch as _cms
    from nthash_tpu.parallel import dp
    from nthash_tpu.parallel.mesh import device_mesh

    mesh = device_mesh()
    Bdp = 65536
    codes_dp = dp.shard_reads(jnp.asarray(codes[:Bdp]), mesh)
    sk_dp0 = _cms.CountMinSketch.zeros(2, COUNT_WIDTH_LOG2)
    hashes_dp, valid_dp, _ = dp.hash_and_sketch(
        codes_dp, sk_dp0, k, 2, COUNT_WIDTH_LOG2, mesh, "pallas"
    )
    got_dp = to_u64(jax.tree_util.tree_map(lambda x: x[:GATE_READS], hashes_dp))
    if not (np.array_equal(got_dp[:, :, 0], exp_h[:, :, 0])
            and np.array_equal(got_dp[:, :, 1], exp_h[:, :, 1])):
        fail("DP_PALLAS_PARITY_FAILURE")
    del hashes_dp, valid_dp, got_dp

    def dp_fn(c, s):
        h_, v_, sk_ = dp.hash_and_sketch(
            c, s, k, 2, COUNT_WIDTH_LOG2, mesh, "pallas"
        )
        return h_.hi[::4096, 0, 0], sk_.rows[0, ::4096]

    dp_kmers = Bdp * W / measure(dp_fn, codes_dp, sk_dp0, n=8)

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
        "count_pipeline_width_log2": COUNT_WIDTH_LOG2,
        "count_pipeline_rows": COUNT_ROWS,
        "bloom_pipeline_kmers_per_s": round(bloom_kmers, 1),
        "bloom_width_log2": BLOOM_WIDTH_LOG2,
        "dp_pallas_kmers_per_s": round(dp_kmers, 1),
        "parity": "bit-exact (full arrays vs host oracle, 1024-read slice: "
                  "kmer h+fwd+rev, 2-seed spaced, fused counts, DP step)",
    }))


if __name__ == "__main__":
    main()
