"""Partitioned wide-histogram kernels (ops/part_pallas) vs numpy.

Fast default-suite tests cover the novel machinery (bitonic sort,
partition boundaries, window extraction) with a numpy reconstruction of
the final reduction; the slow tests run the full path including the MXU
sub-histogram kernel in interpret mode.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nthash_tpu.ops import part_pallas as pp
from nthash_tpu.ops.hist_pallas import bit_index, word_index


def _np_counts(idx, width):
    idx = idx[(idx >= 0) & (idx < width)]
    return np.bincount(idx, minlength=width).astype(np.int32)


def test_plan_ranges():
    for w in range(pp.PART_MIN_WIDTH_LOG2, pp.PART_MAX_WIDTH_LOG2 + 1):
        p_log2, sub_log2, rows, cap = pp.plan(w)
        assert p_log2 + sub_log2 == w
        assert rows * pp.LANES >= 8192
        assert rows >= (1 << p_log2)
        assert p_log2 <= pp.MAX_P.bit_length() - 1
        # narrow sub-histograms (the one-hot cost driver): the deeper
        # plans keep sub within the MXU kernel range at every width, so
        # no recursion is needed and the packed-Bloom path covers 2^30
        assert 10 <= sub_log2 <= 18
        # capacity = load factor + 2 alignment rows; window inflation
        # (cap / m) stays <= 2x everywhere (it was 3x at m=1)
        m_eff = rows >> p_log2
        assert cap == m_eff + 2
        assert cap / m_eff <= 2.0
    with pytest.raises(ValueError):
        pp.plan(18)
    with pytest.raises(ValueError):
        pp.plan(31)


def test_sort_chunks_exact(rng):
    wlog = 19
    p_log2, sub_log2, *_ = pp.plan(wlog)
    x = rng.integers(0, 1 << wlog, size=(2, 2, 8, pp.LANES), dtype=np.int32)
    srt, fb = pp.sort_chunks(
        jnp.asarray(x), sub_log2, p_log2, interpret=True
    )
    exp = np.sort(x.reshape(2, 2, -1), axis=-1).reshape(x.shape)
    assert np.array_equal(np.asarray(srt), exp)
    # fused boundary table: fb[p] = #rows fully below p * sub
    lastq = exp[..., :, pp.LANES - 1] >> sub_log2
    for ri in range(2):
        for gi in range(2):
            for pi in range(1 << p_log2):
                assert np.asarray(fb)[ri, gi, 0, pi] == int(
                    (lastq[ri, gi] < pi).sum())


def test_windows_cover_all_partitions(rng):
    """Sort + boundaries + windows: reconstructing counts from localized
    windows (dropping out-of-range entries, numpy reduction) must equal
    bincount — proving no element is lost or duplicated."""
    width_log2 = 19
    p_log2, sub_log2, *_ = pp.plan(width_log2)
    rows, width, sub = 8, 1 << width_log2, 1 << sub_log2
    r, g = 2, 3
    idx = rng.integers(0, width, size=(r, g * rows * pp.LANES), dtype=np.int32)
    chunks = pp._pad_chunks(jnp.asarray(idx), width, rows * pp.LANES)
    sorted_idx, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    overflow = pp.check_overflow(fb, p_log2, sorted_idx, sub_log2)
    wins = np.asarray(pp.partition_windows(
        sorted_idx, fb, p_log2, sub_log2, interpret=True
    ))
    assert not bool(overflow)
    for ri in range(r):
        got = np.zeros(width, np.int32)
        for p in range(1 << p_log2):
            local = wins[ri, p].reshape(-1)
            local = local[(local >= 0) & (local < sub)]
            got[p * sub : (p + 1) * sub] = np.bincount(local, minlength=sub)
        assert np.array_equal(got, _np_counts(idx[ri], width))


def test_overflow_detected_on_skew(rng):
    """All-identical buckets overflow every window; the flag must fire."""
    width_log2 = 19
    p_log2, sub_log2, *_ = pp.plan(width_log2)
    rows = 8
    idx = jnp.full((1, 4 * rows * pp.LANES), 7, jnp.int32)
    chunks = pp._pad_chunks(idx, 1 << width_log2, rows * pp.LANES)
    srt, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    assert bool(pp.check_overflow(fb, p_log2, srt, sub_log2))


@pytest.mark.slow
def test_partitioned_histogram_exact(rng):
    width_log2 = 19
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=(2, 2048), dtype=np.int32)
    got = np.asarray(pp.partitioned_histogram_rows(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8
    ))
    for ri in range(2):
        assert np.array_equal(got[ri], _np_counts(idx[ri], width))


@pytest.mark.slow
def test_partitioned_histogram_skew_fallback(rng):
    """Pathological skew must produce exact counts via the fallback."""
    width_log2 = 19
    width = 1 << width_log2
    idx = np.full(2048, 123, dtype=np.int32)
    idx[:64] = rng.integers(0, width, size=64)
    got = np.asarray(pp.partitioned_histogram(
        jnp.asarray(idx), width_log2, interpret=True
    ))
    assert np.array_equal(got, _np_counts(idx, width))


@pytest.mark.slow
def test_partitioned_bloom_words(rng):
    width_log2 = 19
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=4096, dtype=np.int32)
    words = np.asarray(pp.partitioned_bloom_words(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8
    ))
    exp = np.zeros(width // 32, np.uint32)
    for b in idx[idx < width]:
        exp[word_index(b)] |= np.uint32(1) << np.uint32(bit_index(b))
    assert np.array_equal(words, exp)


def test_sketch_resolve_ingestion_ranges(monkeypatch):
    import jax

    from nthash_tpu.models import sketch as cms

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cms.resolve_ingestion("auto", 14) == "mxu"
    assert cms.resolve_ingestion("auto", 18) == "mxu"
    assert cms.resolve_ingestion("auto", 19) == "partitioned"
    assert cms.resolve_ingestion("auto", 23) == "partitioned"
    assert cms.resolve_ingestion("auto", 27) == "partitioned"
    assert cms.resolve_ingestion("auto", 30) == "partitioned"
    assert cms.resolve_ingestion("auto", 31) == "scatter"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert cms.resolve_ingestion("auto", 20) == "scatter"
    with pytest.raises(ValueError):
        cms.resolve_ingestion("bogus", 20)


@pytest.mark.slow
def test_sketch_update_partitioned_matches_scatter(rng):
    """update(ingestion='partitioned') == update(ingestion='scatter') at a
    wide width, including invalid-window masking."""
    import jax.numpy as jnp

    from nthash_tpu.models import sketch as cms
    from nthash_tpu.u64 import U64

    wlog, rows, n = 19, 2, 600
    vals = rng.integers(0, 1 << 32, size=(n, rows), dtype=np.uint32)
    hashes = U64(jnp.zeros((n, rows), jnp.uint32), jnp.asarray(vals))
    valid = jnp.asarray(rng.integers(0, 2, size=(n,), dtype=np.int32) > 0)
    sk0 = cms.CountMinSketch.zeros(rows, wlog)
    a = cms.update(sk0, hashes, valid, wlog, ingestion="partitioned")
    b = cms.update(sk0, hashes, valid, wlog, ingestion="scatter")
    assert np.array_equal(np.asarray(a.rows), np.asarray(b.rows))


def test_sort_chunks_xla_boundary_table(rng):
    """At P > 2^9 the boundary table comes from XLA searchsorted instead
    of the fused kernel; both must implement the same definition."""
    p_log2, sub_log2 = 10, 15
    x = rng.integers(0, 1 << 25, size=(2, 2, 8, pp.LANES), dtype=np.int32)
    srt, fb = pp.sort_chunks(jnp.asarray(x), sub_log2, p_log2, interpret=True)
    exp = np.sort(x.reshape(2, 2, -1), axis=-1).reshape(x.shape)
    assert np.array_equal(np.asarray(srt), exp)
    lastq = exp[..., :, pp.LANES - 1] >> sub_log2
    fb = np.asarray(fb)
    assert fb.shape == (2, 2, 1, 1 << p_log2)
    for ri in range(2):
        for gi in range(2):
            for pi in range(0, 1 << p_log2, 37):
                assert fb[ri, gi, 0, pi] == int((lastq[ri, gi] < pi).sum())


@pytest.mark.slow
def test_windows_cover_all_partitions_huge(rng):
    """Genome-scale width: the decomposition behind count_huge/bloom_huge
    (VERDICT r3 next #1) must cover every element exactly once.
    Reconstruction is sparse (a dense 2^27 array would dominate the
    test)."""
    width_log2 = 27
    p_log2, sub_log2, *_ = pp.plan(width_log2)
    p, sub = 1 << p_log2, 1 << sub_log2
    rows = 8
    r, g = 1, 2
    width = 1 << width_log2
    idx = rng.integers(0, width, size=(r, g * rows * pp.LANES),
                       dtype=np.int32)
    chunks = pp._pad_chunks(jnp.asarray(idx), width, rows * pp.LANES)
    sorted_idx, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    assert not bool(pp.check_overflow(fb, p_log2, sorted_idx, sub_log2))
    wins = np.asarray(pp.partition_windows(
        sorted_idx, fb, p_log2, sub_log2, interpret=True))
    recovered = []
    for pi in range(p):
        local = wins[0, pi].reshape(-1)
        local = local[(local >= 0) & (local < sub)]
        recovered.append(local.astype(np.int64) + pi * sub)
    got_vals, got_counts = np.unique(
        np.concatenate(recovered), return_counts=True)
    exp_vals, exp_counts = np.unique(idx[0], return_counts=True)
    assert np.array_equal(got_vals, exp_vals)
    assert np.array_equal(got_counts, exp_counts)


def test_partitioned_recursion_orchestration(rng, monkeypatch):
    """Widths 2^28..2^30 recurse through the partitioner (sub-widths
    exceed the MXU kernel). The Pallas pieces have their own interpret
    tests; here they are swapped for vectorized jnp equivalents so the
    *orchestration* — plan, padding, sentinels, boundary tables, window
    localization, recursion, reassembly — is validated end to end as
    exact vs np.bincount at width 2^28."""
    import jax

    def fake_sort_chunks(chunks, sub_log2, p_log2=0, *, interpret=False):
        r, g, rows, lanes = chunks.shape
        srt = jnp.sort(chunks.reshape(r, g, -1), axis=-1).reshape(
            chunks.shape)
        p_pad = max(128, 1 << p_log2)
        lastq = srt[..., lanes - 1] >> sub_log2
        q = jnp.arange(p_pad, dtype=jnp.int32)
        fb = jax.vmap(jax.vmap(
            lambda a: jnp.searchsorted(a, q, side="left").astype(jnp.int32)
        ))(lastq)
        return srt, fb[:, :, None, :]

    def fake_partition_windows(sorted_idx, fb, p_log2, sub_log2, *,
                               cap_rows=pp.CAP_ROWS, interpret=False):
        r, g, rows, lanes = sorted_idx.shape
        p = 1 << p_log2

        def win(chunk, start_rows, pi):
            start = jnp.minimum(start_rows, rows - cap_rows)
            w = jax.lax.dynamic_slice(
                chunk, (start, 0), (cap_rows, lanes))
            return w - (pi << sub_log2)

        pis = jnp.arange(p, dtype=jnp.int32)
        f = jax.vmap(jax.vmap(  # over r, g
            lambda chunk, fbrow: jax.vmap(
                lambda pi: win(chunk, fbrow[0, pi], pi))(pis)
        ))
        wins = f(sorted_idx, fb[..., :max(p, 1)])  # [r, g, p, CAP, lanes]
        return wins.transpose(0, 2, 1, 3, 4)

    def fake_mxu_rows(idx, weight, width_log2, *, weight_bits=32,
                      interpret=False):
        assert weight is None and width_log2 <= 18
        r = idx.shape[0]
        width = 1 << width_log2
        flat = idx.reshape(r, -1)
        n = flat.shape[1]
        off = jnp.arange(r, dtype=jnp.int32)[:, None] * width
        # sentinel must be OOB-positive: jnp .at[] wraps negative indices
        safe = jnp.where(
            (flat >= 0) & (flat < width), flat + off, r * width)
        return (
            jnp.zeros(r * width, jnp.int32)
            .at[safe.reshape(-1)].add(1, mode="drop").reshape(r, width)
        )

    monkeypatch.setattr(pp, "sort_chunks", fake_sort_chunks)
    monkeypatch.setattr(pp, "partition_windows", fake_partition_windows)
    monkeypatch.setattr(pp, "mxu_histogram_rows", fake_mxu_rows)
    # production plans keep sub <= 2^18 (no recursion); force a shallow
    # plan (p=9 -> sub 2^19 > MXU range) so the recursion branch runs
    monkeypatch.setitem(pp._PLANS, 28, (9, 1))

    width_log2 = 28
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=(2, 3000), dtype=np.int32)
    # jit would cache/bypass the monkeypatched internals -> call the
    # undecorated function
    got = np.asarray(pp.partitioned_histogram_rows.__wrapped__(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8))
    for ri in range(2):
        vals = idx[ri][idx[ri] < width].astype(np.int64)
        pos, cnt = np.unique(vals, return_counts=True)
        assert np.array_equal(got[ri, pos], cnt.astype(np.int32))
        assert int(got[ri].astype(np.int64).sum()) == len(vals)


def test_overflow_not_tripped_by_pad_sentinels(rng):
    """Pad sentinels sort into trailing rows; they must not count against
    the last partition (that false positive silently forced the scatter
    fallback on heavily-padded inputs, e.g. the recursion's windows)."""
    width_log2 = 19
    p_log2, sub_log2, *_ = pp.plan(width_log2)
    rows = 8
    # one real row worth of data, 7 rows of padding per chunk
    idx = rng.integers(0, 1 << width_log2, size=(1, 130), dtype=np.int32)
    chunks = pp._pad_chunks(jnp.asarray(idx), 1 << width_log2,
                            rows * pp.LANES)
    srt, fb = pp.sort_chunks(chunks, sub_log2, p_log2, interpret=True)
    assert not bool(pp.check_overflow(fb, p_log2, srt, sub_log2))


@pytest.mark.slow
def test_scatter_fallback_drops_negatives(rng):
    """The skew fallback must drop negative entries, not wrap them (jnp
    .at[] wraps negative indices): the recursion feeds windows whose
    out-of-partition entries are negative."""
    width_log2 = 19
    width = 1 << width_log2
    idx = np.full((1, 2048), 123, dtype=np.int32)  # skew -> fallback
    idx[0, :300] = -rng.integers(1, width, size=300, dtype=np.int32)
    got = np.asarray(pp.partitioned_histogram_rows(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8))
    exp = np.zeros(width, np.int32)
    exp[123] = 2048 - 300
    assert np.array_equal(got[0], exp)
    words = np.asarray(pp.partitioned_bloom_words(
        jnp.asarray(idx[0]), width_log2, interpret=True, chunk_rows=8))
    exp_w = np.zeros(width // 32, np.uint32)
    exp_w[word_index(123)] = np.uint32(1) << np.uint32(bit_index(123))
    assert np.array_equal(words, exp_w)


def test_hierarchical_sort_exact(rng, monkeypatch):
    """Chunks wider than SORT_BLOCK_ROWS sort via alternating-direction
    block sorts + merge phases; the composition must equal a full sort
    (here with 8-row blocks so 64-row chunks take 3 merge rounds)."""
    monkeypatch.setattr(pp, "SORT_BLOCK_ROWS", 8)
    sub_log2 = 15
    x = rng.integers(0, 1 << 25, size=(3, 2, 64, pp.LANES), dtype=np.int32)
    srt, fb = pp.sort_chunks(jnp.asarray(x), sub_log2, 10, interpret=True)
    exp = np.sort(x.reshape(3, 2, -1), axis=-1).reshape(x.shape)
    assert np.array_equal(np.asarray(srt), exp)
    lastq = exp[..., :, pp.LANES - 1] >> sub_log2
    fb = np.asarray(fb)
    for ri in range(3):
        for gi in range(2):
            for pi in range(0, 1 << 10, 41):
                assert fb[ri, gi, 0, pi] == int((lastq[ri, gi] < pi).sum())


@pytest.mark.slow
@pytest.mark.parametrize("width_log2", [22, 25])
def test_partitioned_histogram_mid_widths_exact(rng, width_log2):
    """The deep r5 plans change (P, load factor) per width; pin exactness
    at mid widths too (small chunks keep interpret mode fast)."""
    width = 1 << width_log2
    idx = rng.integers(0, width + 1, size=(2, 2048), dtype=np.int32)
    got = np.asarray(pp.partitioned_histogram_rows(
        jnp.asarray(idx), width_log2, interpret=True, chunk_rows=8
    ))
    for ri in range(2):
        vals = idx[ri][idx[ri] < width].astype(np.int64)
        pos, cnt = np.unique(vals, return_counts=True)
        assert np.array_equal(got[ri, pos], cnt.astype(np.int32))
        assert int(got[ri].astype(np.int64).sum()) == len(vals)
