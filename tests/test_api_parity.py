"""Port of the reference's entire test suite (reference tests/tests.cpp:43-466).

All 17 blocks, exercised against both the host-oracle and the JAX engine
backends of the facade classes.
"""

import warnings

import numpy as np
import pytest

from nthash_tpu.api import BlindNtHash, BlindSeedNtHash, NtHash, SeedNtHash

ENGINES = ["oracle", "jnp"]


@pytest.mark.parametrize("engine", ENGINES)
def test_kmer_hash_values(engine):
    """tests.cpp:47-69 — golden vectors + BlindNtHash lockstep."""
    seq = "ACATGCATGCA"
    k, h = 5, 3
    golden = [
        (0x38CC00F940AEBDAE, 0xAB7E1B110E086FC6, 0x011A1818BCFDD553),
        (0x603A48C5A11C794A, 0xE66016E61816B9C4, 0xC5B13CB146996FFE),
    ]
    nth = NtHash(seq, h, k, engine=engine)
    assert nth.roll()
    blind = BlindNtHash(seq, h, k)
    for vals in golden:
        assert nth.roll()
        assert tuple(int(x) for x in nth.hashes()) == vals
        blind.roll(seq[blind.get_pos() + k])
        assert tuple(int(x) for x in blind.hashes()) == vals


@pytest.mark.parametrize("engine", ENGINES)
def test_kmer_rolling(engine):
    """tests.cpp:71-91 — window count; identical k-mers hash equal."""
    seq = "AGTCAGTC"
    nth = NtHash(seq, 3, 4, engine=engine)
    hashes = []
    while nth.roll():
        hashes.append(nth.hashes().copy())
    assert len(hashes) == len(seq) - 4 + 1
    assert np.array_equal(hashes[0], hashes[-1])


@pytest.mark.parametrize("engine", ENGINES)
def test_rolling_vs_base(engine):
    """tests.cpp:93-117 — rolled hashes equal from-scratch hashes."""
    seq = "ACGTACACTGGACTGAGTCT"
    k = len(seq) - 2
    nth = NtHash(seq, 3, k, engine=engine)
    subs = [NtHash(seq[i : i + k], nth.get_hash_num(), k, engine=engine)
            for i in range(3)]
    i = 0
    while nth.roll() and subs[i].roll():
        assert np.array_equal(nth.hashes(), subs[i].hashes())
        i += 1
    assert i == 3


@pytest.mark.parametrize("engine", ENGINES)
def test_canonical_hashing(engine):
    """tests.cpp:119-133 — seq and its reverse complement hash equal."""
    f = NtHash("ACGTACACTGGACTGAGTCT", 3, 20, engine=engine)
    r = NtHash("AGACTCAGTCCAGTGTACGT", 3, 20, engine=engine)
    assert f.roll() and r.roll()
    assert f.get_hash_num() == r.get_hash_num()
    assert np.array_equal(f.hashes(), r.hashes())


@pytest.mark.parametrize("engine", ENGINES)
def test_kmer_back_rolling(engine):
    """tests.cpp:135-157 — roll_back replays forward hashes in reverse."""
    nth = NtHash("ACTAGCTG", 3, 5, engine=engine)
    stack = []
    while nth.roll():
        stack.append(nth.hashes().copy())
    assert len(stack) == 8 - 5 + 1
    while True:
        assert np.array_equal(nth.hashes(), stack.pop())
        if not nth.roll_back():
            break
    assert not stack


@pytest.mark.parametrize("engine", ENGINES)
def test_kmer_peeking(engine):
    """tests.cpp:159-179 — peek() == peek(char) == subsequent roll()."""
    seq = "ACTGATCAG"
    k = 6
    nth = NtHash(seq, 3, k, engine=engine)
    assert nth.roll()
    for _ in range(3):
        assert nth.peek()
        h_peek = nth.hashes().copy()
        assert nth.peek(seq[nth.get_pos() + k])
        assert np.array_equal(nth.hashes(), h_peek)
        assert nth.roll()
        assert np.array_equal(nth.hashes(), h_peek)


@pytest.mark.parametrize("engine", ENGINES)
def test_skipping_ns(engine):
    """tests.cpp:181-208 — exact positions visited around an NN island."""
    seq = list("ACGTACACTGGACTGAGTCT")
    half = len(seq) // 2
    seq[half] = "N"
    seq[half + 1] = "N"
    seq = "".join(seq)
    k = (len(seq) - 2) // 2 - 1
    nth = NtHash(seq, 3, k, engine=engine)
    positions = list(range(half - k + 1)) + list(
        range(half + 2, len(seq) - k + 1)
    )
    visited = []
    while nth.roll():
        visited.append(nth.get_pos())
    assert visited == positions


@pytest.mark.parametrize("engine", ENGINES)
def test_rna(engine):
    """tests.cpp:210-226 — U hashes like T."""
    dna = NtHash("ACGTACACTGGACTGAGTCTACGG", 3, 20, engine=engine)
    rna = NtHash("ACGUACACUGGACUGAGUCUACGG", 3, 20, engine=engine)
    can_roll = True
    while can_roll:
        can_roll = dna.roll()
        can_roll &= rna.roll()
        assert np.array_equal(dna.hashes(), rna.hashes())


@pytest.mark.parametrize("engine", ENGINES)
def test_spaced_seed_hash_values(engine):
    """tests.cpp:228-248 — golden spaced-seed vectors."""
    golden = [
        (0x010BE4904AD8DE5D, 0x3E29E4F4C991628C, 0x3F35C984B13FEB20),
        (0x8200A7AA3EAF17C8, 0x344198402F4C2A9C, 0xB6423FE62E69C40C),
        (0x3CE8ADCBEAA56532, 0x162E91A4DBEDBF11, 0x53173F786A031F45),
    ]
    nth = SeedNtHash("ACATGCATGCA", ["11100111"], 3, 8, engine=engine)
    for vals in golden:
        assert nth.roll()
        assert tuple(int(x) for x in nth.hashes()) == vals


@pytest.mark.parametrize("engine", ENGINES)
def test_spaced_seeds(engine):
    """tests.cpp:250-322 — don't-care positions ignored; rolled == base;
    peek_back consistency."""
    seq = "ACGTACACTGGACTGAGTCT"
    seeds = ["111110000000011111", "111111100001111111"]
    mutants = [
        "ACGTACACTTGACTGAGTCT",
        "ACGTACACTGTACTGAGTCT",
        "ACGTACACTGCACTGAGTCT",
    ]
    k = len(seq) - 2
    assert k == len(seeds[0]) == len(seeds[1])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nth = SeedNtHash(seq, seeds, 2, k, engine=engine)
        nth_m = [SeedNtHash(m, seeds, 2, k, engine=engine) for m in mutants]
        assert nth.get_hash_num() == len(seeds) * 2
        history = []
        steps = 0
        while nth.roll():
            for m in nth_m:
                assert m.roll()
            base = SeedNtHash(seq[steps : steps + k], seeds, 2, k, engine=engine)
            bases_m = [
                SeedNtHash(m[steps : steps + k], seeds, 2, k, engine=engine)
                for m in mutants
            ]
            assert base.roll()
            for b in bases_m:
                assert b.roll()
            for i in range(nth.get_hash_num()):
                hval = nth.hashes()[i]
                for m in nth_m:
                    assert m.hashes()[i] == hval
                for b in bases_m:
                    assert b.hashes()[i] == hval
            history.append(nth.hashes().copy())
            if nth.get_pos() > 0:
                assert nth.peek_back()
                assert np.array_equal(nth.hashes(), history[-2])
                assert nth.peek_back(seq[nth.get_pos() - 1])
                assert np.array_equal(nth.hashes(), history[-2])
                nth._load(nth.get_pos())  # restore hash_arr like C++ state
            steps += 1
        for m in nth_m:
            assert not m.roll()
        assert steps == len(seq) - k + 1


@pytest.mark.parametrize("engine", ENGINES)
def test_spaced_seed_back_roll(engine):
    """tests.cpp:324-347."""
    seq, seed = "ACTAGCTG", "110011"
    nth = SeedNtHash(seq, [seed], 3, len(seed), engine=engine)
    stack = []
    while nth.roll():
        stack.append(nth.hashes().copy())
    assert len(stack) == len(seq) - len(seed) + 1
    while True:
        assert np.array_equal(nth.hashes(), stack.pop())
        if not nth.roll_back():
            break


@pytest.mark.parametrize("engine", ENGINES)
def test_canonical_spaced_seeds(engine):
    """tests.cpp:349-377 — 8 patterns on fwd vs revcomp 50-mers."""
    seq_fwd = "CACTCGGCCACACACACACACACACACCCTCACACACACAAAACGCACAC"
    seq_rev = "GTGTGCGTTTTGTGTGTGTGAGGGTGTGTGTGTGTGTGTGTGGCCGAGTG"
    seeds = [
        "11011000001100101101011000011010110100110000011011",
        "01010000101001110100111011011100101110010100001010",
        "11100000100111010111000100100011101011100100000111",
        "01111000011000111101000011000010111100011000011110",
        "00111000011000111101000011000010111100011000011100",
        "00000000000000000000000011000000000000000000000000",
        "11111111111111111111111100111111111111111111111111",
        "11111111111111111111111111111111111111111111111111",
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h1 = SeedNtHash(seq_fwd, seeds, 4, len(seeds[0]), engine=engine)
        h2 = SeedNtHash(seq_rev, seeds, 4, len(seeds[0]), engine=engine)
    can_roll = True
    while can_roll:
        can_roll = h1.roll()
        can_roll &= h2.roll()
        assert np.array_equal(h1.hashes(), h2.hashes())


@pytest.mark.parametrize("engine", ENGINES)
def test_copying_seed_nthash(engine):
    """tests.cpp:379-397."""
    seq = "AACGTGACTACTGACTAGCTAGCTAGCTGATCGT"
    seeds = ["111111111101111111111", "110111010010010111011"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h1 = SeedNtHash(seq, seeds, 4, len(seeds[0]), engine=engine)
    h2 = h1.copy()
    can_roll = True
    while can_roll:
        can_roll = h1.roll()
        can_roll &= h2.roll()
        assert np.array_equal(h1.hashes(), h2.hashes())


@pytest.mark.parametrize("engine", ENGINES)
def test_blind_seed_nthash(engine):
    """tests.cpp:399-413 — BlindSeedNtHash == SeedNtHash fed base-by-base."""
    seq = "ATGCTAGTAGCTGAC"
    seeds = ["110011", "101101"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h1 = SeedNtHash(seq, seeds, 3, len(seeds[0]), engine=engine)
        assert h1.roll()
        h2 = BlindSeedNtHash(seq, seeds, 3, len(seeds[0]))
    while h1.roll():
        h2.roll(seq[h2.get_pos() + len(seeds[0])])
        assert np.array_equal(h1.hashes(), h2.hashes())


def test_blind_seed_nthash_roll_back():
    """tests.cpp:415-426."""
    kmer = "ACCAGT"
    seeds = ["110011", "101101"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h = BlindSeedNtHash(kmer, seeds, 3, len(seeds[0]))
    hashes1 = h.hashes().copy()
    h.roll("A")
    h.roll_back("A")
    # NOTE: tests.cpp:421-425 compares hashes after roll('A') to hashes after
    # roll_back('A') — but the C++ `hashes1` is a *pointer* into the object's
    # hash_arr, so the reference's assert trivially compares the array with
    # itself. The meaningful property (verified in SURVEY §8 empirically) is
    # that roll then roll_back restores the original window's hashes:
    assert np.array_equal(h.hashes(), hashes1)


def test_blind_seed_nthash_copy():
    """tests.cpp:428-445."""
    seq = "ATGCTAGTAGCTGAC"
    seeds = ["110011", "101101"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h1 = BlindSeedNtHash(seq, seeds, 1, len(seeds[0]))
    h1.roll("A")
    h1.roll("C")
    h2 = h1.copy()
    assert np.array_equal(h1.hashes(), h2.hashes())
    for ch in "GT":
        h1.roll(ch)
        h2.roll(ch)
        assert np.array_equal(h1.hashes(), h2.hashes())


@pytest.mark.parametrize("engine", ENGINES)
def test_kmer_vs_full_care_seed(engine):
    """tests.cpp:447-463 — seed '11111' == plain NtHash."""
    seq = "ATGCTAGTAGCTGAC"
    k, h = 5, 3
    kmer = NtHash(seq, h, k, engine=engine)
    seed = SeedNtHash(seq, ["11111"], h, k, engine=engine)
    can_roll = True
    while can_roll:
        can_roll = kmer.roll()
        can_roll |= seed.roll()
        assert np.array_equal(kmer.hashes(), seed.hashes())


# -- additional parity coverage beyond the reference suite -----------------

def test_ctor_errors():
    with pytest.raises(ValueError, match="k must be greater than 0"):
        NtHash("ACGT", 1, 0)
    with pytest.raises(ValueError, match="smaller than k"):
        NtHash("ACGT", 1, 5)
    with pytest.raises(ValueError, match="passed position"):
        NtHash("ACGTACGT", 1, 4, pos=5)
    with pytest.raises(ValueError, match="not equal to k"):
        SeedNtHash("ACGTACGT", ["111"], 1, 4)


def test_seed_asymmetry_warns():
    with pytest.warns(UserWarning, match="not symmetric"):
        SeedNtHash("ACGTACGT", ["1101"], 1, 4)


def test_seed_quirk_n_in_first_window():
    """SURVEY §8 quirk vectors: SeedNtHash hashes through an N at init."""
    seq = "ANCATGCATGCA"
    s = SeedNtHash(seq, ["11111"], 1, 5)
    assert s.roll()
    assert s.get_pos() == 0
    assert int(s.hashes()[0]) == 0x8A3A49D6F85B53FF
    n = NtHash(seq, 1, 5)
    assert n.roll()
    assert n.get_pos() == 2
    assert int(n.hashes()[0]) == 0x38CC00F940AEBDAE


def test_parsed_seed_ctor():
    """Legacy btllib interface: parsed don't-care lists (seed.cpp:473-491)."""
    from nthash_tpu.api import parse_seeds

    seq = "ACGTACACTGGACTGAGTCT"
    patterns = ["110011", "101101"]
    parsed = parse_seeds(patterns)
    assert parsed == [[2, 3], [1, 4]]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = SeedNtHash(seq, patterns, 2, 6)
    b = SeedNtHash(seq, parsed, 2, 6)
    while a.roll():
        assert b.roll()
        assert np.array_equal(a.hashes(), b.hashes())


def test_blind_nthash_survey_vectors():
    """SURVEY §8 BlindNtHash golden: init, roll, roll_back restore."""
    h = BlindNtHash("ACCAGTGCATA", 2, 6)
    assert tuple(int(x) for x in h.hashes()) == (
        0xCAD4A7762B580A62, 0x074FEA558D43E636)
    h.roll("G")
    assert tuple(int(x) for x in h.hashes()) == (
        0xF0A68649810CDA6C, 0x3AF339FADE1F0C8C)
    assert h.get_pos() == 1
    h.roll_back("A")
    assert tuple(int(x) for x in h.hashes()) == (
        0xCAD4A7762B580A62, 0x074FEA558D43E636)
    assert h.get_pos() == 0


def test_nthash_roll_back_through_n():
    """roll_back N-jump branch (kmer.cpp:275-283).

    Faithfully replicated reference quirk: rolling back onto an N jumps back
    k and re-inits *forward*, which lands back on the position right of the
    N island — so roll_back never crosses an island (it keeps returning the
    same position). Verify the visited positions are valid with correct
    hashes, and that the island pin-in behavior matches.
    """
    seq = "ACGTANCGTACGTACG"
    nth = NtHash(seq, 2, 4)
    while nth.roll():
        pass
    from nthash_tpu import oracle

    _, _, hashes, valid = oracle.hash_all_windows(seq, 4, 2)
    seen = []
    for _ in range(20):
        if not nth.roll_back():
            break
        p = nth.get_pos()
        assert valid[p]
        assert np.array_equal(nth.hashes(), hashes[p])
        seen.append(p)
    # walked back to the island edge (pos 6), then pinned there
    assert seen[:7] == [11, 10, 9, 8, 7, 6, 6]
    assert all(p == 6 for p in seen[6:])


def test_seed_strict_n_init_flag():
    # quirk fixed behind a flag: strict init skips N windows like NtHash
    from nthash_tpu import NtHash, SeedNtHash

    seq = "ANCATGCATGCA"
    strict = SeedNtHash(seq, ["11111"], 1, 5, strict_n_init=True)
    assert strict.roll()
    assert strict.get_pos() == 2  # first N-free window, like NtHash
    ref = NtHash(seq, 1, 5)
    assert ref.roll()
    assert strict.get_pos() == ref.get_pos()
    assert strict.hashes()[0] == ref.hashes()[0]
    # default keeps the reference quirk
    quirky = SeedNtHash(seq, ["11111"], 1, 5)
    assert quirky.roll() and quirky.get_pos() == 0


def test_blind_seed_roll_is_two_tap_not_rehash(monkeypatch):
    """BlindSeedNtHash.roll/roll_back must use the O(#care-runs) two-tap
    update (reference src/seed.cpp:701-737 rolls in O(#blocks)), never a
    full O(k*S) window rehash (VERDICT r1 missing #3)."""
    seq = "ACCAGTGCATACGT"
    seeds = ("11010011", "11111111")
    h = BlindSeedNtHash(seq, seeds, 2, 8)

    def boom(*a, **k):
        raise AssertionError("roll must not rehash the window")

    monkeypatch.setattr(h, "_rehash", boom)
    ref = SeedNtHash(seq, seeds, 2, 8)
    assert ref.roll() and ref.roll()
    h.roll(seq[8])
    np.testing.assert_array_equal(h.hashes(), ref.hashes())
    h.roll_back(seq[0])
    ref2 = SeedNtHash(seq, seeds, 2, 8)
    assert ref2.roll()
    np.testing.assert_array_equal(h.hashes(), ref2.hashes())
    # per-roll work is bounded by the number of care runs, not k
    assert sum(len(t) for t in h._taps) == 3 + 1


def test_facade_tiled_memory_bound(rng):
    """The stored-sequence facade hashes on-demand tiles with at most two
    resident — O(tile), not O(L), host memory (VERDICT r3 missing #1;
    the reference rolls in O(k), kmer.cpp:246-264). Rolled values across
    tile boundaries are bit-identical to the whole-table oracle."""
    from nthash_tpu import oracle

    from nthash_tpu.constants import encode_ascii

    bases = np.frombuffer(b"ACGTN", np.uint8)
    seq = bases[rng.integers(0, 5, size=2000)].tobytes().decode()
    k, h, tile = 7, 2, 64
    nth = NtHash(seq, h, k, tile_windows=tile)
    _, _, expect, valid = oracle.hash_all_windows(encode_ascii(seq), k, h)
    seen = []
    while nth.roll():
        seen.append((nth.get_pos(), nth.hashes().copy()))
        assert nth._table.resident_windows() <= 2 * tile
    expect_pos = [p for p in range(len(valid)) if valid[p]]
    # facade N-skip semantics: only valid windows are visited, but the
    # *first* valid window after a skip may jump (reference parity is
    # covered by test_skipping_ns); here every visited pos must be valid
    # and carry the oracle's hashes
    for pos, hashes in seen:
        assert valid[pos]
        np.testing.assert_array_equal(hashes, expect[pos])
    assert [p for p, _ in seen] == expect_pos


def test_facade_tile_boundary_roll_back(rng):
    """roll_back across a tile boundary reloads the previous tile."""
    seq = "".join("ACGT"[i % 4] for i in range(300))
    k, tile = 5, 32
    a = NtHash(seq, 1, k, tile_windows=tile)
    b = NtHash(seq, 1, k)  # default tile covers everything
    for _ in range(tile + 3):
        assert a.roll() and b.roll()
        assert a.hashes()[0] == b.hashes()[0]
    for _ in range(10):
        assert a.roll_back() and b.roll_back()
        assert a.hashes()[0] == b.hashes()[0] and a.get_pos() == b.get_pos()


def test_seed_facade_tiled(rng):
    from nthash_tpu import oracle
    from nthash_tpu.constants import encode_ascii

    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, size=500)].tobytes().decode()
    seeds = ("110011", "111111")
    tile = 48
    snth = SeedNtHash(seq, seeds, 2, 6, tile_windows=tile)
    _, _, expect = oracle.hash_all_windows_seeds(encode_ascii(seq), seeds, 2)
    pos = 0
    while snth.roll():
        np.testing.assert_array_equal(snth.hashes(), expect[snth.get_pos()])
        assert snth._table.resident_windows() <= 2 * tile
        pos += 1
    assert pos == len(seq) - 6 + 1


def test_seed_peek_is_state_roll_not_rehash(monkeypatch):
    """SeedNtHash.peek/peek_back must roll from carried state in
    O(#care-runs) (reference seed.cpp:577-667 is O(#blocks)), never an
    O(k*S) window rehash (VERDICT r3 missing #2)."""
    from nthash_tpu import oracle as oracle_mod

    seq = "ACCAGTGCATACGTAG"
    seeds = ("11010011", "11111111")
    snth = SeedNtHash(seq, seeds, 2, 8)
    assert snth.roll()
    expect_next = SeedNtHash(seq, seeds, 2, 8)
    assert expect_next.roll() and expect_next.roll()
    snth2 = SeedNtHash(seq, seeds, 2, 8)
    assert snth2.roll() and snth2.roll()
    cur = SeedNtHash(seq, seeds, 2, 8)
    assert cur.roll()

    def boom(*a, **k):
        raise AssertionError("peek must not rehash the window")

    monkeypatch.setattr(oracle_mod, "seed_forward_hash", boom)
    monkeypatch.setattr(oracle_mod, "seed_reverse_hash", boom)
    assert snth.peek()
    np.testing.assert_array_equal(snth.hashes(), expect_next.hashes())
    assert snth.get_pos() == 0  # state unchanged
    assert snth2.peek_back()  # peek_back from pos=1
    np.testing.assert_array_equal(snth2.hashes(), cur.hashes())


def test_facade_100mbp_memory_envelope():
    """VERDICT r3 #2 'done' criterion: a 100-Mbp NtHash walk peaks well
    under 1 GB host RSS with oracle-identical hashes. Subprocess-isolated
    so the RSS high-water mark is this workload's, not the suite's."""
    import subprocess
    import sys

    script = r"""
import os, resource
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from nthash_tpu.api import NtHash
from nthash_tpu import oracle

def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

base = rss_mb()  # post-import baseline (inflated under parallel load)
L, k, tile = 100_000_000, 32, 1 << 20
rng = np.random.default_rng(7)
codes = rng.integers(0, 4, size=L, dtype=np.uint8)
start = tile - 3  # about to cross the first tile boundary
nth = NtHash(codes, 2, k, pos=start, tile_windows=tile)
got = []
for _ in range(6):
    assert nth.roll()
    got.append((nth.get_pos(), nth.hashes().copy()))
assert nth._table.resident_windows() <= 2 * tile
_, _, expect, _ = oracle.hash_all_windows(
    codes[start : start + 6 + k], k, 2)
for i, (pos, h) in enumerate(got):
    assert pos == start + i
    assert np.array_equal(h, expect[i]), (pos, h, expect[i])
peak = rss_mb()
# the walk itself (codes 100 MB + <=2 resident tiles + engine transients)
# must stay in the O(tile) envelope; the absolute <1 GB criterion holds
# whenever the interpreter baseline is not load-inflated
growth = peak - base
assert growth < 500, f"walk grew RSS by {growth:.0f} MB (base {base:.0f})"
if base < 500:
    assert peak < 1024, f"RSS {peak:.0f} MB >= 1 GB (base {base:.0f})"
print(f"OK rss={peak:.0f}MB base={base:.0f}MB")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_facade_tiled_device_engine(rng):
    """Tiles at/above the device threshold hash via the jnp engine per
    tile; rolled values across a tile boundary must match the oracle."""
    from nthash_tpu import oracle

    codes = rng.integers(0, 5, size=10_000, dtype=np.uint8)
    k, h, tile = 9, 2, 4096
    start = tile - 5
    nth = NtHash(codes, h, k, pos=start, tile_windows=tile, engine="jnp")
    _, _, expect, valid = oracle.hash_all_windows(codes, k, h)
    for _ in range(12):
        if not nth.roll():
            break
        p = nth.get_pos()
        assert valid[p]
        np.testing.assert_array_equal(nth.hashes(), expect[p])
    assert nth.get_pos() > tile  # crossed the boundary
    assert nth._table.resident_windows() <= 2 * tile


def test_facade_tiled_n_skip_across_boundary():
    """N-islands adjacent to a tile boundary: roll and roll_back must
    reproduce the default-tile (single-table) facade exactly."""
    seq = list("ACGT" * 40)
    # N island straddling the windows around the tile-32 boundary
    seq[33] = "N"
    seq[34] = "N"
    seq = "".join(seq)
    k, tile = 6, 32
    a = NtHash(seq, 2, k, tile_windows=tile)
    b = NtHash(seq, 2, k)
    fwd_pos = []
    while True:
        ra, rb = a.roll(), b.roll()
        assert ra == rb
        if not ra:
            break
        assert a.get_pos() == b.get_pos()
        np.testing.assert_array_equal(a.hashes(), b.hashes())
        fwd_pos.append(a.get_pos())
    assert any(p > 34 for p in fwd_pos) and any(p < 28 for p in fwd_pos)
    # roll_back across the island bounces off the re-init scan (reference
    # semantics: pos -= k then a FORWARD init scan) — step a bounded
    # number of times and require lockstep, not termination
    for _ in range(3 * len(seq)):
        ra, rb = a.roll_back(), b.roll_back()
        assert ra == rb
        if not ra:
            break
        assert a.get_pos() == b.get_pos()
        np.testing.assert_array_equal(a.hashes(), b.hashes())


def test_iter_bulk_matches_roll_lockstep():
    """__iter__ streams from the resident tile with lazy state sync; it
    must match the per-call roll() trace exactly — positions, hashes,
    fwd/rev — across N islands and tile boundaries, and object state
    must be correct immediately after an early break (VERDICT r4 next
    #3: the bulk path must not trade away roll() semantics)."""
    import numpy as np

    from nthash_tpu.api import NtHash

    rng = np.random.default_rng(77)
    seq = list("".join(np.array(list("ACGT"))[rng.integers(0, 4, 5000)]))
    for i in (100, 101, 400, 2000, 2001, 2002, 4900):
        seq[i] = "N"
    seq = "".join(seq)

    a = NtHash(seq, 2, 17, tile_windows=1024)
    ref = []
    while a.roll():
        ref.append((a.get_pos(), a.hashes().copy(),
                    a.get_forward_hash(), a.get_reverse_hash()))

    b = NtHash(seq, 2, 17, tile_windows=1024)
    got = [(b.get_pos(), row.copy(), b.get_forward_hash(),
            b.get_reverse_hash()) for row in b]
    assert len(ref) == len(got)
    for (p1, h1, f1, r1), (p2, h2, f2, r2) in zip(ref, got):
        assert p1 == p2 and f1 == f2 and r1 == r2
        assert np.array_equal(h1, h2)
    # iterator exhaustion leaves state at the last valid window
    assert b.get_pos() == ref[-1][0]

    # early break at a tile boundary: state is the broken-at step, and a
    # subsequent roll() resumes the exact roll() trace
    for stop_at in (1, 1024, 1025, 3000):
        c = NtHash(seq, 2, 17, tile_windows=1024)
        n = 0
        for _ in c:
            n += 1
            if n == stop_at:
                break
        assert c.get_pos() == ref[stop_at - 1][0]
        assert np.array_equal(c.hashes(), ref[stop_at - 1][1])
        assert c.get_forward_hash() == ref[stop_at - 1][2]
        assert c.roll()
        assert c.get_pos() == ref[stop_at][0]
        assert np.array_equal(c.hashes(), ref[stop_at][1])


def test_seed_iter_bulk_matches_roll_lockstep():
    """SeedNtHash.__iter__ bulk path must replay roll()'s exact visit
    sequence — including the reference's N quirk jumps (incoming N at
    codes[pos+k] jumps to pos+k, which init accepts unconditionally,
    reference seed.cpp:151/518-544) — in both quirk and strict_n_init
    modes, across tile boundaries, with correct state after a break."""
    import numpy as np

    from nthash_tpu.api import SeedNtHash

    rng = np.random.default_rng(99)
    seq = list("".join(np.array(list("ACGT"))[rng.integers(0, 4, 4000)]))
    for i in (50, 51, 300, 1500, 1501, 1502, 1510, 3900):
        seq[i] = "N"
    seq = "".join(seq)
    seeds = ("110011", "101101")

    for strict in (False, True):
        a = SeedNtHash(seq, seeds, 2, 6, strict_n_init=strict,
                       tile_windows=512)
        ref = []
        while a.roll():
            ref.append((a.get_pos(), a.hashes().copy()))
        b = SeedNtHash(seq, seeds, 2, 6, strict_n_init=strict,
                       tile_windows=512)
        got = [(b.get_pos(), row.copy()) for row in b]
        assert len(ref) == len(got), (strict, len(ref), len(got))
        for (p1, h1), (p2, h2) in zip(ref, got):
            assert p1 == p2
            assert np.array_equal(h1, h2)
        assert b.get_pos() == ref[-1][0]
        # break mid-iteration: state + peek parity with the roll() trace
        c = SeedNtHash(seq, seeds, 2, 6, strict_n_init=strict,
                       tile_windows=512)
        n = 0
        for _ in c:
            n += 1
            if n == 700:
                break
        assert c.get_pos() == ref[699][0]
        assert np.array_equal(c.hashes(), ref[699][1])
        assert c.roll()
        assert c.get_pos() == ref[700][0]
        assert np.array_equal(c.hashes(), ref[700][1])


def test_iter_bulk_fuzz_random_n_patterns():
    """Fuzz the bulk iterators against the per-call roll() walk on random
    N densities (incl. N in the first window, trailing Ns, and islands
    crossing tile boundaries), both facade classes, both seed modes."""
    import numpy as np

    from nthash_tpu.api import NtHash, SeedNtHash

    rng = np.random.default_rng(2024)
    bases = np.array(list("ACGTN"))
    for trial in range(6):
        n_frac = [0.0, 0.02, 0.15][trial % 3]
        probs = [(1 - n_frac) / 4] * 4 + [n_frac]
        seq = "".join(bases[rng.choice(5, size=1200, p=probs)])
        k = int(rng.integers(4, 12))

        a = NtHash(seq, 2, k, tile_windows=256)
        ref = []
        while a.roll():
            ref.append((a.get_pos(), a.hashes().copy()))
        b = NtHash(seq, 2, k, tile_windows=256)
        got = [(b.get_pos(), r.copy()) for r in b]
        assert [p for p, _ in ref] == [p for p, _ in got], (trial, k)
        for (p1, h1), (_, h2) in zip(ref, got):
            assert np.array_equal(h1, h2), (trial, k, p1)

        seeds = ("1011", "1101") if k >= 4 else ("11",)
        seeds = tuple(s[:k].ljust(k, "1") for s in seeds)
        for strict in (False, True):
            c = SeedNtHash(seq, seeds, 1, k, strict_n_init=strict,
                           tile_windows=256)
            refs = []
            while c.roll():
                refs.append((c.get_pos(), c.hashes().copy()))
            d = SeedNtHash(seq, seeds, 1, k, strict_n_init=strict,
                           tile_windows=256)
            gots = [(d.get_pos(), r.copy()) for r in d]
            assert [p for p, _ in refs] == [p for p, _ in gots], (
                trial, k, strict)
            for (p1, h1), (_, h2) in zip(refs, gots):
                assert np.array_equal(h1, h2), (trial, k, strict, p1)


def test_blind_mixed_walk_fuzz_vs_oracle():
    """Random roll/roll_back/peek/peek_back walks must keep BlindNtHash's
    inlined tap-table state bit-exact vs the oracle recomputed from the
    window at every step (guards the hand-inlined split-rotates)."""
    import numpy as np

    from nthash_tpu import oracle
    from nthash_tpu.api import BlindNtHash
    from nthash_tpu.constants import extend_hashes

    rng = np.random.default_rng(31337)
    for k in (2, 5, 31, 64, 65):
        seq0 = rng.integers(0, 4, size=k, dtype=np.uint8)
        b = BlindNtHash(seq0, 3, k)
        window = list(int(c) for c in seq0)
        for step in range(300):
            op = rng.integers(0, 4)
            c = int(rng.integers(0, 4))
            if op == 0:
                b.roll(c)
                window.pop(0)
                window.append(c)
            elif op == 1:
                b.roll_back(c)
                window.pop()
                window.insert(0, c)
            elif op == 2:
                b.peek(c)
                w2 = window[1:] + [c]
                f = oracle.forward_hash(np.array(w2, np.uint8), k)
                r = oracle.reverse_hash(np.array(w2, np.uint8), k)
                assert np.array_equal(
                    b.hashes(), np.array(extend_hashes(f, r, k, 3),
                                         np.uint64)), (k, step)
                continue
            else:
                b.peek_back(c)
                w2 = [c] + window[:-1]
                f = oracle.forward_hash(np.array(w2, np.uint8), k)
                r = oracle.reverse_hash(np.array(w2, np.uint8), k)
                assert np.array_equal(
                    b.hashes(), np.array(extend_hashes(f, r, k, 3),
                                         np.uint64)), (k, step)
                continue
            f = oracle.forward_hash(np.array(window, np.uint8), k)
            r = oracle.reverse_hash(np.array(window, np.uint8), k)
            assert b.get_forward_hash() == f, (k, step)
            assert b.get_reverse_hash() == r, (k, step)
            assert np.array_equal(
                b.hashes(),
                np.array(extend_hashes(f, r, k, 3), np.uint64)), (k, step)


def test_blind_seed_mixed_walk_fuzz_vs_oracle():
    """Random roll/roll_back walks of BlindSeedNtHash must stay bit-exact
    vs the oracle's from-scratch spaced-seed hash of the current window
    (guards the two-tap care-run rolling algebra under long walks)."""
    import numpy as np

    from nthash_tpu import oracle
    from nthash_tpu.api import BlindSeedNtHash
    from nthash_tpu.constants import extend_hashes

    rng = np.random.default_rng(4242)
    seeds = ("1011", "1101")
    k = 4
    care = [[i for i, ch in enumerate(s) if ch == "1"] for s in seeds]
    seq0 = rng.integers(0, 4, size=k, dtype=np.uint8)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        b = BlindSeedNtHash(seq0, seeds, 2, k)
    window = list(int(c) for c in seq0)
    for step in range(400):
        c = int(rng.integers(0, 4))
        if rng.integers(0, 2) == 0:
            b.roll(c)
            window.pop(0)
            window.append(c)
        else:
            b.roll_back(c)
            window.pop()
            window.insert(0, c)
        wa = np.array(window, np.uint8)
        exp = []
        for pos_list in care:
            f = oracle.seed_forward_hash(wa, k, pos_list)
            r = oracle.seed_reverse_hash(wa, k, pos_list)
            exp.extend(extend_hashes(f, r, k, 2))
        assert np.array_equal(b.hashes(), np.array(exp, np.uint64)), step


def test_iter_bulk_tiny_k_and_start_pos():
    """Bulk iterators at k=1/k=2 (every-base windows) and with a nonzero
    constructor start position must replay roll() exactly."""
    import numpy as np

    from nthash_tpu.api import NtHash, SeedNtHash

    rng = np.random.default_rng(11)
    seq = list("".join(np.array(list("ACGT"))[rng.integers(0, 4, 600)]))
    for i in (0, 5, 300, 599):
        seq[i] = "N"
    seq = "".join(seq)
    for k in (1, 2):
        for pos in (0, 7, 250):
            a = NtHash(seq, 2, k, pos, tile_windows=128)
            ref = []
            while a.roll():
                ref.append((a.get_pos(), a.hashes().copy()))
            b = NtHash(seq, 2, k, pos, tile_windows=128)
            got = [(b.get_pos(), r.copy()) for r in b]
            assert [p for p, _ in ref] == [p for p, _ in got], (k, pos)
            for (_, h1), (_, h2) in zip(ref, got):
                assert np.array_equal(h1, h2)
    # spaced seeds from a mid-sequence start, both modes
    for strict in (False, True):
        c = SeedNtHash(seq, ("101",), 2, 3, 100, strict_n_init=strict,
                       tile_windows=128)
        ref = []
        while c.roll():
            ref.append((c.get_pos(), c.hashes().copy()))
        d = SeedNtHash(seq, ("101",), 2, 3, 100, strict_n_init=strict,
                       tile_windows=128)
        got = [(d.get_pos(), r.copy()) for r in d]
        assert [p for p, _ in ref] == [p for p, _ in got], strict
        for (_, h1), (_, h2) in zip(ref, got):
            assert np.array_equal(h1, h2)
