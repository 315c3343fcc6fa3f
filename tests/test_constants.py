"""Constants + scalar primitive parity with the reference definition.

Golden values cited from reference src/internal.hpp and tests/tests.cpp.
"""

import numpy as np

from nthash_tpu import constants as C


def test_seed_values():
    # reference src/internal.hpp:124-128
    assert C.SEED_A == 0x3C8BFBB395C60474
    assert C.SEED_C == 0x3193C18562A02B4C
    assert C.SEED_G == 0x20323ED082572324
    assert C.SEED_T == 0x295549F54BE24456
    assert C.SEED_N == 0


def test_srol_period():
    x = C.SEED_A
    for _ in range(C.SROL_PERIOD):
        x = C.srol1(x)
    assert x == C.SEED_A
    # 64 plain rotations would NOT return to start before 1023
    x = C.SEED_A
    for _ in range(64):
        x = C.srol1(x)
    assert x != C.SEED_A


def test_srol_d_matches_repeated_srol1():
    for seed in (C.SEED_A, C.SEED_C, C.SEED_G, C.SEED_T, 0xDEADBEEFCAFEF00D):
        x = seed
        for d in range(100):
            assert C.srol(seed, d) == x, d
            x = C.srol1(x)


def test_sror_inverts_srol():
    for d in range(70):
        v = C.srol(C.SEED_T, d)
        assert C.sror1(C.srol1(v)) == v
        assert C.sror(C.srol(v, d), d) == v


def test_srol_cycle_table():
    # MS_TAB equivalent: spot-check against reference A33R/A31L first entries
    # (reference src/internal.hpp:167-180): srol^1(SEED_A) has 33-bit part
    # 0x12b8c08e9 and 31-bit part 0x7917f764 << 33.
    v = C.srol_seed(C.CODE_A, 1)
    assert v & C.MASK33 == 0x12B8C08E9
    assert v >> 33 == 0x7917F76400000000 >> 33
    assert C.srol_seed(C.CODE_N, 500) == 0


def test_ascii_table():
    # reference SEED_TAB semantics (src/internal.hpp:130-165): upper+lower
    # ACGT valid, U/u = T (RNA), everything else invalid.
    for ch, code in [("A", 0), ("a", 0), ("C", 1), ("c", 1), ("G", 2),
                     ("g", 2), ("T", 3), ("t", 3), ("U", 3), ("u", 3)]:
        assert C.ASCII_TO_CODE[ord(ch)] == code
    for ch in "NnXx B1029.@-*":
        assert C.ASCII_TO_CODE[ord(ch)] == C.CODE_N
    assert (C.SEED_TAB_ASCII[ord("A")] == C.SEED_A)
    assert (C.SEED_TAB_ASCII[ord("u")] == C.SEED_T)


def test_extend_hashes_golden():
    # BlindNtHash("ACCAGT", h=2, k=6) init vector (SURVEY §8, from reference build)
    from nthash_tpu import oracle

    fh = oracle.forward_hash("ACCAGT")
    rh = oracle.reverse_hash("ACCAGT")
    h = C.extend_hashes(fh, rh, 6, 2)
    assert h[0] == 0xCAD4A7762B580A62
    assert h[1] == 0x074FEA558D43E636


def test_encode_ascii_roundtrip():
    codes = C.encode_ascii("ACGTNacgtuU")
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 3, 3]
