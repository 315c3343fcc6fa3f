"""Golden hash-vector parity: oracle and jnp engine vs reference-built vectors.

Vectors captured from a build of the reference library (SURVEY.md §8) and
from reference tests/tests.cpp:54-57, 236-240.
"""

import numpy as np
import pytest

from nthash_tpu import oracle
from nthash_tpu.constants import encode_ascii
from nthash_tpu.ops.kmer_jnp import hash_kmers

README_SEQ = "TGACTGATCGAGTCGTACTAG"

# (pos, fwd, rev, canonical) for NtHash(README_SEQ, h=1, k=5) — SURVEY §8
README_K5 = [
    (0, 0x2C984DF375275F54, 0x33D712CF31D61DD9, 0x606F60C2A6FD7D2D),
    (1, 0x53AB9BBF14511759, 0x1E926CF9780AB81D, 0x723E08B88C5BCF76),
    (2, 0x9D9B16C7F7804E4F, 0x82D449FBB3710CC2, 0x206F60C3AAF15B11),
    (3, 0x831C12341C225650, 0x1D7F3B212029E306, 0xA09B4D553C4C3956),
    (4, 0x05D3D5630EE1EE7A, 0x1D856FFCF44D5255, 0x23594560032F40CF),
    (5, 0x013CAA9FE3DC7505, 0x89BB52619AC71FDB, 0x8AF7FD017EA394E0),
    (6, 0x38B57486189A8AF7, 0xC940D6B7C217DF21, 0x01F64B3DDAB26A18),
    (7, 0xC027A1920BA2B853, 0xE936D7E76EF87970, 0xA95E79797A9B31C3),
    (8, 0x83B3345820EFBE24, 0xA2612D0D21FF79CE, 0x2614616542EF37F2),
    (9, 0x048D99BB777A3E92, 0x420A64EAF4A61F31, 0x4697FEA66C205DC3),
    (10, 0x2F6ED7AC26473A89, 0xA0F0CAF1E101AEF5, 0xD05FA29E0748E97E),
    (11, 0xE6F790E3BFACBFDD, 0x8C6D7AA40911B21D, 0x73650B87C8BE71FA),
    (12, 0xF723007CA07B1F47, 0xCBABC2D50BFC89C2, 0xC2CEC351AC77A909),
    (13, 0xF57CFFF55E1E9F16, 0xF8B3F1B66A6F749F, 0xEE30F1ABC88E13B5),
    (14, 0xF1D48693A3DA13ED, 0x24FF5C94287C6C91, 0x16D3E327CC56807E),
    (15, 0xD9652C9C98964727, 0x9FE2D1CD1B4A6684, 0x7947FE69B3E0ADAB),
    (16, 0xB8515960CF3327BE, 0xC8888D786D4485B3, 0x80D9E6D93C77AD71),
]

# NtHash("ACATGCATGCA", h=3, k=5) windows 1..2 — reference tests.cpp:54-57
ACATG_VECTORS = [
    (1, (0x38CC00F940AEBDAE, 0xAB7E1B110E086FC6, 0x011A1818BCFDD553)),
    (2, (0x603A48C5A11C794A, 0xE66016E61816B9C4, 0xC5B13CB146996FFE)),
]

# SeedNtHash("ACATGCATGCA", {"11100111"}, h=3) — reference tests.cpp:236-240
SEED_VECTORS = [
    (0, (0x010BE4904AD8DE5D, 0x3E29E4F4C991628C, 0x3F35C984B13FEB20)),
    (1, (0x8200A7AA3EAF17C8, 0x344198402F4C2A9C, 0xB6423FE62E69C40C)),
    (2, (0x3CE8ADCBEAA56532, 0x162E91A4DBEDBF11, 0x53173F786A031F45)),
]

# SeedNtHash(README_SEQ, {"10101","11011"}, h=3) — SURVEY §8
SEED2_VECTORS = [
    (0, (0x9F8F9FBF890D6351, 0x49E4088860AA19F8, 0x6B35294FA7A7F7B8,
         0x7539D859409E5B0A, 0xA39849FCE36E6ECC, 0x43EAC0D4B3D45959)),
    (1, (0x8DC5F8486FA3CF68, 0x80639943016BBB59, 0xD711B0635C1B2C37,
         0x343F35681027EEF7, 0x3F700FD7CC6B8E01, 0xA2B26F83A7BF55DE)),
    (2, (0x9F8F9FBF890D6351, 0x49E4088860AA19F8, 0x6B35294FA7A7F7B8,
         0xA9C9D84ABC727C26, 0x57FCA27B852A659D, 0x5A9F199A16858568)),
]


def test_oracle_readme_k5():
    fwd, rev, hashes, valid = oracle.hash_all_windows(README_SEQ, 5, 1)
    for pos, f, r, c in README_K5:
        assert fwd[pos] == f
        assert rev[pos] == r
        assert hashes[pos][0] == c
        assert valid[pos]


def test_engine_readme_k5():
    res = hash_kmers(encode_ascii(README_SEQ), 5, 1)
    fwd, rev, hashes = res.fwd.to_np(), res.rev.to_np(), res.hashes.to_np()
    for pos, f, r, c in README_K5:
        assert fwd[pos] == f
        assert rev[pos] == r
        assert hashes[pos][0] == c


def test_oracle_acatg_multihash():
    _, _, hashes, _ = oracle.hash_all_windows("ACATGCATGCA", 5, 3)
    for pos, vals in ACATG_VECTORS:
        assert tuple(int(x) for x in hashes[pos]) == vals


def test_engine_acatg_multihash():
    res = hash_kmers(encode_ascii("ACATGCATGCA"), 5, 3)
    h = res.hashes.to_np()
    for pos, vals in ACATG_VECTORS:
        assert tuple(int(x) for x in h[pos]) == vals


def test_oracle_spaced_seed_golden():
    _, _, hashes = oracle.hash_all_windows_seeds("ACATGCATGCA", ["11100111"], 3)
    for pos, vals in SEED_VECTORS:
        assert tuple(int(x) for x in hashes[pos]) == vals


def test_oracle_two_seed_golden():
    _, _, hashes = oracle.hash_all_windows_seeds(README_SEQ, ["10101", "11011"], 3)
    for pos, vals in SEED2_VECTORS:
        assert tuple(int(x) for x in hashes[pos]) == vals


def test_seed_quirk_vectors():
    # SURVEY §8 behavioral quirk: SeedNtHash("ANCATGCATGCA", {"11111"}, 1, 5)
    # hashes at pos=0 with N contributing zero; NtHash skips to pos=2.
    seq = "ANCATGCATGCA"
    _, _, hashes = oracle.hash_all_windows_seeds(seq, ["11111"], 1)
    assert hashes[0][0] == 0x8A3A49D6F85B53FF
    assert oracle.seed_nthash_positions(encode_ascii(seq), 5)[0] == 0
    assert oracle.nthash_positions(encode_ascii(seq), 5)[0] == 2
    _, _, kh, valid = oracle.hash_all_windows(seq, 5, 1)
    assert kh[2][0] == 0x38CC00F940AEBDAE  # CATGC golden (tests.cpp:55)
    assert not valid[0] and not valid[1] and valid[2]
