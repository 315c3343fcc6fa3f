"""Extended golden vectors captured from the reference build at larger k.

The reference's own test vectors stop at k=5/6 (tests/tests.cpp:54-57,
236-240). These were generated in this environment by linking against the
freshly built reference (g++ -O3): NtHash k=32 h=2 over an N-containing
80-mer, NtHash k=65 h=3 (beyond the 64-bit rotate period — exercises the
33|31 split-rotate exactly where a plain rot64 would collide), an 18-wide
two-seed SeedNtHash, and a BlindNtHash k=33 walk.
"""

import numpy as np
import pytest

from nthash_tpu import BlindNtHash, NtHash, SeedNtHash
from nthash_tpu.constants import encode_ascii
from nthash_tpu.ops.kmer_jnp import hash_kmers
from nthash_tpu.ops.seed_jnp import hash_kmers_seeds

SEQ_N = (
    "GATTACAGATTACACCTTGGAACCNGGTTCCAAGGTTCCAAGG"
    "ACGTACGTACGTAGCTAGCTAGCTAGGCCATGCATGG"
)
SEQ = SEQ_N.replace("N", "T")

# (pos, fwd, rev, hash0, hash1) — first 5 valid k=32 windows (N at 24 forces
# the first valid window to pos 25)
K32H2 = [
    (25, 0xCAEBE38E7909F08A, 0x9F84200A639B7053, 0x6A700398DCA560DD, 0xF9A3181AD954FBA0),
    (26, 0xE4207B3BD1985BCA, 0xF739CE17A0086546, 0xDB5A495371A0C110, 0x08367150FE5DDF2F),
    (27, 0xA171C222A9F96251, 0xDFDEFC7A0425A618, 0x8150BE9CAE1F0869, 0x1FD929DC8CE3C247),
    (28, 0x2CC2EC1C63C5E2FD, 0x58FFCA119A094023, 0x85C2B62DFDCF2320, 0xF6F0BF8263AB38B7),
    (29, 0x2B1D7500E02DC4F5, 0x83A9D9555F4FA8F8, 0xAEC74E563F7D6DED, 0xBAD1D1CF6AB0072B),
]

# (pos, hash0, hash1, hash2, fwd) on the N-free sequence
K65H3 = [
    (0, 0x571516A5C657DC79, 0x64B624242C288B34, 0x5F76E03C89387E54, 0x7C0080B5922DBD7F),
    (1, 0xBD8E87E893A19233, 0x8A86FE30A9565ABE, 0x51DB666205C82AEF, 0xC803366E07D0C021),
    (2, 0x794DDB481409906D, 0x5C99BA3F38F342CA, 0xF0B0284279A25895, 0x5D0CF8B98EA0C62E),
]

SEEDS18 = ("110100110011001011", "111111000000111111")
# (pos, s0h0, s0h1, s1h0, s1h1) on SEQ_N (quirk: N hashes as zero seed)
SEED18 = [
    (0, 0x598ABFC133B99142, 0xC1ABAFAF1EADE78F, 0xE895A7F010ED432F, 0xD20AF1F39F107A60),
    (1, 0x08D30224F3A941EB, 0x63487068D9263251, 0xC8FC673BA0E04862, 0x431C2FA6A657F2D2),
    (2, 0x6BDC168D8C6CC144, 0x4949B5354A2B6F18, 0x93CD153100CB51BD, 0x4FA225D16ED71112),
    (3, 0xAA6F5971F0ED0F70, 0x9E0DEFC4409FB6C0, 0x26C49A263927408C, 0x5C8FE2172136F6EA),
]

# BlindNtHash(SEQ[0:33], 1, 33): init hash then 4 rolls of SEQ[33+i].
# Captured on the N-free sequence: the reference's blind base hash is
# undefined for invalid chars (CONVERT_TAB=255 overflows the tetramer table
# index, reference src/kmer.cpp:43-73 — callers guarantee validity), so an
# N-window has no reference value to pin.
BLIND33 = [
    0x723577E488B13898,
    0xAF398A967E2EEA09,
    0xF711054C99D3FFB3,
    0x9BBF9F6EA1698DD6,
    0x231BDF5BF9B3E2E5,
]


@pytest.mark.parametrize("engine", ["oracle", "jnp"])
def test_k32_h2_with_n(engine):
    nth = NtHash(SEQ_N, 2, 32, engine=engine)
    for pos, fwd, rev, h0, h1 in K32H2:
        assert nth.roll()
        assert nth.get_pos() == pos
        assert nth.get_forward_hash() == fwd
        assert nth.get_reverse_hash() == rev
        assert nth.hashes()[0] == h0 and nth.hashes()[1] == h1


def test_k32_h2_engine_direct():
    import jax.numpy as jnp

    codes = jnp.asarray(encode_ascii(SEQ_N))
    res = hash_kmers(codes, 32, 2)
    h = res.hashes.to_np()
    v = np.asarray(res.valid)
    for pos, fwd, rev, h0, h1 in K32H2:
        assert v[pos]
        assert res.fwd.to_np()[pos] == fwd
        assert h[pos, 0] == h0 and h[pos, 1] == h1
    assert not v[24 - 31 if 24 >= 31 else 0 : 25].any()  # windows overlapping N


def test_k65_h3(subtests=None):
    nth = NtHash(SEQ, 3, 65)
    for pos, h0, h1, h2, fwd in K65H3:
        assert nth.roll()
        assert nth.get_pos() == pos
        assert nth.get_forward_hash() == fwd
        assert list(nth.hashes()[:3]) == [h0, h1, h2]


def test_k65_engine_direct():
    import jax.numpy as jnp

    res = hash_kmers(jnp.asarray(encode_ascii(SEQ)), 65, 3)
    h = res.hashes.to_np()
    for pos, h0, h1, h2, fwd in K65H3:
        assert res.fwd.to_np()[pos] == fwd
        assert list(h[pos]) == [h0, h1, h2]


@pytest.mark.parametrize("engine", ["oracle", "jnp"])
def test_seed18(engine):
    nth = SeedNtHash(SEQ_N, SEEDS18, 2, 18, engine=engine)
    for pos, *hs in SEED18:
        assert nth.roll()
        assert nth.get_pos() == pos
        assert list(nth.hashes()) == hs


def test_seed18_engine_direct():
    import jax.numpy as jnp

    res = hash_kmers_seeds(jnp.asarray(encode_ascii(SEQ_N)), SEEDS18, 2)
    h = res.hashes.to_np()
    for pos, *hs in SEED18:
        assert list(h[pos]) == hs


def test_blind33():
    nth = BlindNtHash(SEQ[:33], 1, 33)
    assert nth.hashes()[0] == BLIND33[0]
    for i, expect in enumerate(BLIND33[1:]):
        nth.roll(SEQ[33 + i])
        assert nth.hashes()[0] == expect
