"""Batched blind-scan engine vs the scalar BlindNtHash facade (oracle-backed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nthash_tpu.api import BlindNtHash
from nthash_tpu.ops import blind_scan


def _random_windows(rng, b, k):
    return rng.integers(0, 4, size=(b, k), dtype=np.uint8)


def test_init_matches_blind(rng):
    b, k, h = 6, 9, 3
    wins = _random_windows(rng, b, k)
    st = blind_scan.init_state(jnp.asarray(wins))
    hashes = blind_scan.hashes_of(st, h).to_np()
    for i in range(b):
        ref = BlindNtHash(wins[i], h, k)
        assert np.array_equal(hashes[i], ref.hashes())
        assert int(st.fwd.to_np()[i]) == ref.get_forward_hash()
        assert int(st.rev.to_np()[i]) == ref.get_reverse_hash()


def test_roll_many_matches_blind(rng):
    b, k, h, t = 5, 7, 2, 12
    wins = _random_windows(rng, b, k)
    chars = rng.integers(0, 4, size=(t, b), dtype=np.uint8)
    st = blind_scan.init_state(jnp.asarray(wins))
    st, hashes = blind_scan.roll_many(st, jnp.asarray(chars), h)
    got = hashes.to_np()  # [T, B, H]
    for i in range(b):
        ref = BlindNtHash(wins[i], h, k)
        for step in range(t):
            ref.roll(int(chars[step, i]))
            assert np.array_equal(got[step, i], ref.hashes())
    assert (np.asarray(st.pos) == t).all()


def test_roll_select_and_back_roundtrip(rng):
    b, k = 8, 6
    wins = _random_windows(rng, b, k)
    st0 = blind_scan.init_state(jnp.asarray(wins))
    choice = jnp.asarray(rng.integers(0, 4, size=b, dtype=np.int32))
    st1 = blind_scan.roll_select(st0, choice)
    # rolling back with the base that fell out restores everything
    dropped = jnp.asarray(wins[:, 0].astype(np.int32))
    st2 = blind_scan.roll_back_select(st1, dropped)
    assert np.array_equal(st2.fwd.to_np(), st0.fwd.to_np())
    assert np.array_equal(st2.rev.to_np(), st0.rev.to_np())
    assert np.array_equal(np.asarray(st2.window), np.asarray(st0.window))
    assert (np.asarray(st2.pos) == 0).all()


def test_roll_back_matches_blind(rng):
    b, k, h = 4, 5, 2
    wins = _random_windows(rng, b, k)
    st = blind_scan.init_state(jnp.asarray(wins))
    chars = rng.integers(0, 4, size=b, dtype=np.int32)
    st = blind_scan.roll_back_select(st, jnp.asarray(chars))
    hashes = blind_scan.hashes_of(st, h).to_np()
    for i in range(b):
        ref = BlindNtHash(wins[i], h, k)
        ref.roll_back(int(chars[i]))
        assert np.array_equal(hashes[i], ref.hashes())
        assert ref.get_pos() == int(np.asarray(st.pos)[i])


def test_peek4_matches_blind(rng):
    b, k, h = 4, 8, 3
    wins = _random_windows(rng, b, k)
    st = blind_scan.init_state(jnp.asarray(wins))
    p4 = blind_scan.peek4(st, h).to_np()  # [B, 4, H]
    for i in range(b):
        ref = BlindNtHash(wins[i], h, k)
        for code in range(4):
            ref.peek(code)
            assert np.array_equal(p4[i, code], ref.hashes())


def test_survey_golden_vectors():
    """SURVEY §8 BlindNtHash vectors through the batched engine."""
    from nthash_tpu.constants import encode_ascii

    win = encode_ascii("ACCAGT")[None]
    st = blind_scan.init_state(jnp.asarray(win))
    h0 = blind_scan.hashes_of(st, 2).to_np()[0]
    assert tuple(int(x) for x in h0) == (0xCAD4A7762B580A62, 0x074FEA558D43E636)
    st = blind_scan.roll_select(st, jnp.asarray([2]))  # 'G'
    h1 = blind_scan.hashes_of(st, 2).to_np()[0]
    assert tuple(int(x) for x in h1) == (0xF0A68649810CDA6C, 0x3AF339FADE1F0C8C)
    st = blind_scan.roll_back_select(st, jnp.asarray([0]))  # 'A'
    h2 = blind_scan.hashes_of(st, 2).to_np()[0]
    assert tuple(int(x) for x in h2) == (0xCAD4A7762B580A62, 0x074FEA558D43E636)
