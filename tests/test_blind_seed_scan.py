"""Batched blind spaced-seed scan vs the scalar BlindSeedNtHash facade."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu.api import BlindSeedNtHash
from nthash_tpu.ops import blind_seed_scan as bss

SEEDS = ("110011", "101101")
K = 6


def _make(rng, b):
    windows = rng.integers(0, 4, size=(b, K), dtype=np.uint8)
    return windows, bss.init_state(jnp.asarray(windows), SEEDS)


def test_init_matches_blind(rng):
    windows, state = _make(rng, 5)
    got = bss.hashes_of(state, 2).to_np()
    for i in range(5):
        ref = BlindSeedNtHash(windows[i], SEEDS, 2, K)
        assert np.array_equal(got[i], ref.hashes())


def test_roll_many_matches_blind(rng):
    b, t = 4, 12
    windows, state = _make(rng, b)
    streams = rng.integers(0, 4, size=(t, b), dtype=np.uint8)
    _, hashes = bss.roll_many(state, jnp.asarray(streams), SEEDS, 3)
    got = hashes.to_np()
    for i in range(b):
        ref = BlindSeedNtHash(windows[i], SEEDS, 3, K)
        for step in range(t):
            ref.roll(int(streams[step, i]))
            assert np.array_equal(got[step, i], ref.hashes())


def test_roll_back_inverts_roll(rng):
    b = 6
    windows, state = _make(rng, b)
    before = bss.hashes_of(state, 2).to_np()
    win0 = np.asarray(state.window).copy()
    c = jnp.asarray(rng.integers(0, 4, size=(b,), dtype=np.uint8))
    rolled = bss.roll_select(state, c, SEEDS)
    # roll_back with the base that left restores the state bit-for-bit
    restored = bss.roll_back_select(rolled, jnp.asarray(win0[:, 0]), SEEDS)
    assert np.array_equal(bss.hashes_of(restored, 2).to_np(), before)
    assert np.array_equal(np.asarray(restored.window), win0)
    assert np.array_equal(np.asarray(restored.pos), np.asarray(state.pos))


def test_roll_back_matches_blind(rng):
    b = 3
    windows, state = _make(rng, b)
    c = rng.integers(0, 4, size=(b,), dtype=np.uint8)
    back = bss.roll_back_select(state, jnp.asarray(c), SEEDS)
    got = bss.hashes_of(back, 2).to_np()
    for i in range(b):
        ref = BlindSeedNtHash(windows[i], SEEDS, 2, K)
        ref.roll_back(int(c[i]))
        assert np.array_equal(got[i], ref.hashes())
        assert ref.get_pos() == int(np.asarray(back.pos)[i])
