"""Exhaustive randomized tests of the uint32 limb-pair arithmetic vs NumPy uint64."""

import numpy as np
import pytest

from nthash_tpu import constants as C
from nthash_tpu import u64
from nthash_tpu.u64 import U64


@pytest.fixture
def vals(rng):
    x = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    # include edge cases
    x[:6] = [0, 1, (1 << 64) - 1, 1 << 32, (1 << 33) - 1, 1 << 33]
    return x


def test_roundtrip(vals):
    assert np.array_equal(U64.from_np(vals).to_np(), vals)


def test_xor_add(vals, rng):
    y = rng.integers(0, 1 << 64, size=vals.size, dtype=np.uint64)
    a, b = U64.from_np(vals), U64.from_np(y)
    assert np.array_equal(u64.xor(a, b).to_np(), vals ^ y)
    assert np.array_equal(u64.add(a, b).to_np(), vals + y)  # wraps mod 2^64


def test_srol1_sror1(vals):
    a = U64.from_np(vals)
    expect_l = np.array([C.srol1(int(v)) for v in vals], dtype=np.uint64)
    expect_r = np.array([C.sror1(int(v)) for v in vals], dtype=np.uint64)
    assert np.array_equal(u64.srol1(a).to_np(), expect_l)
    assert np.array_equal(u64.sror1(a).to_np(), expect_r)
    # inverse property
    assert np.array_equal(u64.sror1(u64.srol1(a)).to_np(), vals)


def test_shifts(vals):
    a = U64.from_np(vals)
    for s in [0, 1, 5, 27, 31, 32, 33, 45, 63]:
        assert np.array_equal(u64.shr(a, s).to_np(), vals >> np.uint64(s)), s
        assert np.array_equal(u64.shl(a, s).to_np(), vals << np.uint64(s)), s


def test_mul_const(vals):
    a = U64.from_np(vals)
    for m in [0, 1, 3, 0xFFFFFFFF, C.MULTISEED, (1 << 64) - 1,
              C.nte64_multiplier(1, 32), C.nte64_multiplier(3, 5)]:
        expect = vals * np.uint64(m & C.M64)
        assert np.array_equal(u64.mul_const(a, m).to_np(), expect), hex(m)


def test_lookup5():
    import jax.numpy as jnp

    values = (C.SEED_A, C.SEED_C, C.SEED_G, C.SEED_T, 0)
    idx = jnp.array([0, 1, 2, 3, 4, 4, 2])
    got = u64.lookup5(idx, values).to_np()
    expect = np.array([values[i] for i in [0, 1, 2, 3, 4, 4, 2]], dtype=np.uint64)
    assert np.array_equal(got, expect)


def test_extend_hashes_device(vals):
    from nthash_tpu.constants import extend_hashes as ext_host

    k, h = 32, 5
    fwd = vals[:17]
    rev = vals[17:34]
    canon = u64.add(U64.from_np(fwd), U64.from_np(rev))
    got = [e.to_np() for e in u64.extend_hashes(canon, k, h)]
    for j in range(17):
        expect = ext_host(int(fwd[j]), int(rev[j]), k, h)
        for i in range(h):
            assert got[i][j] == np.uint64(expect[i])
