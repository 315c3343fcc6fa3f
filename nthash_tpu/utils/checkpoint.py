"""Checkpoint / resume (SURVEY.md §5).

The reference persists nothing itself but documents that hash values are a
stable external contract via ``NTHASH_FN_NAME`` (reference
include/nthash/nthash.hpp:13-18), and its iterator state is resumable by
construction: (pos, fwd, rev) fully determine the future.

Here every carried state is already a pytree (BlindState, BlindSeedState,
CountMinSketch, U64), so checkpointing is: flatten -> tag with the hash-
function name (so a reader can detect hash-function drift, exactly the
NTHASH_FN_NAME use-case) -> one .npz. Loading refuses mismatched tags.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import jax
import numpy as np

from ..constants import NTHASH_FN_NAME

_FORMAT = "nthash_tpu.ckpt.v1"


def _leaf_paths(state) -> list[str]:
    """Version-stable structural fingerprint: the key path of every leaf.

    ``str(treedef)`` embeds class reprs whose format is not stable across
    JAX versions; ``jax.tree_util.keystr`` paths (".rows", "[0].hi", ...)
    are part of the public key-path API and identify the structure just as
    uniquely for the NamedTuple/dataclass states checkpointed here.
    """
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(state)
    return [jax.tree_util.keystr(path) for path, _ in paths_leaves]


def save(path, state, *, context: dict | None = None) -> None:
    """Persist any pytree of arrays, tagged with the hash-function name.

    Atomic: writes to a temp file in the target directory and
    ``os.replace``\\ s it over ``path``, so a crash mid-save never corrupts
    an existing checkpoint. ``context`` is an arbitrary JSON-able dict of
    run parameters (input file identity, batch size, k, ...) that
    :func:`load` can validate via ``expect_context`` — resuming a stream
    with different parameters would otherwise silently merge mismatched
    state (ADVICE r3).
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    meta = {
        "format": _FORMAT,
        "fn_name": NTHASH_FN_NAME,
        "treedef": str(treedef),  # advisory only; leaf_paths is the contract
        "leaf_paths": _leaf_paths(state),
        "num_leaves": len(leaves),
        "context": context or {},
    }
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=path.parent, prefix=path.name, suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path, like, *, expect_context: dict | None = None):
    """Restore a pytree saved by :func:`save` into the structure of ``like``.

    Raises ValueError if the checkpoint was produced under a different hash
    function name (hash values are a persisted contract), if the tree
    structure or leaf shapes do not match ``like``, or if any key of
    ``expect_context`` differs from the saved run context.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta.get("format") != _FORMAT:
            raise ValueError(f"not an nthash_tpu checkpoint: {path}")
        if meta["fn_name"] != NTHASH_FN_NAME:
            raise ValueError(
                f"checkpoint hash function {meta['fn_name']!r} != "
                f"{NTHASH_FN_NAME!r}: persisted hashes are incompatible"
            )
        if expect_context:
            saved_ctx = meta.get("context", {})
            for key, want in expect_context.items():
                got = saved_ctx.get(key)
                if got != want:
                    raise ValueError(
                        f"checkpoint context mismatch for {key!r}: saved "
                        f"{got!r}, this run has {want!r} — resuming would "
                        "merge state from a different stream configuration"
                    )
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected {len(like_leaves)}"
        )
    saved_paths = meta.get("leaf_paths")
    want_paths = _leaf_paths(like)
    if saved_paths is not None:
        if saved_paths != want_paths:
            raise ValueError(
                "checkpoint tree structure does not match the requested "
                f"state: saved leaf paths {saved_paths!r}, expected "
                f"{want_paths!r}"
            )
    elif meta.get("treedef") != str(treedef):
        # pre-leaf_paths checkpoints: fall back to the treedef string
        raise ValueError(
            "checkpoint tree structure does not match the requested state: "
            f"saved {meta.get('treedef')!r}, expected {str(treedef)!r}"
        )
    for i, (saved, ref) in enumerate(zip(leaves, like_leaves)):
        want_shape = getattr(ref, "shape", None)
        if want_shape is not None and saved.shape != want_shape:
            raise ValueError(
                f"checkpoint leaf {want_paths[i]} has shape {saved.shape}, "
                f"expected {want_shape}"
            )
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(saved) if hasattr(ref, "devices") else
        np.asarray(saved, dtype=getattr(ref, "dtype", None))
        for saved, ref in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
