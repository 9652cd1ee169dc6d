"""Checkpoint / exact resume: params + optimizer state + PRNG key + step.

Reference used torch.save of the best state_dict (SURVEY.md section 6).
Here: a single .npz of the flattened (params, opt_state) pytree leaves plus
the PRNG key and step counter — dependency-free, byte-exact resume (tested in
tests/test_checkpoint.py). Loading restores into a template pytree from
init (structure must match; a structure fingerprint is stored and verified).
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def _structure_fingerprint(tree) -> str:
    treedef = jax.tree_util.tree_structure(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    desc = str(treedef) + "|" + ",".join(f"{l.shape}{l.dtype}" for l in leaves)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state, key: jax.Array, step: int,
                    extra: dict | None = None):
    """state: any pytree (e.g. (params, opt_state)). key: jax PRNG key."""
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(state)]
    arrays = {f"leaf_{i}": l for i, l in enumerate(leaves)}
    arrays["_key"] = np.asarray(jax.random.key_data(key))
    arrays["_step"] = np.asarray(step)
    arrays["_fingerprint"] = np.frombuffer(
        _structure_fingerprint(state).encode(), dtype=np.uint8)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_checkpoint(path: str, state_template):
    """Returns (state, key, step, extra). state_template supplies structure
    (e.g. freshly-initialized (params, opt_state))."""
    with np.load(path) as data:
        fp_saved = bytes(data["_fingerprint"]).decode()
        fp_now = _structure_fingerprint(state_template)
        if fp_saved != fp_now:
            raise ValueError(
                f"checkpoint structure mismatch: saved {fp_saved}, template {fp_now} "
                "(did the model/optimizer config change?)")
        n = len(jax.tree_util.tree_leaves(state_template))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        treedef = jax.tree_util.tree_structure(state_template)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        key = jax.random.wrap_key_data(data["_key"])
        step = int(data["_step"])
        extra = {k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")}
    return state, key, step, extra


def peek_extra(path: str) -> dict:
    """Read only the extra_* metadata (no pytree template needed) — e.g. the
    embedded model config that makes checkpoints self-describing."""
    with np.load(path) as data:
        return {k[len("extra_"):]: data[k] for k in data.files
                if k.startswith("extra_")}
