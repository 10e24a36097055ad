"""Checkpoint/resume for long-running solves.

The reference has no checkpointing (SURVEY.md §5); its closest analogue is
that ``optimize!`` mutates ``nls.x`` in place so re-calling resumes from the
last iterate (reference: src/types.jl:189). Here solver state is a pytree:
persist the raw result (or just the minimizer) and resume by passing it back
as ``x0``. Needed for the multi-hour pod-scale runs.

Uses orbax-checkpoint when available (async, sharded-array aware — required
for multi-host, where each host must write only its shards); falls back to
a plain npz snapshot for single-host use.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


# Top-level dict fields additionally saved under a ``key_<name>`` alias so
# they can be pulled back without the full tree structure (resume_x0).
# Restricted to the small resume-relevant fields: aliasing *every* field
# would double the checkpoint payload (the raw result's large leaves —
# jacobian, trace — stored twice) just to serve a single minimizer lookup.
_ALIASED_FIELDS = ("minimizer", "ssr", "iterations")


def save_pytree(path: str, tree: Any) -> None:
    """Persist a pytree of arrays (raw result, iterate, options echo).

    The resume-relevant top-level dict fields (:data:`_ALIASED_FIELDS`) are
    additionally saved under ``key_<name>`` for :func:`resume_x0`.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    named = {}
    if isinstance(tree, dict):
        for k in _ALIASED_FIELDS:
            v = tree.get(k)
            if v is None or jax.tree_util.tree_leaves(v) == []:
                continue
            try:
                arr = np.asarray(v)
            except (TypeError, ValueError):
                continue  # non-array field; the full tree covers it
            if arr.dtype == object:
                # np.asarray(dict) yields a 0-d object array that savez
                # would pickle — unreadable later with allow_pickle=False.
                continue
            named[f"key_{k}"] = arr
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        __treedef__=json.dumps(str(treedef)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        **named,
    )


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree`.

    ``like`` provides the tree structure (e.g. a raw result from a fresh
    1-iteration solve, or the previously saved object's structure).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    if n != len(leaves):
        raise ValueError(
            f"checkpoint has {n} leaves but target structure has {len(leaves)}"
        )
    if "__treedef__" in data.files:
        # Structure check, not just leaf count: dicts flatten by sorted
        # key, so an equal-leaf-count mismatch (renamed/replaced fields)
        # would silently reassign leaves to the wrong fields.
        saved = json.loads(str(data["__treedef__"]))
        if saved != str(treedef):
            raise ValueError(
                "checkpoint tree structure does not match `like`:\n"
                f"  saved: {saved}\n  like:  {treedef}"
            )
    new_leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Persist a pytree with orbax-checkpoint (async-capable, sharded-array
    aware — required for multi-host runs, where each host must write only
    its own shards). ``path`` must be a directory path."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_pytree_orbax(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree_orbax`. ``like``
    supplies structure/shape/sharding targets (abstract arrays allowed)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)


def resume_x0(path: str) -> np.ndarray:
    """Pull just the minimizer out of a saved raw result, to restart a solve
    from the last iterate (the analogue of the reference's in-place ``nls.x``
    resume semantics, src/types.jl:189)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    if "key_minimizer" not in data.files:
        raise KeyError(
            f"{path} has no saved 'minimizer' field; save the raw result "
            "dict with save_pytree, or use load_pytree with the full "
            "structure."
        )
    return data["key_minimizer"]
