"""Simulation checkpoint / resume.

The reference has no runtime save-game — persistence is only the authored
sector files (SURVEY §5.4).  On this engine the ENTIRE simulation state is
one SoA pytree, so checkpointing is a strict improvement and nearly free:
every leaf serializes to one .npz, and restoring rebuilds the exact device
state (bitwise, same shapes — streaming bookkeeping is snapshotted
alongside).  Orbax is available for sharded multi-host checkpoints; the
single-host default stays dependency-light.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from scx.state import entity as ent

_FORMAT_VERSION = 1


def _flatten(state) -> dict:
    leaves = {}

    def visit(prefix, node):
        if hasattr(node, "__dataclass_fields__"):
            for name in node.__dataclass_fields__:
                visit(f"{prefix}{name}.", getattr(node, name))
        else:
            leaves[prefix[:-1]] = np.asarray(node)

    visit("", state)
    return leaves


def save_aux_pytree(path: str, tree) -> None:
    """Serialize any dataclass pytree (e.g. the solver's warm-start
    ContactCache) to <path>.npz alongside a checkpoint."""
    np.savez_compressed(path + ".npz", **_flatten(tree))


def load_aux_pytree(path: str, template):
    """Rebuild a pytree saved by save_aux_pytree onto `template`'s
    structure. Returns None when the file is missing or any leaf's shape
    disagrees with the template (e.g. the solver capacity was retuned
    since the save) — callers keep their fresh template in that case."""
    try:
        data = np.load(path + ".npz")
    except OSError:
        return None
    leaves = _flatten(template)
    for key, leaf in leaves.items():
        if key not in data or data[key].shape != leaf.shape:
            return None

    def rebuild(prefix, node):
        updates = {}
        for name in node.__dataclass_fields__:
            child = getattr(node, name)
            key = f"{prefix}{name}"
            if hasattr(child, "__dataclass_fields__"):
                updates[name] = rebuild(key + ".", child)
            else:
                updates[name] = jax.numpy.asarray(data[key])
        return node.replace(**updates)

    return rebuild("", template)


def save_checkpoint(path: str, state: ent.EntityState, extra: dict | None = None):
    """Write sim state (+ optional host bookkeeping dict) to <path>.npz/.json."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = _flatten(state)
    np.savez_compressed(path + ".npz", **leaves)
    meta = {
        "format": _FORMAT_VERSION,
        "capacity": int(state.capacity),
        "extra": extra or {},
    }
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh)
    return True


def load_checkpoint(path: str):
    """Returns (EntityState, extra dict) or None."""
    try:
        with open(path + ".json") as fh:
            meta = json.load(fh)
        data = np.load(path + ".npz")
    except OSError:
        return None
    if meta.get("format") != _FORMAT_VERSION:
        return None
    state = ent.alloc_entity_state(meta["capacity"])

    def rebuild(prefix, node):
        if hasattr(node, "__dataclass_fields__"):
            updates = {}
        else:
            raise AssertionError
        for name in node.__dataclass_fields__:
            child = getattr(node, name)
            key = f"{prefix}{name}"
            if hasattr(child, "__dataclass_fields__"):
                updates[name] = rebuild(key + ".", child)
            elif key in data:
                updates[name] = jax.numpy.asarray(data[key])
            else:
                # leaf added after the checkpoint was written (same format
                # version): keep the freshly-allocated template default so
                # old saves stay loadable
                updates[name] = child
        return node.replace(**updates)

    state = rebuild("", state)
    return state, meta.get("extra", {})
