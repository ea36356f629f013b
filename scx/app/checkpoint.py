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


def load_legacy_contact_cache(path: str, max_pairs: int):
    """Convert a pre-planar ContactCache aux save (key_a/key_b [P],
    cand [P,K], lam [P,K*3] with (ln,l1,l2) minor) into the PlanarCache
    plane layout ([K,P] planes, split lam components). Keeps the
    documented bit-identical-resume property for saves written before
    the round-4 planar adoption. Returns None when `path` isn't a
    legacy-layout save of matching capacity."""
    from scx.physics.planar import PlanarCache

    try:
        data = np.load(path + ".npz")
    except OSError:
        return None
    keys = {"key_a", "key_b", "cand", "lam"}
    if set(data.files) != keys:
        return None
    ka, kb = data["key_a"], data["key_b"]
    cand, lam = data["cand"], data["lam"]
    if (
        ka.shape != (max_pairs,)
        or cand.ndim != 2
        or cand.shape[0] != max_pairs
        or lam.shape != (max_pairs, cand.shape[1] * 3)
    ):
        return None
    k = cand.shape[1]
    lam3 = lam.reshape(max_pairs, k, 3)
    jnp = jax.numpy
    return PlanarCache(
        key_a=jnp.asarray(ka),
        key_b=jnp.asarray(kb),
        cand=jnp.asarray(cand.T),
        lam_n=jnp.asarray(lam3[..., 0].T),
        lam_1=jnp.asarray(lam3[..., 1].T),
        lam_2=jnp.asarray(lam3[..., 2].T),
    )
