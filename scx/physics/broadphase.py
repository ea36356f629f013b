"""Broadphase: masked all-pairs AABB overlap with fixed-capacity compaction.

The reference uses Bullet's btDbvtBroadphase (dynamic BVH). Trees are hostile
to the TPU's static-shape/vector model; for the target body counts per scene
(N <= a few hundred) the all-pairs overlap matrix IS the fast path: an [N,N]
boolean op is one fused VPU pass, and turning it into a fixed-capacity pair
list is a single sort — no pointers, no host sync.

Layer/mask filtering matches Bullet's (aLayer & bMask) && (bLayer & aMask)
semantics (sc_physics.cpp:372-379 filter defaults).
"""

from __future__ import annotations

import jax.numpy as jnp

from scx.physics.rigid import RigidBodies, body_aabbs


def broadphase_pairs(bodies: RigidBodies, max_pairs: int, margin: float = 0.02):
    """Returns (ia, ib, valid): up to `max_pairs` overlapping body pairs.

    Deterministic: pairs are ordered by flattened (i,j) index, i < j.
    Inactive bodies, static-static pairs and filtered layers are excluded.
    """
    n = bodies.n
    lo, hi = body_aabbs(bodies)
    lo = lo - margin
    hi = hi + margin

    overlap = jnp.all(
        (lo[:, None, :] <= hi[None, :, :]) & (lo[None, :, :] <= hi[:, None, :]),
        axis=-1,
    )

    dyn = bodies.inv_mass > 0
    either_dyn = dyn[:, None] | dyn[None, :]
    layer_ok = ((bodies.layer[:, None] & bodies.mask[None, :]) != 0) & (
        (bodies.layer[None, :] & bodies.mask[:, None]) != 0
    )
    act = bodies.active
    both_active = act[:, None] & act[None, :]

    iu = jnp.triu_indices(n, k=1)
    flat_i = iu[0].astype(jnp.int32)
    flat_j = iu[1].astype(jnp.int32)
    valid = (overlap & either_dyn & layer_ok & both_active)[flat_i, flat_j]

    # compaction by scatter: the k-th valid pair writes itself into slot k
    # (ranks are unique, deterministic pair order preserved; argsort-based
    # compaction is far slower on TPU)
    rank = jnp.cumsum(valid.astype(jnp.int32))
    pos = jnp.where(valid, rank - 1, max_pairs)
    pos = jnp.minimum(pos, max_pairs)
    ia = (
        jnp.zeros(max_pairs + 1, jnp.int32).at[pos].set(flat_i, mode="drop")[:max_pairs]
    )
    ib = (
        jnp.zeros(max_pairs + 1, jnp.int32).at[pos].set(flat_j, mode="drop")[:max_pairs]
    )
    n_valid = jnp.sum(valid.astype(jnp.int32))
    val = jnp.arange(max_pairs) < n_valid
    return ia, ib, val
