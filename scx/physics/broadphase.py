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

import jax
import jax.numpy as jnp

from scx.physics.rigid import RigidBodies, body_aabbs

# N*N band in which pair compaction uses top_k instead of a rank scatter
# (tests patch these to force either path). Measured on v5e: top_k wins in
# the mid range (160 bodies: -17% on the whole vmapped sim step) but loses
# ~17% at tiny N (64-body bench scenes) where the scatter touches few
# lanes, and loses again at huge N^2.
_TOPK_MIN = 1 << 13
_TOPK_LIMIT = 1 << 20


def broadphase_pairs(bodies: RigidBodies, max_pairs: int, margin: float = 0.02):
    """Returns (ia, ib, valid, n_candidates): up to `max_pairs` overlapping
    body pairs plus the TOTAL candidate count before the capacity cap —
    callers surface max(0, n_candidates - max_pairs) as pair overflow
    telemetry instead of silently losing contacts.

    Deterministic: pairs are ordered by flattened (i,j) index, i < j.
    Inactive bodies, static-static pairs and filtered layers are excluded.
    """
    n = bodies.n
    lo, hi = body_aabbs(bodies)
    lo = lo - margin
    hi = hi + margin

    # per-axis overlap on [N,N] matrices — an [N,N,3] temporary pads its
    # trailing dim to 128 lanes (42x) and dominates the step under an env
    # vmap; three column matrices stay dense
    def axis_overlap(k):
        l, h = lo[:, k], hi[:, k]
        return (l[:, None] <= h[None, :]) & (l[None, :] <= h[:, None])

    overlap = axis_overlap(0) & axis_overlap(1) & axis_overlap(2)

    dyn = bodies.inv_mass > 0
    either_dyn = dyn[:, None] | dyn[None, :]
    layer_ok = ((bodies.layer[:, None] & bodies.mask[None, :]) != 0) & (
        (bodies.layer[None, :] & bodies.mask[:, None]) != 0
    )
    act = bodies.active
    both_active = act[:, None] & act[None, :]

    # upper triangle as an iota mask on the flattened matrix (a triu-index
    # gather costs N^2/2 row-gathers on TPU)
    flat = jnp.arange(n * n, dtype=jnp.int32)
    flat_i = flat // n
    flat_j = flat - flat_i * n
    valid = (
        (overlap & either_dyn & layer_ok & both_active).reshape(n * n)
        & (flat_i < flat_j)
    )

    n_valid = jnp.sum(valid.astype(jnp.int32))
    if _TOPK_MIN <= n * n <= _TOPK_LIMIT:
        # compaction by top_k: score = n*n - flat for valid pairs, so the
        # max_pairs largest scores ARE the first valid pairs in flat order.
        # Under a vmapped env batch this is ~17% of the whole sim step
        # faster than the scatter below (XLA lowers batched row scatters
        # poorly — same pathology as the solver, solver.py one-hot note).
        score = jnp.where(valid, n * n - flat, 0)
        k = min(max_pairs, n * n)  # tiny scenes: k may exceed N^2
        vals, _ = jax.lax.top_k(score, k)
        if k < max_pairs:
            vals = jnp.concatenate(
                [vals, jnp.zeros((max_pairs - k,), vals.dtype)]
            )
        kflat = jnp.where(vals > 0, n * n - vals, 0)
    else:
        # huge single scenes: one rank scatter beats top_k over N^2 lanes.
        # the k-th valid pair writes its flat index into slot k (ranks are
        # unique, deterministic pair order preserved)
        rank = jnp.cumsum(valid.astype(jnp.int32))
        pos = jnp.where(valid, rank - 1, max_pairs)
        pos = jnp.minimum(pos, max_pairs)
        kflat = (
            jnp.zeros(max_pairs + 1, jnp.int32)
            .at[pos]
            .set(flat, mode="drop")[:max_pairs]
        )
    ia = kflat // n
    ib = kflat - ia * n
    val = jnp.arange(max_pairs) < n_valid
    return ia, ib, val, n_valid
