"""Scene queries: raycast and swept-sphere, fully vectorized.

Mirrors the reference's PhysicsWorld::raycast / sweepCapsule surface
(reference: sc_physics.cpp:740-810): closest hit over all bodies with
layer/mask filtering and an optional excluded body (the caster itself).

Implementation is brute-force over the body arrays — for N <= a few hundred
bodies this is one fused VPU pass and beats any tree. Rays broadcast, so
vmapping a [R,3] bundle of rays costs one pass too (traffic sensors cast all
their rays at once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from scx.core import math3d as m3
from scx.physics.rigid import RigidBodies, SHAPE_BOX, SHAPE_SPHERE, SHAPE_CAPSULE

_BIG = 1e30


@struct.dataclass
class RayHit:
    hit: jax.Array     # [] bool
    t: jax.Array       # [] f32 distance along ray
    body: jax.Array    # [] i32 body index (-1 if none)
    point: jax.Array   # [3]
    normal: jax.Array  # [3]


def _ray_sphere(o, d, center, radius, inflate=0.0):
    r = radius + inflate
    oc = o - center
    b = m3.dot(oc, d)
    c = m3.dot(oc, oc) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    hit = (disc >= 0.0) & (t >= 0.0)
    t = jnp.where(hit, t, _BIG)
    p = o + d * t
    n = m3.safe_normalize(p - center, jnp.asarray([0.0, 1.0, 0.0]))
    return t, n


def _ray_box_local(o, d, h):
    """Slab test in box local frame; returns (t, normal_local)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d < 0, -1e-9, 1e-9), d)
    t1 = (-h - o) * inv
    t2 = (h - o) * inv
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(tmax_ax, axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin >= 0.0, tmin, tmax)  # inside the box -> exit point
    t = jnp.where(hit, t, _BIG)
    # normal: axis where tmin is achieved, sign opposite the ray
    axis = jnp.argmax((tmin_ax == tmin[..., None]).astype(jnp.int32), axis=-1)
    n = jax.nn.one_hot(axis, 3, dtype=o.dtype) * -jnp.sign(
        jnp.take_along_axis(d, axis[..., None], axis=-1)
    )
    return t, n


def _ray_capsule(o, d, pos, quat, size, inflate=0.0):
    """Ray vs capsule: cylinder quadratic + cap spheres (local frame, Y axis)."""
    r = size[0] + inflate
    hh = size[1]
    ol = m3.quat_rotate(m3.quat_conj(quat), o - pos)
    dl = m3.quat_rotate(m3.quat_conj(quat), d)
    # infinite cylinder around Y: (ox+t dx)^2 + (oz+t dz)^2 = r^2
    a = dl[0] * dl[0] + dl[2] * dl[2]
    b = ol[0] * dl[0] + ol[2] * dl[2]
    c = ol[0] * ol[0] + ol[2] * ol[2] - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b - sq) / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    y_at = ol[1] + t_cyl * dl[1]
    cyl_ok = (disc >= 0.0) & (t_cyl >= 0.0) & (jnp.abs(y_at) <= hh) & (a > 1e-12)
    t_cyl = jnp.where(cyl_ok, t_cyl, _BIG)
    n_cyl = m3.safe_normalize(
        jnp.asarray([1.0, 0.0, 1.0]) * (ol + dl * t_cyl), jnp.asarray([0.0, 1.0, 0.0])
    )
    # cap spheres; pick the nearest candidate with pairwise selects (a
    # stacked argmin materializes a [batch..., 3, 3] tensor under vmap —
    # 40 GB at RL fleet sizes)
    top = jnp.asarray([0.0, 1.0, 0.0]) * hh
    t_top, n_top = _ray_sphere(ol, dl, top, r)
    t_bot, n_bot = _ray_sphere(ol, dl, -top, r)
    t = t_cyl
    n_local = n_cyl
    better = t_top < t
    n_local = jnp.where(better, n_top, n_local)
    t = jnp.where(better, t_top, t)
    better = t_bot < t
    n_local = jnp.where(better, n_bot, n_local)
    t = jnp.where(better, t_bot, t)
    return t, m3.quat_rotate(quat, n_local)


def _ray_one_body(o, d, pos, quat, shape, size, inflate):
    # box (optionally inflated — used by sphere_cast; corners not rounded)
    ol = m3.quat_rotate(m3.quat_conj(quat), o - pos)
    dl = m3.quat_rotate(m3.quat_conj(quat), d)
    t_box, n_box_l = _ray_box_local(ol, dl, size + inflate)
    n_box = m3.quat_rotate(quat, n_box_l)
    t_sph, n_sph = _ray_sphere(o, d, pos, size[0], inflate)
    t_cap, n_cap = _ray_capsule(o, d, pos, quat, size, inflate)
    t = jnp.where(
        shape == SHAPE_BOX, t_box, jnp.where(shape == SHAPE_SPHERE, t_sph, t_cap)
    )
    n = jnp.where(
        shape == SHAPE_BOX, n_box, jnp.where(shape == SHAPE_SPHERE, n_sph, n_cap)
    )
    return t, n


def raycast(
    bodies: RigidBodies,
    origin,
    direction,
    max_t,
    query_mask: int | jax.Array = 0xFFFFFFFF,
    exclude: int | jax.Array = -1,
    inflate: float = 0.0,
) -> RayHit:
    """Closest-hit raycast against every active body.

    query_mask filters by body layer ((layer & query_mask) != 0); `exclude`
    skips one body index (the caster). `inflate` turns this into a
    swept-sphere of that radius (sphere_cast).
    """
    o = jnp.asarray(origin, jnp.float32)
    d = m3.normalize(jnp.asarray(direction, jnp.float32))

    from scx.physics.rigid import shape_centers

    t, n = jax.vmap(
        lambda p, q, s, z: _ray_one_body(o, d, p, q, s, z, inflate)
    )(shape_centers(bodies), bodies.quat, bodies.shape, bodies.size)

    qm = jnp.asarray(query_mask, jnp.uint32)
    ok = (
        bodies.active
        & ((bodies.layer & qm) != 0)
        & (jnp.arange(bodies.n) != exclude)
        & (t <= max_t)
    )
    t = jnp.where(ok, t, _BIG)
    idx = jnp.argmin(t)
    best_t = t[idx]
    hit = best_t < _BIG
    return RayHit(
        hit=hit,
        t=jnp.where(hit, best_t, max_t),
        body=jnp.where(hit, idx.astype(jnp.int32), -1),
        point=o + d * jnp.where(hit, best_t, max_t),
        normal=jnp.where(hit, n[idx], jnp.asarray([0.0, 1.0, 0.0])),
    )


def sphere_cast(bodies, origin, direction, max_t, radius, **kw) -> RayHit:
    """Swept sphere = raycast against Minkowski-inflated shapes
    (box corners squared off — the reference's capsule sweep is similarly
    approximate for its use cases: camera occlusion, character probes)."""
    return raycast(bodies, origin, direction, max_t, inflate=radius, **kw)
