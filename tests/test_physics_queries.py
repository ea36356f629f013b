"""Raycast / sphere-cast correctness against analytic hits."""

import pytest
import jax.numpy as jnp
import numpy as np

from scx import physics as ph


def scene():
    pos = jnp.asarray(
        [
            [0.0, 0.0, -10.0],   # box 1x1x1 at z=-10
            [5.0, 0.0, -10.0],   # sphere r=0.5
            [-5.0, 0.0, -10.0],  # capsule r=0.3 hh=0.5 upright
        ]
    )
    return ph.make_bodies(
        pos,
        shape=jnp.asarray(
            [ph.rigid.SHAPE_BOX, ph.rigid.SHAPE_SPHERE, ph.rigid.SHAPE_CAPSULE],
            jnp.int32,
        ),
        size=jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [0.3, 0.5, 0.0]]),
    )


def test_ray_hits_box():
    h = ph.raycast(scene(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0)
    assert bool(h.hit)
    assert int(h.body) == 0
    assert abs(float(h.t) - 9.5) < 1e-4
    np.testing.assert_allclose(np.asarray(h.normal), [0, 0, 1], atol=1e-5)


def test_ray_hits_sphere():
    h = ph.raycast(scene(), jnp.asarray([5.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0)
    assert bool(h.hit) and int(h.body) == 1
    assert abs(float(h.t) - 9.5) < 1e-4


def test_ray_hits_capsule_cylinder_and_cap():
    # side-on hit of the cylinder
    h = ph.raycast(scene(), jnp.asarray([-5.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0)
    assert bool(h.hit) and int(h.body) == 2
    assert abs(float(h.t) - 9.7) < 1e-4
    # top-down hit of the cap sphere: top at y = 0.5 + 0.3
    h2 = ph.raycast(
        scene(), jnp.asarray([-5.0, 5.0, -10.0]), jnp.asarray([0.0, -1.0, 0.0]), 100.0
    )
    assert bool(h2.hit) and int(h2.body) == 2
    assert abs(float(h2.t) - (5.0 - 0.8)) < 1e-4


def test_ray_miss_and_max_t():
    h = ph.raycast(scene(), jnp.asarray([0.0, 3.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0)
    assert not bool(h.hit)
    h2 = ph.raycast(scene(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 5.0)
    assert not bool(h2.hit)  # box is at t=9.5 > max_t=5


def test_ray_exclude_and_mask():
    h = ph.raycast(
        scene(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0,
        exclude=0,
    )
    assert not bool(h.hit)
    b = scene().replace(layer=jnp.asarray([2, 1, 1], jnp.uint32))
    h2 = ph.raycast(
        b, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0,
        query_mask=1,
    )
    assert not bool(h2.hit)  # box is on layer 2, query only sees layer 1


def test_sphere_cast_hits_earlier():
    h = ph.sphere_cast(
        scene(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0, 0.25
    )
    assert bool(h.hit)
    assert abs(float(h.t) - 9.25) < 1e-4  # inflated by the cast radius


def test_capsule_cast_hits_earlier_than_ray():
    """Swept capsule (sweepCapsule parity): the inflated radius and the
    vertical extent both shorten the hit distance vs a plain ray."""
    h_ray = ph.raycast(
        scene(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]), 100.0
    )
    h_cap = ph.capsule_cast(
        scene(),
        jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
        0.5,  # half height
        0.2,  # radius
        jnp.asarray([0.0, 0.0, -1.0]),
        100.0,
    )
    assert bool(h_cap.hit) and int(h_cap.body) == 0
    # surface at z=-9.5; capsule surface reaches 0.2 ahead of its core
    assert float(h_cap.t) < float(h_ray.t)
    assert abs(float(h_cap.t) - 9.3) < 1e-3


def test_capsule_cast_vertical_extent_catches_offset_target():
    """A target above the ray line is caught by the capsule's upper sphere."""
    # box center at y=0; cast from y=1.2: plain ray at y=1.2 misses the
    # 0.5-half box, a capsule with hh=0.5, r=0.3 reaches down to y=0.4
    o = jnp.asarray([0.0, 1.2, 0.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    miss = ph.raycast(scene(), o, d, 100.0)
    hit = ph.capsule_cast(
        scene(), o, jnp.asarray([0.0, 1.0, 0.0]), 0.5, 0.3, d, 100.0
    )
    assert not bool(miss.hit) or int(miss.body) != 0
    assert bool(hit.hit) and int(hit.body) == 0


@pytest.mark.slow
def test_trigger_overlap_reported_not_solved():
    """Trigger colliders generate overlap events but no impulses
    (sc_physics.cpp:372-379): a box falls THROUGH a trigger volume."""
    import jax

    from scx.physics.contacts import generate_contacts, trigger_overlap_mask

    pos = jnp.asarray(
        [
            [0.0, -0.55, 0.0],  # ground
            [0.0, 2.0, 0.0],    # falling box
            [0.0, 0.75, 0.0],   # trigger volume in the fall path
        ]
    )
    b = ph.make_bodies(
        pos,
        size=jnp.asarray([[32.0, 0.05, 32.0], [0.5, 0.5, 0.5], [1.0, 0.25, 1.0]]),
        body_type=jnp.asarray(
            [ph.rigid.BODY_STATIC, ph.rigid.BODY_DYNAMIC, ph.rigid.BODY_STATIC],
            jnp.int32,
        ),
        trigger=jnp.asarray([False, False, True]),
    )
    p = ph.SolverParams(max_pairs=8)
    cache = ph.empty_contact_cache(p.max_pairs)
    saw_overlap = False
    step = jax.jit(lambda bb, cc: ph.step_bodies_cached(bb, p, cc))
    for _ in range(120):
        b, cache, stats = step(b, cache)
        if int(stats["trigger_overlaps"]) > 0:
            saw_overlap = True
            # per-body event mask agrees (regenerated on the post-step state,
            # one integration behind the stats — only check while overlapping)
            ia, ib, pv, _ = ph.broadphase_pairs(b, p.max_pairs)
            contacts = generate_contacts(b, ia, ib, pv)
            mask = np.asarray(trigger_overlap_mask(contacts, 3))
            if mask.any():
                assert mask[2] and mask[1]
    assert saw_overlap
    # the box fell THROUGH the trigger and rests on the ground (y ~ 0)
    assert abs(float(b.pos[1, 1])) < 0.05
