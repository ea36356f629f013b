"""Raycast / sphere-cast correctness against analytic hits."""

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
