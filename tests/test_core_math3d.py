"""Math convention tests: Euler order, TRS, perspective RH-ZO, quat<->matrix,
frustum extraction — matching reference sc_math.cpp behaviour."""

import jax.numpy as jnp
import numpy as np

from scx.core import math3d as m3


def test_euler_xyz_order_matches_rz_ry_rx():
    rx, ry, rz = 0.3, -0.7, 1.1

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rot_z(rz) @ rot_y(ry) @ rot_x(rx)
    got = np.asarray(m3.mat4_rotation_xyz(jnp.asarray([rx, ry, rz])))[0:3, 0:3]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_quat_euler_roundtrip():
    rx, ry, rz = 0.25, 0.5, -0.9
    q = m3.quat_from_euler_xyz(rx, ry, rz)
    back = np.asarray(m3.quat_to_euler_xyz(q))
    np.testing.assert_allclose(back, [rx, ry, rz], atol=1e-6)


def test_quat_rotate_matches_mat3():
    q = m3.quat_normalize(jnp.asarray([0.9, 0.1, -0.3, 0.2]))
    v = jnp.asarray([1.0, 2.0, -0.5])
    np.testing.assert_allclose(
        np.asarray(m3.quat_rotate(q, v)),
        np.asarray(m3.quat_to_mat3(q) @ v),
        atol=1e-6,
    )


def test_trs_composition():
    pos = jnp.asarray([1.0, 2.0, 3.0])
    rot = jnp.asarray([0.0, np.pi / 2, 0.0])
    scale = jnp.asarray([2.0, 1.0, 1.0])
    m = m3.mat4_trs(pos, rot, scale)
    # local +X (scaled 2) rotated 90deg about Y -> -Z*2, then translated
    p = m3.transform_point(m, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [1.0, 2.0, 1.0], atol=1e-5)


def test_perspective_rh_zo():
    fovy = np.radians(60.0)
    p = m3.mat4_perspective_rh_zo(fovy, 16 / 9, 0.1, 1000.0, flip_y=True)
    p = np.asarray(p)
    f = 1.0 / np.tan(fovy / 2)
    assert np.isclose(p[0, 0], f / (16 / 9))
    assert np.isclose(p[1, 1], -f)  # Vulkan Y flip
    assert np.isclose(p[3, 2], -1.0)
    # depth range: z=-near -> d=0, z=-far -> d=1 (RH looks down -Z)
    for z, expect in [(-0.1, 0.0), (-1000.0, 1.0)]:
        v = p @ np.array([0, 0, z, 1.0])
        assert np.isclose(v[2] / v[3], expect, atol=1e-5)


def test_mat4_inverse_rigid():
    q = m3.quat_from_euler_xyz(0.2, 0.4, -0.3)
    m = m3.mat4_trs_quat(
        jnp.asarray([1.0, -2.0, 0.5]), q, jnp.ones(3)
    )
    inv = m3.mat4_inverse_rigid(m)
    np.testing.assert_allclose(np.asarray(m @ inv), np.eye(4), atol=1e-5)


def test_frustum_sphere_culling():
    view = m3.mat4_look_at_rh(
        jnp.asarray([0.0, 0.0, 5.0]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.mat4_perspective_rh_zo(np.radians(60), 1.0, 0.1, 100.0, flip_y=False)
    vp = proj @ view
    planes = m3.frustum_from_view_proj(vp)
    centers = jnp.asarray(
        [
            [0.0, 0.0, 0.0],    # dead ahead -> visible
            [0.0, 0.0, 20.0],   # behind camera -> culled
            [200.0, 0.0, 0.0],  # far right -> culled
            [0.0, 0.0, -200.0], # beyond far plane -> culled
            [8.0, 0.0, 0.0],    # outside but big radius -> visible
        ]
    )
    radii = jnp.asarray([1.0, 1.0, 1.0, 1.0, 6.0])
    vis = np.asarray(m3.sphere_in_frustum(planes, centers, radii))
    np.testing.assert_array_equal(vis, [True, False, False, False, True])


def test_world_bounding_sphere():
    mat = m3.mat4_trs(
        jnp.asarray([10.0, 0.0, 0.0]),
        jnp.zeros(3),
        jnp.asarray([2.0, 1.0, 1.0]),
    )
    c, r = m3.world_bounding_sphere(
        jnp.asarray([-0.5, -0.5, -0.5]), jnp.asarray([0.5, 0.5, 0.5]), mat
    )
    np.testing.assert_allclose(np.asarray(c), [10.0, 0.0, 0.0], atol=1e-6)
    assert np.isclose(float(r), np.sqrt(1.0**2 + 0.5**2 + 0.5**2), atol=1e-5)
