"""Spatially-sharded physics (scx.parallel.spatial): ghost-halo exchange +
ownership migration over the 'sp' mesh axis must reproduce the single-chip
solve on the same global scene."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scx import physics as ph
from scx.parallel.mesh import make_mesh
from scx.parallel import spatial as sp

S = 4            # shards
WIDTH = 16.0     # strip width
N_LOCAL = 24     # per-shard capacity


def build_global_scene():
    """4 side-by-side ground slabs + boxes, some straddling boundaries,
    one launched across a boundary (exercises migration)."""
    rng = np.random.RandomState(11)
    pos, size, btype, vel = [], [], [], []
    for k in range(S):
        cx = k * WIDTH + WIDTH / 2
        pos.append([cx, -0.55, 0.0])
        size.append([WIDTH / 2, 0.05, 8.0])
        btype.append(ph.rigid.BODY_STATIC)
        vel.append([0.0, 0.0, 0.0])
    # boxes: two mid-strip, one near each right boundary (straddles the halo)
    for k in range(S):
        for j, x_off in enumerate([4.0, 9.0, WIDTH - 0.6]):
            if k == S - 1 and j == 2:
                continue
            pos.append([k * WIDTH + x_off, 0.5 + 1.2 * j, 0.4 * j - 0.4])
            size.append([0.5, 0.5, 0.5])
            btype.append(ph.rigid.BODY_DYNAMIC)
            vel.append([0.0, 0.0, 0.0])
    # a fast box crossing from strip 1 into strip 2 (migration)
    pos.append([WIDTH * 2 - 2.0, 2.0, 3.0])
    size.append([0.4, 0.4, 0.4])
    btype.append(ph.rigid.BODY_DYNAMIC)
    vel.append([6.0, 0.0, 0.0])
    n = len(pos)
    bodies = ph.make_bodies(
        jnp.asarray(pos, jnp.float32),
        size=jnp.asarray(size, jnp.float32),
        body_type=jnp.asarray(btype, jnp.int32),
    )
    bodies = bodies.replace(vel=jnp.asarray(vel, jnp.float32))
    return bodies, n


def shard_scene(bodies, n):
    """Distribute the global scene into [S, N_LOCAL] per-strip arrays."""
    x = np.asarray(bodies.pos[:, 0])
    out = jax.tree.map(
        lambda a: np.zeros((S, N_LOCAL) + a.shape[1:], a.dtype), bodies
    )
    fill = [0] * S
    for i in range(n):
        k = min(int(x[i] // WIDTH), S - 1)
        j = fill[k]
        fill[k] += 1
        out = jax.tree.map(
            lambda dst, src: _set(dst, k, j, np.asarray(src[i])), out, bodies
        )
    return jax.tree.map(jnp.asarray, out)


def _set(dst, k, j, v):
    dst[k, j] = v
    return dst


def sorted_active(bodies_pos, active):
    pts = np.asarray(bodies_pos)[np.asarray(active)]
    return pts[np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))]


@pytest.mark.slow
def test_spatial_equals_global():
    params = ph.SolverParams(max_pairs=256, iterations=8)
    bodies, n = build_global_scene()

    # --- global single-chip reference ---
    ref = bodies
    for _ in range(40):
        ref = ph.step_bodies(ref, params)

    # --- sharded run on the virtual mesh ---
    mesh = make_mesh(dp=2, sp=S)
    local = shard_scene(bodies, n)
    stepf = sp.spatial_sharded_step(
        mesh, params, x0=0.0, shard_width=WIDTH, halo=3.0,
        halo_cap=8, mig_cap=8,
    )
    stats = None
    for _ in range(40):
        local, stats = stepf(local)

    assert int(stats["halo_dropped"]) == 0
    assert int(stats["migration_dropped"]) == 0
    assert int(stats["active"]) == n

    ref_pts = sorted_active(ref.pos, ref.active)
    got = sorted_active(
        np.asarray(local.pos).reshape(-1, 3),
        np.asarray(local.active).reshape(-1),
    )
    assert got.shape == ref_pts.shape
    np.testing.assert_allclose(got, ref_pts, atol=2e-3)


def test_migration_transfers_ownership():
    params = ph.SolverParams(max_pairs=128, iterations=4)
    bodies, n = build_global_scene()
    mesh = make_mesh(dp=2, sp=S)
    local = shard_scene(bodies, n)
    before = np.asarray(local.active).sum(axis=1)
    stepf = sp.spatial_sharded_step(
        mesh, params, x0=0.0, shard_width=WIDTH, halo=3.0,
        halo_cap=8, mig_cap=8,
    )
    migrated_total = 0
    for _ in range(60):
        local, stats = stepf(local)
        migrated_total += int(stats["migrated"])
    after = np.asarray(local.active).sum(axis=1)
    assert migrated_total >= 1  # the launched box crossed a boundary
    assert int(stats["active"]) == n  # nothing lost
    assert not np.array_equal(before, after)  # ownership actually moved


def test_pack_and_splice_roundtrip():
    bodies = ph.make_bodies(
        jnp.asarray([[0.0, 0, 0], [5.0, 0, 0], [9.0, 0, 0]], jnp.float32)
    )
    mask = jnp.asarray([True, False, True])
    packed, dropped = sp.pack_rows(bodies, mask, cap=4)
    assert int(dropped) == 0
    assert int(packed.active.sum()) == 2
    np.testing.assert_allclose(
        np.asarray(packed.pos[:2, 0]), [0.0, 9.0]
    )
    # splice into a world with one occupied slot
    world = ph.make_bodies(jnp.asarray([[50.0, 0, 0]] * 4, jnp.float32))
    world = world.replace(active=jnp.asarray([True, False, False, False]))
    out, d2 = sp.splice_rows(world, packed)
    assert int(d2) == 0
    assert int(out.active.sum()) == 3
    xs = sorted(np.asarray(out.pos[out.active][:, 0]).tolist())
    assert xs == [0.0, 9.0, 50.0]
