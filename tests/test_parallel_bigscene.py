"""Big-scene composition (scx.parallel.bigscene): spatial physics strips +
pose all_gather + render strips in ONE shard_map step must match the
single-chip solve + full-frame render of the same global scene."""

import jax
import jax.numpy as jnp
import numpy as np

from scx import physics as ph
from scx import render as rd
from scx.parallel import bigscene as bg
from scx.parallel.mesh import make_mesh
from scx.physics.warmstart import empty_contact_cache

from tests.test_parallel_spatial import (
    N_LOCAL, S, WIDTH, build_global_scene, shard_scene,
)


def _raster():
    return rd.RasterParams(
        width=128, height=64, tile_h=16, tile_w=128,
        max_tris=1024, max_tris_per_tile=64, max_clusters_per_tile=8,
        interpret=True,
    )


def _vp(params):
    return rd.camera_view_proj(
        jnp.asarray([2 * WIDTH, 18.0, 26.0]),
        jnp.asarray([2 * WIDTH, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=params.width / params.height,
    )


def test_bigscene_step_matches_global_sim_and_render():
    mesh = make_mesh(dp=1, sp=S)
    params = ph.SolverParams(max_pairs=128, iterations=6)
    raster = _raster()
    vp = _vp(raster)

    bodies, n = build_global_scene()
    sharded = shard_scene(bodies, n)

    step = bg.make_bigscene_step(
        mesh, params, raster, x0=0.0, shard_width=WIDTH,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out = sharded
    for _ in range(3):
        out, rgb, stats = step(out, vp)
    jax.block_until_ready(rgb)
    assert rgb.shape == (raster.height, raster.width, 3)
    assert int(stats["halo_dropped"]) == 0
    assert int(stats["migration_dropped"]) == 0
    assert int(stats["tile_overflow"]) == 0

    # reference: global solve + full-frame render of the SAME fleet
    cache = empty_contact_cache(params.max_pairs)
    ref = bodies
    for _ in range(3):
        ref, cache, _ = ph.step_bodies_cached(ref, params, cache)

    # compare poses of the sharded fleet (any strip order) vs global
    def fleet(btree):
        pos = np.asarray(btree.pos).reshape(-1, 3)
        act = np.asarray(btree.active).reshape(-1)
        rows = pos[act]
        return rows[np.lexsort(rows.T)]

    got = fleet(out)
    want_rows = np.asarray(ref.pos)[np.asarray(ref.active)]
    want = want_rows[np.lexsort(want_rows.T)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)

    # render the gathered fleet unsharded: strips must compose to the same
    pos = jnp.asarray(np.asarray(out.pos).reshape(-1, 3))
    quat = jnp.asarray(np.asarray(out.quat).reshape(-1, 4))
    size = jnp.asarray(np.asarray(out.size).reshape(-1, 3))
    act = jnp.asarray(np.asarray(out.active).reshape(-1))
    draws = bg.gathered_draws(pos, quat, size, act)
    from scx.render.mesh import build_mesh_pool
    from scx.render.pipeline import render_frame

    full_rgb, _, _ = render_frame(draws, build_mesh_pool(), vp, raster)
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(full_rgb), atol=1e-5
    )


def test_bigscene_chain_matches_stepwise():
    """The device-chained N-step variant == N single steps."""
    mesh = make_mesh(dp=1, sp=S)
    params = ph.SolverParams(max_pairs=128, iterations=6)
    raster = _raster()
    vp = _vp(raster)
    bodies, n = build_global_scene()
    sharded = shard_scene(bodies, n)

    step = bg.make_bigscene_step(
        mesh, params, raster, x0=0.0, shard_width=WIDTH,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out = sharded
    for _ in range(3):
        out, _, _ = step(out, vp)

    chain = bg.make_bigscene_chain(
        mesh, params, raster, x0=0.0, shard_width=WIDTH, n_steps=3,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out2, cstats = chain(sharded, vp)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(out2.pos), atol=1e-5
    )
    assert int(cstats["active"]) == int(
        np.asarray(out.active).sum()
    )
