"""Near-plane clipping: geometry crossing the near plane renders instead of
vanishing (the ground-you-stand-on case)."""

import jax.numpy as jnp
import numpy as np

from scx import render as rd
from scx.core import math3d as m3
from scx.ops import raster as ops
from scx.render import pipeline as pipe


def params():
    return rd.RasterParams(
        width=256, height=64, tile_h=16, tile_w=128,
        max_tris=512, max_tris_per_tile=64, max_clusters_per_tile=8,
        clip_extra=128, interpret=True,
    )


def ground_scene():
    """Camera standing on a huge ground slab that extends far behind it."""
    pool = rd.build_mesh_pool()
    p = params()
    vp = rd.camera_view_proj(
        jnp.asarray([0.0, 2.0, 0.0]),
        jnp.asarray([0.0, 0.0, -10.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
        aspect=256 / 64,
    )
    ground = m3.mat4_trs(
        jnp.asarray([0.0, -0.05, -20.0]), jnp.zeros(3),
        jnp.asarray([200.0, 0.1, 200.0]),
    )
    draws = rd.DrawList(
        mesh_id=jnp.asarray([rd.MESH_CUBE], jnp.int32),
        material_id=jnp.asarray([0], jnp.int32),
        model=ground[None],
        valid=jnp.ones((1,), bool),
    )
    return pool, p, vp, draws


def test_ground_crossing_near_plane_is_clipped_not_culled():
    pool, p, vp, draws = ground_scene()
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, p)
    assert int(valid.sum()) >= 1  # clipped triangles survive
    g = ops.rasterize_reference(setup, p)
    cov = np.asarray(g["covered"])
    # the lower half of the frame is ground
    assert cov[48:, :].mean() > 0.9
    # depth increases toward the horizon
    d = np.asarray(g["depth"])
    assert d[63, 128] < d[40, 128]


def test_clipped_tris_use_extra_region():
    pool, p, vp, draws = ground_scene()
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, p)
    extra = np.asarray(valid[p.max_tris - p.effective_clip_extra :])
    assert extra.sum() >= 1  # quad second-halves landed in the tail


def test_cluster_path_matches_reference_with_clipping():
    pool, p, vp, draws = ground_scene()
    rgb_ref_params = rd.RasterParams(
        **{**{f.name: getattr(p, f.name) for f in p.__dataclass_fields__.values()},
           "use_clusters": False}
    )
    rgb_c, g_c, _ = rd.render_frame(draws, pool, vp, p)
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, p)
    g_ref = ops.rasterize_reference(setup, p)
    # f32 edge functions on large clipped triangles round differently in the
    # chunked kernel fold vs the sequential reference — 1e-4 depth units
    np.testing.assert_allclose(
        np.asarray(g_c["depth"]), np.asarray(g_ref["depth"]), atol=1e-4
    )
