"""Cluster-binned raster path: equivalence with the reference rasterizer."""

import jax.numpy as jnp
import numpy as np

from scx import render as rd
from scx.core import math3d as m3
from scx.ops import raster as ops
from scx.ops import raster_clusters as rc
from scx.render import pipeline as pipe


def test_cluster_path_matches_reference():
    pool = rd.build_mesh_pool()
    params = rd.RasterParams(
        width=256, height=64, tile_h=16, tile_w=128,
        max_tris=256, max_tris_per_tile=64, max_clusters_per_tile=4,
        interpret=True,
    )
    vp = rd.camera_view_proj(
        jnp.asarray([1.5, 1.2, 2.5]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=256 / 64,
    )
    models = [
        m3.mat4_trs(
            jnp.asarray([dx, 0.0, dz]), jnp.asarray([0.0, a, 0.0]), jnp.ones(3)
        )
        for dx, dz, a in [(0.0, 0.0, 0.3), (1.2, -0.5, 0.9), (-1.0, 0.4, 0.0)]
    ]
    draws = rd.DrawList(
        mesh_id=jnp.full((3,), rd.MESH_CUBE, jnp.int32),
        material_id=jnp.arange(3, dtype=jnp.int32),
        model=jnp.stack(models),
        valid=jnp.ones((3,), bool),
    )
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, params)
    ref = ops.rasterize_reference(setup, params)

    cl_aabb, cl_valid = rc.cluster_bounds(aabb, valid, params.max_tris)
    cl_ids, cl_counts = rc.bin_clusters(cl_aabb, cl_valid, params, 4)
    got = rc.rasterize_clusters(setup, cl_ids, cl_counts, params, 4)

    np.testing.assert_allclose(
        np.asarray(got["depth"]), np.asarray(ref["depth"]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got["mat"]), np.asarray(ref["mat"]))
    np.testing.assert_allclose(
        np.asarray(got["color"]), np.asarray(ref["color"]), atol=1e-4
    )


def test_cluster_bounds_and_binning():
    params = rd.RasterParams(
        width=256, height=64, tile_h=16, tile_w=128, max_tris=128,
        interpret=True,
    )
    t = params.max_tris
    aabb = np.zeros((t, 4), np.float32)
    valid = np.zeros(t, bool)
    # cluster 0: tris around x in [0,100] -> tile column 0 only
    aabb[0] = [10, 5, 90, 12]
    valid[0] = True
    # cluster 1: tri at x in [200,250] -> column 1
    aabb[rc.CLUSTER] = [200, 30, 250, 31]
    valid[rc.CLUSTER] = True
    cl_aabb, cl_valid = rc.cluster_bounds(jnp.asarray(aabb), jnp.asarray(valid), t)
    assert cl_valid.tolist()[:2] == [True, True]
    assert not any(cl_valid.tolist()[2:])
    ids, counts = rc.bin_clusters(cl_aabb, cl_valid, params, 4)
    counts = np.asarray(counts).reshape(params.tiles_y, params.tiles_x)
    # tile (0,0) sees cluster 0; tile (0,1) wait x=200 -> tile col 1; y=30 -> row 1
    assert counts[0, 0] == 1
    assert counts[1, 1] == 1
    assert counts.sum() == 2


def test_cluster_batched_matches_single():
    """rasterize_clusters_batched == per-env rasterize_clusters (VERDICT r2
    item 3: the fast cluster path, env-batched for RL observations)."""
    import jax

    pool = rd.build_mesh_pool()
    params = rd.RasterParams(
        width=128, height=64, tile_h=16, tile_w=128,
        max_tris=256, max_tris_per_tile=64, max_clusters_per_tile=8,
        interpret=True,
    )
    vp = rd.camera_view_proj(
        jnp.asarray([1.5, 1.2, 2.5]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=128 / 64,
    )

    def one_env(seed):
        rng = np.random.RandomState(seed)
        models = [
            m3.mat4_trs(
                jnp.asarray(rng.uniform(-1.5, 1.5, 3).astype(np.float32)),
                jnp.asarray([0.0, rng.uniform(0, 3), 0.0], jnp.float32),
                jnp.ones(3),
            )
            for _ in range(4)
        ]
        draws = rd.DrawList(
            mesh_id=jnp.full((4,), rd.MESH_CUBE, jnp.int32),
            material_id=jnp.arange(4, dtype=jnp.int32),
            model=jnp.stack(models),
            valid=jnp.asarray([True, True, seed % 2 == 0, True]),
        )
        return pipe.setup_triangles(draws, pool, vp, params)

    envs = [one_env(s) for s in range(3)]
    setup = jnp.stack([e[0] for e in envs])
    aabb = jnp.stack([e[1] for e in envs])
    valid = jnp.stack([e[2] for e in envs])

    got, stats = pipe.raster_gbuffer_batched(setup, aabb, valid, params)
    assert int(stats["cluster_drop"]) == 0

    for i in range(3):
        cl_aabb, cl_valid, cl_zmin = rc.cluster_bounds(
            aabb[i], valid[i], params.max_tris, setup[i]
        )
        c_aabb, c_valid, c_zmin, order, _ = rc.compact_clusters(
            cl_aabb, cl_valid, cl_zmin
        )
        ids, counts = rc.bin_clusters(
            c_aabb, c_valid, params, params.max_clusters_per_tile, cl_zmin=c_zmin
        )
        ref = rc.rasterize_clusters(
            setup[i], order[ids], counts, params,
            params.max_clusters_per_tile, cl_zmin=cl_zmin,
        )
        np.testing.assert_allclose(
            np.asarray(got["depth"][i]), np.asarray(ref["depth"]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got["mat"][i]), np.asarray(ref["mat"])
        )
        np.testing.assert_allclose(
            np.asarray(got["color"][i]), np.asarray(ref["color"]), atol=1e-4
        )


def test_cluster_packed_layout_matches():
    """Packed setup blocks (4 tris per 128-lane row) == the padded layout.

    The packed formulation quarters raster DMA traffic and VMEM scratch;
    slot-major triangle order inside a cluster is an internal permutation
    (pass A codes and pass B one-hot use the same accessors), so the
    G-buffer must be identical up to depth ties.

    TIE CAVEAT (the explicit equivalence contract): when two triangles of
    the same cluster land EXACTLY equal depth on a pixel, the in-cluster
    argmin resolves by slot order, which the packed permutation changes —
    either tied triangle's attributes are accepted behavior. This scene
    has no exact ties, so the assert below is exact; a scene with
    constructed ties may legitimately differ in attribute (never depth)
    on tied pixels."""
    pool = rd.build_mesh_pool()
    params = rd.RasterParams(
        width=256, height=64, tile_h=16, tile_w=128,
        max_tris=256, max_tris_per_tile=64, max_clusters_per_tile=4,
        interpret=True,
    )
    vp = rd.camera_view_proj(
        jnp.asarray([1.5, 1.2, 2.5]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=256 / 64,
    )
    models = [
        m3.mat4_trs(
            jnp.asarray([dx, 0.0, dz]), jnp.asarray([0.0, a, 0.0]), jnp.ones(3)
        )
        for dx, dz, a in [(0.0, 0.0, 0.3), (1.2, -0.5, 0.9), (-1.0, 0.4, 0.0)]
    ]
    draws = rd.DrawList(
        mesh_id=jnp.full((3,), rd.MESH_CUBE, jnp.int32),
        material_id=jnp.arange(3, dtype=jnp.int32),
        model=jnp.stack(models),
        valid=jnp.ones((3,), bool),
    )
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, params)
    cl_aabb, cl_valid, cl_zmin = rc.cluster_bounds(
        aabb, valid, params.max_tris, setup
    )
    cl_ids, cl_counts = rc.bin_clusters(cl_aabb, cl_valid, params, 4,
                                        cl_zmin=cl_zmin)
    base = rc.rasterize_clusters(setup, cl_ids, cl_counts, params, 4,
                                 cl_zmin=cl_zmin, packed=False)
    got = rc.rasterize_clusters(setup, cl_ids, cl_counts, params, 4,
                                cl_zmin=cl_zmin, packed=True)
    for k in ("depth", "color", "uv"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(base[k]), atol=1e-6
        )
    np.testing.assert_array_equal(np.asarray(got["mat"]), np.asarray(base["mat"]))

    # batched path, 2 envs
    e = 2
    setup_b = jnp.broadcast_to(setup, (e,) + setup.shape)
    ids_b = jnp.broadcast_to(cl_ids, (e,) + cl_ids.shape)
    counts_b = jnp.broadcast_to(cl_counts, (e,) + cl_counts.shape)
    zmin_b = jnp.broadcast_to(cl_zmin, (e,) + cl_zmin.shape)
    bb = rc.rasterize_clusters_batched(
        setup_b, ids_b, counts_b, params, 4, cl_zmin=zmin_b, packed=False
    )
    gb = rc.rasterize_clusters_batched(
        setup_b, ids_b, counts_b, params, 4, cl_zmin=zmin_b, packed=True
    )
    np.testing.assert_allclose(
        np.asarray(gb["depth"]), np.asarray(bb["depth"]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(gb["mat"]), np.asarray(bb["mat"]))


def test_cluster_batched_chunking_matches():
    """Env chunking (SMEM budget) must not change results."""
    pool = rd.build_mesh_pool()
    params = rd.RasterParams(
        width=128, height=32, tile_h=16, tile_w=128,
        max_tris=64, max_clusters_per_tile=4, interpret=True,
    )
    vp = rd.camera_view_proj(
        jnp.asarray([1.2, 1.0, 2.2]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=128 / 32,
    )
    draws = rd.DrawList(
        mesh_id=jnp.full((2,), rd.MESH_CUBE, jnp.int32),
        material_id=jnp.arange(2, dtype=jnp.int32),
        model=jnp.stack([
            m3.mat4_trs(jnp.asarray([dx, 0.0, 0.0]), jnp.zeros(3), jnp.ones(3))
            for dx in (-0.7, 0.7)
        ]),
        valid=jnp.ones((2,), bool),
    )
    setup, aabb, valid = pipe.setup_triangles(draws, pool, vp, params)
    e = 4
    setup_b = jnp.broadcast_to(setup, (e,) + setup.shape)
    aabb_b = jnp.broadcast_to(aabb, (e,) + aabb.shape)
    valid_b = jnp.broadcast_to(valid, (e,) + valid.shape)

    full, _ = pipe.raster_gbuffer_batched(setup_b, aabb_b, valid_b, params)

    import functools as ft

    from scx.ops.raster_clusters import rasterize_clusters_batched

    def prep(s, a, v):
        cl_aabb, cl_valid, cl_zmin = rc.cluster_bounds(a, v, params.max_tris, s)
        c_aabb, c_valid, c_zmin, order, _ = rc.compact_clusters(
            cl_aabb, cl_valid, cl_zmin
        )
        ids, counts = rc.bin_clusters(c_aabb, c_valid, params, 4, cl_zmin=c_zmin)
        return order[ids], counts, cl_zmin

    import jax

    ids, counts, zmin = jax.vmap(prep)(setup_b, aabb_b, valid_b)
    # force 2-env chunks
    small = rasterize_clusters_batched(
        setup_b, ids, counts, params, 4, cl_zmin=zmin,
        smem_budget=2 * params.n_tiles * 5 * 4,
    )
    np.testing.assert_allclose(
        np.asarray(full["depth"]), np.asarray(small["depth"]), atol=1e-6
    )
