"""ONE huge scene across the mesh: spatial physics strips + render strips,
both over the 'sp' axis — the full "sandbox tick too big for a chip" path.

Composition per step (all inside one shard_map, one jit):
  1. physics: each shard owns the bodies in its x-strip and advances them
     with ghost-halo exchange + ownership migration (scx.parallel.spatial —
     two ppermute ring hops over ICI).
  2. pose gather: body poses are tiny (a few KB/shard) next to framebuffer
     strips (MBs), so every shard all_gathers the fleet's poses and builds
     the full draw list.
  3. render: each shard rasterizes ONLY its strip of framebuffer rows
     (render_frame_rows — affine plane shift, no full-frame work) and the
     output image is materialized sharded over rows.

The reference's answer to big scenes is LOD degradation (§2.27); this is
the TPU answer — throw chips at it.  Collectives per frame: 4 ppermutes
(halo + migration) + 1 all_gather, all riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scx.core import math3d as m3
from scx.parallel.spatial import make_spatial_step
from scx.physics.solver import SolverParams
from scx.render.mesh import MESH_CUBE, build_mesh_pool
from scx.render.pipeline import DrawList, RasterParams, render_frame_rows


def gathered_draws(bodies_all_pos, bodies_all_quat, bodies_all_size,
                   bodies_all_active):
    """Fleet poses -> DrawList of scaled unit cubes (MESH_CUBE has half
    extent 0.5, so scale = full extents = 2*half_extents)."""
    model = jax.vmap(m3.mat4_trs_quat)(
        bodies_all_pos, bodies_all_quat, bodies_all_size * 2.0
    )
    n = bodies_all_pos.shape[0]
    return DrawList(
        mesh_id=jnp.full((n,), MESH_CUBE, jnp.int32),
        material_id=jnp.zeros((n,), jnp.int32),
        model=model,
        valid=bodies_all_active,
    )


def make_bigscene_step(
    mesh,
    params: SolverParams,
    raster: RasterParams,
    x0: float,
    shard_width: float,
    halo: float = 4.0,
    halo_cap: int = 32,
    mig_cap: int = 16,
    materials=None,
    textures=None,
):
    """Returns jitted f(bodies [S,N] sharded over 'sp', view_proj) ->
    (bodies', rgb [H,W,3] row-sharded over 'sp', stats)."""
    from jax import shard_map

    n_shards = mesh.shape["sp"]
    rows_per = raster.height // n_shards
    assert rows_per % raster.tile_h == 0, "strip rows must align to tile_h"
    pool = build_mesh_pool()
    spatial = make_spatial_step(
        params, n_shards, x0, shard_width, halo, halo_cap, mig_cap
    )

    def local(bodies_slice, vp):
        b = jax.tree.map(lambda a: a[0], bodies_slice)
        b, stats = spatial(b)

        pos = jax.lax.all_gather(b.pos, "sp").reshape(-1, 3)
        quat = jax.lax.all_gather(b.quat, "sp").reshape(-1, 4)
        size = jax.lax.all_gather(b.size, "sp").reshape(-1, 3)
        active = jax.lax.all_gather(b.active, "sp").reshape(-1)
        draws = gathered_draws(pos, quat, size, active)

        row0 = jax.lax.axis_index("sp") * rows_per
        rgb, _, rstats = render_frame_rows(
            draws, pool, vp, raster, row0, rows_per, materials, textures
        )
        stats = dict(stats)
        stats["tile_overflow"] = jax.lax.psum(rstats["tile_overflow"], "sp")
        # strip culling makes per-shard counts differ; report the max
        stats["tris_in"] = jax.lax.pmax(rstats["tris_in"], "sp")
        return jax.tree.map(lambda a: a[None], b), rgb, stats

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("sp"), P()),
        out_specs=(P("sp"), P("sp", None, None), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_bigscene_chain(mesh, params, raster, x0, shard_width, n_steps,
                        halo=4.0, halo_cap=32, mig_cap=16):
    """Device-chained variant: `n_steps` full sim+render steps inside ONE
    shard_map/jit (benchmarking — per-call timing through a tunneled
    device transport is untrustworthy, CLAUDE.md trap 10). Returns
    f(bodies, vp) -> (bodies', last rgb, stats)."""
    from jax import shard_map

    n_shards = mesh.shape["sp"]
    rows_per = raster.height // n_shards
    pool = build_mesh_pool()
    spatial = make_spatial_step(
        params, n_shards, x0, shard_width, halo, halo_cap, mig_cap
    )

    def local(bodies_slice, vp):
        b0 = jax.tree.map(lambda a: a[0], bodies_slice)

        def body(b, _):
            b, stats = spatial(b)
            pos = jax.lax.all_gather(b.pos, "sp").reshape(-1, 3)
            quat = jax.lax.all_gather(b.quat, "sp").reshape(-1, 4)
            size = jax.lax.all_gather(b.size, "sp").reshape(-1, 3)
            active = jax.lax.all_gather(b.active, "sp").reshape(-1)
            draws = gathered_draws(pos, quat, size, active)
            row0 = jax.lax.axis_index("sp") * rows_per
            rgb, _, _ = render_frame_rows(
                draws, pool, vp, raster, row0, rows_per
            )
            return b, (rgb[::16, ::16].sum(), stats["active"])

        b, (sums, actives) = jax.lax.scan(body, b0, None, length=n_steps)
        stats = {"active": actives[-1], "rgb_sum": sums.sum()}
        return jax.tree.map(lambda a: a[None], b), stats

    fn = shard_map(
        local, mesh=mesh, in_specs=(P("sp"), P()),
        out_specs=(P("sp"), P()), check_vma=False,
    )
    return jax.jit(fn)
