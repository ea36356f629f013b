"""Pallas TPU tiled software rasterizer — the engine's Vulkan replacement.

Visibility + attribute interpolation for one framebuffer tile per grid
program.  The pipeline (scx.render.pipeline) pre-bins triangle setup into a
padded [n_tiles, K, F] array ordered by tile, so each program STREAMS its
block sequentially — zero random access inside the kernel; Pallas's grid
pipeline overlaps the HBM->VMEM copies of tile t+1 with the compute of t.

Per triangle: three edge functions evaluated over the tile's (th x tw) pixel
lattice (VPU), perspective-correct barycentric interpolation via
premultiplied 1/w attributes, z-buffer test in RH zero-to-one depth (smaller
= closer, matching the reference's perspective, sc_math.cpp:209-232).

Outputs a planar G-buffer: depth [H,W] and attrs [6,H,W] (rgb, uv, material
id); texturing happens afterwards in XLA where gathers are cheap
(deferred shading) — per-lane gathers inside a TPU kernel are not.

Invalid / padded triangle slots are skipped with pl.when, so sparsely
occupied tiles cost only the scalar loop overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scx.render import pipeline as pipe

N_ATTR = 6  # r, g, b, u, v, mat


CHUNK = 8  # triangles vectorized per kernel iteration (scalar loop
           # overhead is ~100+ cycles/iteration, CLAUDE.md quirk 6)


def _raster_tile_kernel(count_ref, binned_ref, depth_ref, attr_ref, *, params):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    n = count_ref[ty * pl.num_programs(1) + tx]
    _raster_tile_body(
        n,
        lambda c0: binned_ref[0, pl.dslice(c0 * CHUNK, CHUNK), :],
        depth_ref, attr_ref, ty, tx, params,
    )


def _raster_tile_body(n, load_chunk, depth_ref, attr_ref, ty, tx, params):
    """Two-pass chunk-vectorized tile raster (same scheme as the cluster
    kernel): pass A evaluates CHUNK triangles at once over the (th, tw)
    lattice and min-reduces depth while recording the winner code; pass B
    interpolates attributes only for chunks that won pixels, resolved
    through a one-hot on the winner code.  Exact: depth buffering is a min
    reduction, strict '<' keeps the first (lowest-index) triangle on ties
    in both passes — identical output to the per-triangle loop it
    replaces, ~CHUNKx fewer scalar iterations."""
    th, tw = params.tile_h, params.tile_w

    depth_ref[...] = jnp.ones(depth_ref.shape, jnp.float32)
    attr_ref[...] = jnp.zeros(attr_ref.shape, jnp.float32)

    py = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
        + ty.astype(jnp.float32) * th
        + 0.5
    )[None]
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
        + tx.astype(jnp.float32) * tw
        + 0.5
    )[None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 1), 0)
    n_chunks = (n + CHUNK - 1) // CHUNK

    def run_scoped_body(winner_ref):
        winner_ref[:] = jnp.full((th, tw), -1, jnp.int32)

        def pass_a(c0, _):
            blk = load_chunk(c0)                             # (CHUNK, F)
            g = lambda f: blk[:, f : f + 1][:, :, None]      # (CHUNK,1,1)

            def ev(base):
                return g(base) * px + g(base + 1) * py + g(base + 2)

            l0 = ev(pipe.F_L0)
            l1 = ev(pipe.F_L1)
            cov = (l0 >= 0.0) & (l1 >= 0.0) & (l0 + l1 <= 1.0)
            cov &= (c0 * CHUNK + lane) < n                   # tail chunk
            z = ev(pipe.F_Z)
            zm = jnp.where(cov & (z >= 0.0), z, 2.0)
            best_z = jnp.min(zm, axis=0)
            best_j = jnp.argmin(zm, axis=0).astype(jnp.int32)
            depth = depth_ref[...].reshape(th, tw)
            m = best_z < depth

            @pl.when(jnp.any(m))
            def _():
                depth_ref[...] = jnp.where(m, best_z, depth).reshape(
                    depth_ref.shape
                )
                winner_ref[:] = jnp.where(
                    m, c0 * CHUNK + best_j, winner_ref[:]
                )

        jax.lax.fori_loop(0, n_chunks, pass_a, None)

        codes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 1), 0)

        def pass_b(c0, _):
            w = winner_ref[:]
            lo = c0 * CHUNK
            in_chunk = (w >= lo) & (w < lo + CHUNK)

            @pl.when(jnp.any(in_chunk))
            def _():
                blk = load_chunk(c0)
                g = lambda f: blk[:, f : f + 1][:, :, None]

                def ev(base):
                    return g(base) * px + g(base + 1) * py + g(base + 2)

                onehot = ((w[None] - lo) == codes).astype(jnp.float32)

                def resolve(base):
                    return jnp.sum(ev(base) * onehot, axis=0)

                inv_iw = 1.0 / jnp.maximum(resolve(pipe.F_IW), 1e-12)
                matv = jnp.sum(
                    jnp.broadcast_to(g(pipe.F_MAT), onehot.shape) * onehot,
                    axis=0,
                )
                new = jnp.stack(
                    [
                        resolve(pipe.F_COL + 0) * inv_iw,
                        resolve(pipe.F_COL + 3) * inv_iw,
                        resolve(pipe.F_COL + 6) * inv_iw,
                        resolve(pipe.F_UV + 0) * inv_iw,
                        resolve(pipe.F_UV + 3) * inv_iw,
                        matv,
                    ]
                )
                attrs = attr_ref[...].reshape(N_ATTR, th, tw)
                attr_ref[...] = jnp.where(in_chunk[None], new, attrs).reshape(
                    attr_ref.shape
                )

        jax.lax.fori_loop(0, n_chunks, pass_b, None)

    pl.run_scoped(run_scoped_body, pltpu.VMEM((th, tw), jnp.int32))


def rasterize_tiles(binned, params, counts=None) -> dict:
    """binned: [n_tiles, K, N_FIELDS] -> G-buffer dict (depth/color/uv/mat).

    counts: [n_tiles] i32 per-tile occupancy (dynamic loop bound); defaults
    to the full K when not provided.
    """
    assert params.max_tris_per_tile % CHUNK == 0, "tile capacity must be a CHUNK multiple"
    nty, ntx = params.tiles_y, params.tiles_x
    th, tw = params.tile_h, params.tile_w
    h_pad, w_pad = nty * th, ntx * tw
    if counts is None:
        counts = jnp.full((params.n_tiles,), params.max_tris_per_tile, jnp.int32)

    kernel = functools.partial(_raster_tile_kernel, params=params)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-tile occupancy counts
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (1, params.max_tris_per_tile, pipe.N_FIELDS),
                lambda ty, tx, counts: (ty * ntx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda ty, tx, counts: (ty, tx), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N_ATTR, th, tw),
                lambda ty, tx, counts: (0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    depth, attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((N_ATTR, h_pad, w_pad), jnp.float32),
        ],
        interpret=params.interpret,
    )(
        jnp.minimum(counts, params.max_tris_per_tile).astype(jnp.int32),
        binned,
    )

    h, w = params.height, params.width
    depth = depth[:h, :w]
    attrs = attrs[:, :h, :w]
    return {
        "depth": depth,
        "color": jnp.moveaxis(attrs[0:3], 0, -1),
        "uv": jnp.moveaxis(attrs[3:5], 0, -1),
        "mat": attrs[5].astype(jnp.int32),
        "covered": depth < 1.0,
    }


# ---------------------------------------------------------------------------
# Pure-XLA reference rasterizer (golden tests, CPU fallback, tiny images)
# ---------------------------------------------------------------------------

def rasterize_reference(setup, params) -> dict:
    """Same math as the kernel, brute force over all pixels x triangles via
    lax.scan — O(T*H*W), for validation only."""
    h, w = params.height, params.width
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5

    def tri_step(carry, s):
        depth, attrs = carry

        def ev(base):
            return s[base] * px + s[base + 1] * py + s[base + 2]

        l0 = ev(pipe.F_L0)
        l1 = ev(pipe.F_L1)
        cov = (l0 >= 0.0) & (l1 >= 0.0) & (l0 + l1 <= 1.0)
        z = ev(pipe.F_Z)
        mask = cov & (z < depth) & (z >= 0.0)
        inv_iw = 1.0 / jnp.maximum(ev(pipe.F_IW), 1e-12)

        new = jnp.stack(
            [
                ev(pipe.F_COL + 0) * inv_iw,
                ev(pipe.F_COL + 3) * inv_iw,
                ev(pipe.F_COL + 6) * inv_iw,
                ev(pipe.F_UV + 0) * inv_iw,
                ev(pipe.F_UV + 3) * inv_iw,
                jnp.broadcast_to(s[pipe.F_MAT], (h, w)),
            ]
        )
        depth = jnp.where(mask, z, depth)
        attrs = jnp.where(mask[None], new, attrs)
        return (depth, attrs), None

    depth0 = jnp.ones((h, w), jnp.float32)
    attrs0 = jnp.zeros((N_ATTR, h, w), jnp.float32)
    (depth, attrs), _ = jax.lax.scan(tri_step, (depth0, attrs0), setup)
    return {
        "depth": depth,
        "color": jnp.moveaxis(attrs[0:3], 0, -1),
        "uv": jnp.moveaxis(attrs[3:5], 0, -1),
        "mat": attrs[5].astype(jnp.int32),
        "covered": depth < 1.0,
    }


def rasterize_tiles_batched(binned, counts, params) -> dict:
    """Batched-env variant: binned [E, n_tiles, K, F], counts [E, n_tiles]
    -> G-buffer with leading env dim.  Grid = (envs, tiles_y, tiles_x); no
    DMA needed at RL sizes (K is small), blocks stream like the single-env
    path.  Used by the vectorized RL env (128x128 RGB-D observations)."""
    e = binned.shape[0]
    assert params.max_tris_per_tile % CHUNK == 0, "tile capacity must be a CHUNK multiple"
    nty, ntx = params.tiles_y, params.tiles_x
    th, tw = params.tile_h, params.tile_w
    h_pad, w_pad = nty * th, ntx * tw

    n_tiles = nty * ntx

    def kernel(count_ref, binned_ref, depth_ref, attr_ref):
        env = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        _raster_tile_body(
            # counts arrive FLAT [E*n_tiles]: a 2D [E, n_tiles] SMEM operand
            # pads its last dim to 128 lanes (4096 envs x 8 tiles i32 ->
            # 2 MiB > the 1 MiB SMEM budget, seen as a real AOT compile
            # failure); the 1D layout stays at E*n_tiles*4 bytes.
            count_ref[env * n_tiles + ty * ntx + tx],
            lambda c0: binned_ref[0, 0, pl.dslice(c0 * CHUNK, CHUNK), :],
            depth_ref, attr_ref, ty, tx, params,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (1, 1, params.max_tris_per_tile, pipe.N_FIELDS),
                lambda env, ty, tx, c: (env, ty * ntx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw), lambda env, ty, tx, c: (env, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N_ATTR, th, tw),
                lambda env, ty, tx, c: (env, 0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    depth, attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e, h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((e, N_ATTR, h_pad, w_pad), jnp.float32),
        ],
        interpret=params.interpret,
    )(
        jnp.minimum(counts, params.max_tris_per_tile)
        .astype(jnp.int32)
        .reshape(e * n_tiles),
        binned,
    )
    h, w = params.height, params.width
    depth = depth[:, :h, :w]
    attrs = attrs[:, :, :h, :w]
    return {
        "depth": depth,
        "color": jnp.moveaxis(attrs[:, 0:3], 1, -1),
        "uv": jnp.moveaxis(attrs[:, 3:5], 1, -1),
        "mat": attrs[:, 5].astype(jnp.int32),
        "covered": depth < 1.0,
    }
