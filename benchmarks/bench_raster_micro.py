"""Kernel-only raster timing: builds the city-chunk setup buffers once and
caches them to /tmp, then times rasterize_clusters (and optionally
bin_clusters) in isolation.  Lets kernel variants iterate without paying the
3-minute remote compile of the full geometry/binning XLA graph."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

KC = 256
# cache is keyed on the tile lattice: ids/counts are per-tile, so a stale
# file built under a different default tile shape silently mis-bins
import scx.render as _rd
_tile = f"{_rd.RasterParams().tile_h}x{_rd.RasterParams().tile_w}"
CACHE = f"/tmp/raster_micro_inputs_{_tile}.npz"

from scx import render as rd
from scx.ops import raster_clusters as rc


def build_inputs():
    from scx.render import pipeline as pipe
    from scx.render.mesh import build_mesh_pool
    rng = np.random.RandomState(7)
    verts_all, tris_all = [], []
    def add_box(cx, cz, w, h, d, sub):
        for axis, sign in [(0,1),(0,-1),(1,1),(2,1),(2,-1)]:
            u_axis, v_axis = (axis+1)%3, (axis+2)%3
            for i in range(sub):
                for j in range(sub):
                    u0, u1 = -0.5 + i/sub, -0.5 + (i+1)/sub
                    q0, q1 = -0.5 + j/sub, -0.5 + (j+1)/sub
                    k = len(verts_all)
                    for (uu, qq) in [(u0,q0),(u1,q0),(u1,q1),(u0,q1)]:
                        p = [0.,0.,0.]
                        p[axis] = 0.5*sign
                        p[u_axis] = uu
                        p[v_axis] = qq
                        pw = [p[0]*w+cx, p[1]*h+h/2, p[2]*d+cz]
                        lum = 0.35 + 0.5*rng.rand()
                        verts_all.append(pw + [lum,lum,lum] + [uu+0.5, qq+0.5])
                    tris_all.extend([[k,k+1,k+2],[k,k+2,k+3]])
    G = 22
    for bi in range(G):
        for bj in range(G):
            cx = (bi - G/2) * 14.0 + rng.uniform(-2,2)
            cz = -bj * 14.0 - 8.0
            w = rng.uniform(6, 10); d = rng.uniform(6, 10); h = rng.uniform(8, 35)
            add_box(cx, cz, w, h, d, 4)
    GS = 24
    for i in range(GS):
        for j in range(GS):
            x0 = (i-GS/2)*16.0; z0 = -j*16.0
            k = len(verts_all)
            lum = 0.25
            for (xx, zz) in [(x0,z0),(x0+16,z0),(x0+16,z0-16),(x0,z0-16)]:
                verts_all.append([xx, 0.0, zz, lum,lum,lum, (xx%16)/16, (zz%16)/16])
            tris_all.extend([[k,k+1,k+2],[k,k+2,k+3]])
    verts = np.asarray(verts_all, np.float32)
    tris = np.asarray(tris_all, np.int32)
    pool = build_mesh_pool([(verts, tris)])
    params = rd.RasterParams(width=1280, height=720, max_tris=131072,
                             max_clusters_per_tile=KC, min_area2=0.25)
    draws = rd.DrawList(mesh_id=jnp.zeros((1,), jnp.int32),
                        material_id=jnp.zeros((1,), jnp.int32),
                        model=jnp.eye(4)[None], valid=jnp.ones((1,), bool))
    vp = rd.camera_view_proj(jnp.asarray([7.0, 2.5, 4.0]), jnp.asarray([7.0, 2.0, -60.0]),
                             jnp.asarray([0.0, 1.0, 0.0]), aspect=1280/720)
    setup, aabb, valid = jax.jit(
        lambda d: pipe.setup_triangles(pipe.sort_draws_spatial(d, vp, params), pool, vp, params)
    )(draws)
    ca, cv, cz = rc.cluster_bounds(aabb, valid, params.max_tris, setup)
    ids, counts = rc.bin_clusters(ca, cv, params, KC, cl_zmin=cz)
    np.savez(CACHE, setup=np.asarray(setup), ids=np.asarray(ids),
             counts=np.asarray(counts), zmin=np.asarray(cz),
             aabb=np.asarray(aabb), valid=np.asarray(valid))


if not os.path.exists(CACHE) or "--rebuild" in sys.argv:
    build_inputs()
d = np.load(CACHE)
params = rd.RasterParams(width=1280, height=720, max_tris=131072,
                         max_clusters_per_tile=KC, min_area2=0.25)
setup = jnp.asarray(d["setup"]); ids = jnp.asarray(d["ids"])
counts = jnp.asarray(d["counts"]); zmin = jnp.asarray(d["zmin"])

rast = jax.jit(lambda s, i, c, z: rc.rasterize_clusters(s, i, c, params, KC, cl_zmin=z))
g = rast(setup, ids, counts, zmin); jax.block_until_ready(g)
cov = int(np.asarray(g["covered"]).sum())
print("covered:", cov, flush=True)
assert cov > 880000, cov
N = 50
t0 = time.time()
for _ in range(N):
    g = rast(setup, ids, counts, zmin)
jax.block_until_ready(g)
print("raster: %.3f ms" % ((time.time()-t0)/N*1e3), flush=True)

if "--bin" in sys.argv:
    aabb = jnp.asarray(d["aabb"]); valid = jnp.asarray(d["valid"])
    def _bin(a, v, s):
        ca, cv, cz = rc.cluster_bounds(a, v, params.max_tris, s)
        ca, cv, cz, order, _drop = rc.compact_clusters(ca, cv, cz)
        ids, counts = rc.bin_clusters(ca, cv, params, KC, cl_zmin=cz)
        return order[ids], counts
    binf = jax.jit(_bin)
    r = binf(aabb, valid, setup); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(N):
        r = binf(aabb, valid, setup)
    jax.block_until_ready(r)
    print("bin: %.3f ms" % ((time.time()-t0)/N*1e3), flush=True)
