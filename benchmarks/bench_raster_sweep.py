"""Chained-scan sweep of raster kernel configs (tile_h x CLUSTER) on the
cached city-chunk setup buffers.  Chained timing (CLAUDE.md trap 9) with a
1e-12 depth-plane perturbation per iteration to defeat loop-invariant
hoisting without changing the work."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from scx import render as rd
from scx.render import pipeline as pipe
from scx.ops import raster_clusters as rc

import glob as _glob
_c = sorted(_glob.glob("/tmp/raster_micro_inputs*.npz"))
assert _c, "run bench_raster_micro.py first (builds the setup cache)"
d = np.load(_c[0])  # only setup/aabb/valid are used; binning is redone
setup = jnp.asarray(d["setup"]); aabb = jnp.asarray(d["aabb"]); valid = jnp.asarray(d["valid"])
KC = 256
N_ITER = 30

def run(tile_h, tile_w=128, cluster=None):
    if cluster is not None:
        rc.CLUSTER = cluster
    params = rd.RasterParams(width=1280, height=720, max_tris=131072,
                             tile_h=tile_h, tile_w=tile_w,
                             max_clusters_per_tile=KC, min_area2=0.25)
    def _bin(s):
        ca, cv, cz = rc.cluster_bounds(aabb, valid, params.max_tris, s)
        ca2, cv2, cz2, order, _drop = rc.compact_clusters(ca, cv, cz)
        ids, counts = rc.bin_clusters(ca2, cv2, params, KC, cl_zmin=cz2)
        return order[ids], counts, cz
    binf = jax.jit(_bin)
    ids, counts, cz = jax.block_until_ready(binf(setup))

    def chain_raster(s0):
        def body(c, i):
            s = s0.at[:, pipe.F_Z + 2].add(i.astype(jnp.float32) * 1e-12)
            g = rc.rasterize_clusters(s, ids, counts, params, KC, cl_zmin=cz)
            return c + g["depth"][::64, ::64].sum(), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(N_ITER))[0]
    f = jax.jit(chain_raster)
    r = f(setup); jax.block_until_ready(r)
    t0 = time.time(); r = f(setup); jax.block_until_ready(r)
    rast_ms = (time.time() - t0) / N_ITER * 1e3

    def chain_bin(s0):
        def body(c, i):
            s = s0.at[:, pipe.F_Z + 2].add(i.astype(jnp.float32) * 1e-12)
            ids2, counts2, _ = _bin(s)
            return c + counts2.sum() + ids2[:, 0].sum(), None
        return jax.lax.scan(body, jnp.int32(0), jnp.arange(N_ITER))[0]
    fb = jax.jit(chain_bin)
    r = fb(setup); jax.block_until_ready(r)
    t0 = time.time(); r = fb(setup); jax.block_until_ready(r)
    bin_ms = (time.time() - t0) / N_ITER * 1e3

    g = jax.jit(lambda: rc.rasterize_clusters(setup, ids, counts, params, KC, cl_zmin=cz))()
    cov = int(np.asarray(g["covered"]).sum())
    print("tile %dx%d CLUSTER=%d: raster %.3f ms  bin %.3f ms  covered %d  mean_occ %.1f"
          % (tile_h, tile_w, rc.CLUSTER, rast_ms, bin_ms, cov, float(jnp.mean(counts))), flush=True)

import sys
for spec in sys.argv[1:]:
    th, tw, cl = map(int, spec.split(","))
    run(th, tw, cl)
