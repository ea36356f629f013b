"""One HUGE physics+render scene stepped across the mesh 'sp' axis:
spatial strips with ghost-halo exchange + ownership migration, pose
all_gather, framebuffer row strips (scx.parallel.bigscene).

On the single-chip driver machine the mesh degenerates to sp=1 (the
scaling baseline, still through shard_map + the strip renderer); on a pod
slice the same script splits both the bodies and the rows for real.

Scene: S strips x B boxes settling on ground slabs, 1280x768 frame.
Prints BENCH_JSON with steps/s (sim+render frames per second).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from scx import physics as ph
from scx import render as rd
from scx.parallel import bigscene as bg
from scx.parallel.mesh import make_mesh


def main():
    n_dev = len(jax.devices())
    sp = int(os.environ.get("SP", str(n_dev)))
    width = 48.0                      # strip width (m)
    n_local = int(os.environ.get("NL", "512"))  # bodies per strip
    W, H = 1280, 768
    mesh = make_mesh(dp=1, sp=sp)

    rng = np.random.RandomState(5)

    def strip_bodies(k):
        x0 = k * width
        pos = [[x0 + width / 2, -0.55, 0.0]]
        size = [[width / 2, 0.05, 60.0]]
        bt = [ph.rigid.BODY_STATIC]
        for _ in range(n_local - 1):
            pos.append([
                x0 + rng.uniform(1, width - 1),
                rng.uniform(0.5, 6.0),
                rng.uniform(-50, 50),
            ])
            size.append([0.5, 0.5, 0.5])
            bt.append(ph.rigid.BODY_DYNAMIC)
        return ph.make_bodies(
            jnp.asarray(pos, jnp.float32),
            size=jnp.asarray(size, jnp.float32),
            body_type=jnp.asarray(bt, jnp.int32),
        )

    sharded = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[strip_bodies(k) for k in range(sp)]
    )

    params = ph.SolverParams(max_pairs=512, iterations=6)
    raster = rd.RasterParams(
        width=W, height=H, max_tris=65536, max_clusters_per_tile=128,
        min_area2=0.25, interpret=jax.default_backend() == "cpu",
    )
    vp = rd.camera_view_proj(
        jnp.asarray([sp * width / 2, 30.0, 90.0]),
        jnp.asarray([sp * width / 2, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=W / H,
    )
    step = bg.make_bigscene_step(
        mesh, params, raster, x0=0.0, shard_width=width,
        halo=3.0, halo_cap=64, mig_cap=32,
    )

    t0 = time.time()
    out, rgb, stats = step(sharded, vp)
    jax.block_until_ready(rgb)
    print("compile+first: %.1f s" % (time.time() - t0), flush=True)
    print("bodies:", sp * n_local, "active:", int(stats["active"]),
          "tris:", int(stats["tris_in"]),
          "overflow:", int(stats["tile_overflow"]), flush=True)

    # device-chained measurement (per-call timing through the tunnel is
    # untrustworthy, CLAUDE.md trap 10): N steps inside one shard_map scan
    N = int(os.environ.get("ITERS", "20"))
    chain = bg.make_bigscene_chain(
        mesh, params, raster, x0=0.0, shard_width=width,
        n_steps=N, halo=3.0, halo_cap=64, mig_cap=32,
    )
    out2, cstats = chain(out, vp)
    jax.block_until_ready(cstats["rgb_sum"])  # compile + warm
    if jax.default_backend() != "cpu":
        time.sleep(60)  # let the remote compile service go quiet (trap 9b)
    t0 = time.time()
    out2, cstats = chain(out, vp)
    jax.block_until_ready(cstats["rgb_sum"])
    dt = (time.time() - t0) / N
    print("step: %.2f ms -> %.1f steps/s (sp=%d, %d bodies/strip, %dx%d)"
          % (dt * 1e3, 1 / dt, sp, n_local, W, H), flush=True)
    print("BENCH_JSON " + json.dumps({
        "metric": "bigscene_sim_render_steps_per_sec",
        "value": round(1 / dt, 1), "unit": "steps/s",
        "vs_baseline": round((1 / dt) / 60.0, 3), "sp": sp,
        "bodies": sp * n_local,
    }), flush=True)

    arr = np.clip(np.asarray(rgb) * 255, 0, 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save("/tmp/bigscene.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
