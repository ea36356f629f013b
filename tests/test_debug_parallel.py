"""Debug draw overlay + parallel mesh/sharding utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from scx import render as rd
from scx.parallel import make_mesh, psum_stats, replicate, shard_env_batch
from scx.render.debug_draw import DebugDraw, overlay_lines


def test_debug_draw_accumulator():
    dd = DebugDraw(capacity=1024)
    dd.add_grid(half=8.0, step=4.0)
    dd.add_aabb((-1, -1, -1), (1, 1, 1))
    n_grid = (2 * 2 + 1) * 2 + 3  # lines + axes
    assert dd.count == n_grid + 12
    p0, p1, color, valid = dd.arrays()
    assert int(valid.sum()) == dd.count
    dd.clear()
    assert dd.count == 0


def test_overlay_lines_renders():
    dd = DebugDraw(capacity=64)
    dd.add_line((-1.0, 0.0, -5.0), (1.0, 0.0, -5.0), (0.0, 1.0, 0.0))
    vp = rd.camera_view_proj(
        jnp.zeros(3), jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray([0.0, 1.0, 0.0]),
        aspect=2.0,
    )
    rgb = jnp.zeros((64, 128, 3))
    depth = jnp.ones((64, 128))
    p0, p1, color, valid = dd.arrays()
    out = overlay_lines(rgb, depth, vp, p0, p1, color, valid)
    arr = np.asarray(out)
    assert (arr[..., 1] > 0.5).sum() > 10  # green pixels appeared
    # depth test: line hidden behind scene depth 0 stays invisible
    out2 = overlay_lines(rgb, jnp.zeros((64, 128)), vp, p0, p1, color, valid)
    assert (np.asarray(out2)[..., 1] > 0.5).sum() == 0


def test_mesh_and_sharding():
    mesh = make_mesh(dp=4, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    batch = {"x": jnp.arange(8.0).reshape(8, 1)}
    sharded = shard_env_batch(batch, mesh)
    assert sharded["x"].sharding.spec[0] == "dp"
    rep = replicate({"w": jnp.ones(3)}, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_psum_stats_in_shard_map():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=8, sp=1)
    x = jnp.arange(16.0)

    def local(x):
        return psum_stats({"total": jnp.sum(x)}, axis_names=("dp",))

    out = jax.jit(
        shard_map(local, mesh=mesh, in_specs=(P("dp"),), out_specs=P(),
                  check_vma=False)
    )(x)
    assert float(out["total"]) == float(jnp.sum(x))
