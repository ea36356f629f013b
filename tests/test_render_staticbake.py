"""Static-geometry bake (scx.render.staticbake): the baked obs path must
render the same image as the full cull/emit/setup path.

Baked statics project world-space columns by one viewProj; the unbaked
path computes (viewProj @ model) @ vertex — different fp association, so
equivalence is near-exact, not bitwise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scx.app.rlenv import CityRLEnv


def _mk_env(static_bake, **kw):
    return CityRLEnv(
        n_envs=2,
        capacity=48,
        obs_size=32,
        n_traffic=2,
        interpret=True,
        static_bake=static_bake,
        **kw,
    )


def test_static_mask_partitions_entities():
    from scx.render import staticbake as sb

    env = _mk_env(True)
    state0 = jax.tree.map(lambda x: x[0], env.state)
    mask = np.asarray(sb.static_entity_mask(state0))
    alive = np.asarray(state0.alive)
    renderable = alive & (np.asarray(state0.render.mesh_id) >= 0)
    # statics + dynamics cover every renderable entity exactly once
    dyn = renderable & ~mask
    assert (mask | dyn).sum() == renderable.sum()
    assert not (mask & dyn).any()
    # the dynamic handful fits the emit budget
    assert dyn.sum() <= env._dyn_budget


def test_baked_width_is_exact():
    from scx.render import staticbake as sb

    env = _mk_env(True)
    totals = jax.vmap(lambda s: sb.static_tri_total(s, env.pool))(env.state)
    t_s = env._params_static.max_tris - env._params_static.effective_clip_extra
    assert int(jnp.max(totals)) <= t_s
    # live flags in the bake agree with the per-env totals
    live = np.asarray(env.baked[:, 25, :]).sum(axis=1)
    np.testing.assert_array_equal(live, np.asarray(totals, np.float32))


def test_baked_obs_matches_full_path():
    env_a = _mk_env(False)
    env_b = _mk_env(True)

    obs_a = jax.jit(env_a._render_obs_batched)(env_a.state)
    obs_b = jax.jit(env_b._render_obs_batched)(env_b.state, env_b.baked)
    a, b = np.asarray(obs_a), np.asarray(obs_b)
    # same coverage (identical triangles binned, modulo fp association)
    assert (a[..., 3] < 1.0).sum() == pytest.approx(
        (b[..., 3] < 1.0).sum(), rel=0.02
    )
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_render_frame_baked_matches_render_frame():
    """Single-scene path: render_frame_baked (pre-baked statics + empty
    dynamic list) pixel-matches render_frame on a small city chunk through
    the cluster rasterizer."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from cityscene import build_city_mesh
    from scx import render as rd
    from scx.render import pipeline as pipe
    from scx.render import staticbake as sb
    from scx.render.mesh import build_mesh_pool

    verts, tris = build_city_mesh(grid=2, subdiv=1, ground=2, seed=7)
    pool = build_mesh_pool([(verts, tris)])
    params = rd.RasterParams(
        width=128, height=64, tile_h=16, tile_w=64,
        max_tris=max(256, -(-len(tris) // 128) * 128),
        max_tris_per_tile=128, max_clusters_per_tile=32,
        use_clusters=True, interpret=True, clip_extra=64,
    )
    draws = rd.DrawList(
        mesh_id=jnp.zeros((1,), jnp.int32),
        material_id=jnp.zeros((1,), jnp.int32),
        model=jnp.eye(4)[None], valid=jnp.ones((1,), bool),
    )
    vp = rd.camera_view_proj(
        jnp.asarray([3.0, 2.0, 4.0]), jnp.asarray([0.0, 1.0, -10.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=2.0,
    )
    rgb_a, g_a, _ = jax.jit(
        lambda: pipe.render_frame(draws, pool, vp, params)
    )()

    t_s = -(-len(tris) // 128) * 128
    baked = jax.jit(lambda d: sb.bake_draws(d, pool, t_s, morton=False))(draws)
    no_dyn = rd.DrawList(
        mesh_id=jnp.zeros((1,), jnp.int32),
        material_id=jnp.zeros((1,), jnp.int32),
        model=jnp.eye(4)[None], valid=jnp.zeros((1,), bool),
    )
    dyn_params = params.replace(max_tris=64, clip_extra=32)
    rgb_b, g_b, _ = jax.jit(
        lambda: pipe.render_frame_baked(
            baked, no_dyn, pool, vp, params, dyn_params
        )
    )()
    np.testing.assert_allclose(
        np.asarray(g_a["depth"]), np.asarray(g_b["depth"]), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=2e-2)


@pytest.mark.slow
def test_sandbox_baked_render_matches():
    """Sandbox static-bake path: on the SAME streamed state, the baked
    render pixel-matches the full path, and streaming activity marks the
    bake dirty so the next frame rebakes."""
    import time as _t

    from scx.app.sandbox import Sandbox
    from scx.render import RasterParams

    sb = Sandbox(
        capacity=512,
        raster=RasterParams(
            width=96, height=48, tile_h=16, tile_w=32,
            max_tris=8192, max_tris_per_tile=128, max_clusters_per_tile=64,
            use_clusters=True, interpret=True, clip_extra=128,
        ),
        static_bake=True,
    )
    try:
        for _ in range(12):
            rgb_baked, _ = sb.frame(player_input=(0.4, 0.0, 0.1, 0.0))
            _t.sleep(0.01)
        assert sb._baked is not None and sb._bake_tris >= 4096
        # render the same state through BOTH paths
        textures = sb.assets.device_pool_mips()
        rgb_a, stats_a, depth_a, _ = sb._render(
            sb.state, sb.cam_pos, sb._cam_target, sb._cam_fov,
            sb.assets.device_materials(), textures,
        )
        if sb._bake_dirty:
            sb._rebake_static()
        rgb_b, stats_b, depth_b, _ = sb._render_baked(
            sb.state, sb._baked, sb.cam_pos, sb._cam_target, sb._cam_fov,
            sb.assets.device_materials(), textures,
        )
        np.testing.assert_allclose(
            np.asarray(depth_a), np.asarray(depth_b), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(rgb_a), np.asarray(rgb_b), atol=2e-2
        )
        # streaming activity drives a REAL rebake: teleport the player two
        # sectors away so the active set changes, then run frames through
        # the scheduler until the rebake lands
        rebakes0 = sb._rebake_count
        far = sb.state.transform.pos.at[sb.player_slot].set(
            jnp.asarray([3.0 * 64.0, 0.6, 3.0 * 64.0])
        )
        sb.state = sb.state.replace(
            transform=sb.state.transform.replace(pos=far)
        )
        for _ in range(20):
            sb.frame(player_input=(0.0, 0.0, 0.0, 0.0))
            _t.sleep(0.02)
            if sb._rebake_count > rebakes0:
                break
        assert sb._rebake_count > rebakes0
    finally:
        sb.shutdown()


@pytest.mark.slow
def test_baked_step_trajectory_matches():
    env_a = _mk_env(False)
    env_b = _mk_env(True)
    actions = np.tile(np.asarray([0.8, 0.0, 0.2, 0.0], np.float32), (2, 1))
    for i in range(5):
        obs_a, rew_a = env_a.step(actions)
        obs_b, rew_b = env_b.step(actions)
        np.testing.assert_allclose(
            np.asarray(rew_a), np.asarray(rew_b), atol=1e-5, err_msg=f"step {i}"
        )
        np.testing.assert_allclose(
            np.asarray(obs_a), np.asarray(obs_b), atol=2e-2, err_msg=f"step {i}"
        )
