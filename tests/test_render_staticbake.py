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
