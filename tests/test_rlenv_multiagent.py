"""CityRLEnv state observations + multi-agent control (opt-in surface:
obs_mode="state", n_agents=K). The default rgbd/1-agent paths are pinned
by test_rlenv*.py; these tests cover the new modes and their interplay."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scx.app.rlenv import CityRLEnv


def _env(**kw):
    kw.setdefault("n_envs", 4)
    kw.setdefault("capacity", 64)
    kw.setdefault("obs_size", 32)
    kw.setdefault("n_traffic", 4)
    kw.setdefault("interpret", True)
    return CityRLEnv(**kw)


def test_state_obs_single_agent_shapes_and_finiteness():
    env = _env(obs_mode="state")
    assert env.reset().shape == (4, env.STATE_OBS_DIM)
    obs, rew = env.step(np.tile(np.asarray([0.8, 0, 0, 0], np.float32), (4, 1)))
    assert obs.shape == (4, env.STATE_OBS_DIM)
    assert rew.shape == (4,)
    o = np.asarray(obs)
    assert np.isfinite(o).all()
    # nearest-mover distance (col 14) within clamp; ray (col 15) within len
    assert (o[:, 14] <= 50.0).all() and (o[:, 14] >= 0.0).all()
    assert (o[:, 15] <= env._RAY_LEN).all() and (o[:, 15] > 0.0).all()


def test_state_obs_guidance_matches_lane_graph():
    """The lane-guidance terms are the AI's own queries: recompute them
    directly from the lane arrays for agent 0 and compare."""
    from scx.traffic import lanes as ln

    env = _env(obs_mode="state")
    obs, _ = env.step(np.zeros((4, 4), np.float32))
    s0 = jax.tree.map(lambda a: a[0], env.state)
    p = s0.transform.pos[env.player]
    lid, ls, _ = ln.nearest_lane(env.lanes, p)
    tgt, _, ok = ln.look_ahead_point(env.lanes, lid, ls, jnp.float32(8.0))
    want = np.asarray((tgt - p))[[0, 2]]
    got = np.asarray(obs)[0, 9:11]
    assert bool(ok)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multiagent_distinct_controls_distinct_rewards():
    """Agent 0 throttles, agents 1-2 brake: only agent 0 progresses, and
    each agent's reward tracks ITS own car."""
    env = _env(obs_mode="state", n_agents=3)
    acts = np.zeros((4, 3, 4), np.float32)
    acts[:, 0, 0] = 1.0  # agent 0: full throttle
    acts[:, 1:, 1] = 1.0  # others: full brake
    pos0 = np.asarray(env.state.transform.pos)[:, np.asarray(env.agent_slots)]
    rew = None
    for _ in range(30):
        obs, rew = env.step(acts)
    assert obs.shape == (4, 3, env.STATE_OBS_DIM)
    assert rew.shape == (4, 3)
    pos1 = np.asarray(env.state.transform.pos)[:, np.asarray(env.agent_slots)]
    moved = np.linalg.norm((pos1 - pos0)[..., (0, 2)], axis=-1)
    assert (moved[:, 0] > 0.3).all(), moved  # throttled car drove
    assert (moved[:, 1:] < 0.1).all(), moved  # braked cars held still
    r = np.asarray(rew)
    assert (r[:, 0] > r[:, 1:].max(axis=-1)).all()


def test_multiagent_rgbd_per_agent_cameras():
    """K>1 rgbd: [N,K,H,W,4], one chase camera per agent, and each
    agent's image matches the single-camera render from its own pose to
    fp-association noise (the K views fold into the batched raster's env
    axis; the inner vmap over slots refuses bitwise identity by ~1 ulp)."""
    env = _env(n_agents=2)
    assert env.reset().shape == (4, 2, 32, 32, 4)
    obs, rew = env.step(np.zeros((4, 2, 4), np.float32))
    assert obs.shape == (4, 2, 32, 32, 4)
    assert rew.shape == (4, 2)
    # reference: render the SAME post-step state once per agent slot via
    # the single-camera path (independent N-wide batched raster calls)
    from scx.render.pipeline import raster_gbuffer_batched

    for j in range(2):
        slot = env.agent_slots[j]
        setup, aabb, valid = jax.jit(
            jax.vmap(lambda s: env._render_one(s, slot))
        )(env.state)
        g, _ = raster_gbuffer_batched(setup, aabb, valid, env.raster)
        want = np.asarray(
            jnp.concatenate([g["color"], g["depth"][..., None]], axis=-1)
        )
        np.testing.assert_allclose(
            np.asarray(obs)[:, j], want, atol=1e-5
        )
    # the two views differ (cameras sit behind different cars)
    assert not np.array_equal(np.asarray(obs)[:, 0], np.asarray(obs)[:, 1])


def test_multiagent_rgbd_static_bake_matches_full_path():
    """K>1 rgbd composes with static_bake: baked scenery + per-agent
    cameras equals the unbaked path per agent."""
    env = _env(n_agents=2)
    envb = _env(n_agents=2, static_bake=True)
    acts = np.zeros((4, 2, 4), np.float32)
    acts[:, :, 0] = 0.7
    for _ in range(2):
        obs, _ = env.step(acts)
        obsb, _ = envb.step(acts)
    # 2e-2 is the established bake-vs-full image tolerance
    # (tests/test_render_staticbake.py): projection association differs
    np.testing.assert_allclose(
        np.asarray(obs), np.asarray(obsb), atol=2e-2
    )


def test_state_obs_policy_rollout_trains_shape():
    """make_policy_rollout composes with state obs (the cheap-training
    shape): one REINFORCE-style gradient step runs and is finite."""
    from scx.app.rlenv import squash_raw_actions

    env = _env(obs_mode="state")
    rollout = env.make_policy_rollout(
        lambda params, obs, key: (
            squash_raw_actions(obs @ params),
            jnp.zeros(obs.shape[0]),
        ),
        length=2,
    )
    params = jnp.zeros((env.STATE_OBS_DIM, 4))

    def loss(p, b, c, k):
        _, _, (rew, logp, _) = rollout(b, c, p, k)
        return -jnp.mean(rew) + 0.0 * jnp.mean(logp)

    g = jax.jit(jax.grad(loss))(
        params, env.state, env.cache, jax.random.PRNGKey(0)
    )
    assert np.isfinite(np.asarray(g)).all()


def test_multiagent_shared_policy_rollout_grad():
    """A SHARED policy over per-agent state obs ([N,K,S] -> [N,K,4])
    composes with make_policy_rollout; the REINFORCE-style gradient is
    finite. squash_raw_actions handles the extra agent axis."""
    from scx.app.rlenv import squash_raw_actions

    env = _env(obs_mode="state", n_agents=2)

    def policy(params, obs, key):
        raw = obs @ params  # [N,K,4]
        return squash_raw_actions(raw), jnp.sum(raw, axis=-1)

    rollout = env.make_policy_rollout(policy, length=2)
    params = jnp.zeros((env.STATE_OBS_DIM, 4))

    def loss(p, b, c, k):
        _, _, (rew, logp, _) = rollout(b, c, p, k)
        return -jnp.mean(rew * jax.lax.stop_gradient(jnp.ones_like(rew))) + 1e-3 * jnp.mean(logp**2)

    g = jax.jit(jax.grad(loss))(
        params, env.state, env.cache, jax.random.PRNGKey(0)
    )
    assert np.isfinite(np.asarray(g)).all()


def test_rollout_state_mode_means():
    env = _env(obs_mode="state", n_agents=2)
    acts = np.zeros((4, 2, 4), np.float32)
    obs_means, rewards = env.rollout(acts, length=3)
    assert np.asarray(obs_means).shape == (3, 4)
    assert np.asarray(rewards).shape == (3, 4, 2)
    assert np.isfinite(np.asarray(obs_means)).all()


def test_agents_stay_on_ground_at_max_count():
    """All 8 agents spawn ON the sector's ground slab: a single-file
    spawn column walked off the slab at z<0 and the tail cars fell
    through the world (review finding, 2026-08-19)."""
    env = _env(obs_mode="state", n_agents=8, capacity=96)
    acts = np.zeros((4, 8, 4), np.float32)
    for _ in range(40):
        _obs, _rew = env.step(acts)
    ys = np.asarray(env.state.transform.pos)[:, np.asarray(env.agent_slots), 1]
    assert (ys > -0.2).all(), ys  # resting on the slab, not sunk below it


def test_ppo_train_step_multiagent_state():
    """PPO consumes the multi-agent state mode end-to-end: [L,N,K] rows
    flatten to agent-steps, the MLP heads broadcast over the agent axis,
    and one train step yields finite metrics."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
    )
    import optax
    from train_ppo import state_ac_apply, state_actor_critic, state_net_init

    from scx.rl import PPOConfig, make_ppo_train_step

    env = _env(obs_mode="state", n_agents=2)
    params = state_net_init(jax.random.PRNGKey(0), env.STATE_OBS_DIM)
    opt = optax.adam(1e-3)
    train_step, place = make_ppo_train_step(
        env, state_actor_critic, state_ac_apply, 2, opt,
        PPOConfig(epochs=1, minibatches=2),
    )
    params, opt_state, batch, cache, metrics = train_step(
        params, opt.init(params), place(env.state), place(env.cache),
        jax.random.PRNGKey(1),
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    # the identity-mesh place() COPIES: the env's own state stays usable
    # after the donated train step
    obs, rew = env.step(np.zeros((4, 2, 4), np.float32))
    assert rew.shape == (4, 2)


@pytest.mark.slow
def test_sharded_rollout_multiagent_state_bitwise():
    """rollout_sharded composes with n_agents + state obs: bitwise equal
    to the unsharded rollout (per-env math untouched by placement)."""
    from scx.parallel.mesh import make_mesh

    acts = np.zeros((8, 2, 4), np.float32)
    acts[:, 0, 0] = 0.7

    ref = _env(n_envs=8, obs_mode="state", n_agents=2)
    obs_ref, rew_ref = ref.rollout(acts, length=2)

    env = _env(n_envs=8, obs_mode="state", n_agents=2)
    mesh = make_mesh(dp=4, sp=2)
    (obs_sh, rew_sh), stats = env.rollout_sharded(acts, length=2, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(obs_ref), np.asarray(obs_sh))
    np.testing.assert_array_equal(np.asarray(rew_ref), np.asarray(rew_sh))
    assert int(stats["alive"]) == int(jnp.sum(ref.state.alive))


def test_bad_args_rejected():
    with pytest.raises(ValueError):
        _env(obs_mode="pixels")
    with pytest.raises(ValueError):
        _env(n_agents=0)
