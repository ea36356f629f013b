"""scx.rl: GAE recurrence vs a naive host loop, clipped-PPO loss
semantics, and the end-to-end train step (single-device and mesh-sharded)
on a tiny CityRLEnv."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
    ),
)

from scx.rl import PPOConfig, gae, make_ppo_train_step, ppo_loss


def _gae_numpy(rew, val, last_val, gamma, lam, dones=None):
    L, N = rew.shape
    adv = np.zeros((L, N), np.float32)
    next_adv = np.zeros(N, np.float32)
    next_val = last_val.copy()
    for t in range(L - 1, -1, -1):
        nt = 1.0 if dones is None else 1.0 - dones[t]
        delta = rew[t] + gamma * next_val * nt - val[t]
        next_adv = delta + gamma * lam * next_adv * nt
        adv[t] = next_adv
        next_val = val[t]
    return adv, adv + val


def test_gae_matches_naive_loop():
    rng = np.random.default_rng(0)
    L, N = 7, 5
    rew = rng.normal(size=(L, N)).astype(np.float32)
    val = rng.normal(size=(L, N)).astype(np.float32)
    last = rng.normal(size=N).astype(np.float32)
    adv, ret = gae(rew, val, last, gamma=0.97, lam=0.9)
    adv_np, ret_np = _gae_numpy(rew, val, last, 0.97, 0.9)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_np, rtol=1e-5, atol=1e-5)


def test_gae_done_mask_blocks_bootstrap():
    L, N = 4, 2
    rew = np.ones((L, N), np.float32)
    val = np.zeros((L, N), np.float32)
    last = np.full(N, 100.0, np.float32)  # huge bootstrap value
    dones = np.zeros((L, N), np.float32)
    dones[-1] = 1.0  # episode ends at the last step
    adv, _ = gae(rew, val, last, gamma=0.99, lam=0.95, dones=dones)
    adv_np, _ = _gae_numpy(rew, val, last, 0.99, 0.95, dones)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5)
    # the 100.0 bootstrap must not leak through the done boundary
    assert float(jnp.max(jnp.abs(adv))) < 10.0


def _toy_apply(params, store):
    """1-param policy: logp = theta * store rows; constant value/entropy."""
    logp = params["theta"] * store["x"]
    value = jnp.zeros_like(logp)
    entropy = jnp.zeros_like(logp)
    return logp, value, entropy


def test_ppo_loss_clips_gradient():
    """Once the ratio exceeds 1+eps with positive advantage, the policy
    gradient through that row must vanish (the clip branch is constant in
    params) — the property that distinguishes PPO from vanilla PG."""
    cfg = PPOConfig(clip_eps=0.2, vf_coef=0.0, ent_coef=0.0)
    store = {"x": jnp.ones((4,))}
    mb = {
        "store": store,
        "logp_old": jnp.zeros((4,)),
        "adv": jnp.ones((4,)),
        "ret": jnp.zeros((4,)),
    }

    # theta=0 -> ratio=1, unclipped: gradient flows
    g_in = jax.grad(lambda p: ppo_loss(p, _toy_apply, mb, cfg)[0])(
        {"theta": jnp.asarray(0.0)}
    )
    assert abs(float(g_in["theta"])) > 1e-6

    # theta=0.5 -> ratio=e^0.5 ~ 1.65 > 1.2 with adv>0: clipped, zero grad
    g_out = jax.grad(lambda p: ppo_loss(p, _toy_apply, mb, cfg)[0])(
        {"theta": jnp.asarray(0.5)}
    )
    assert abs(float(g_out["theta"])) < 1e-8

    # but with NEGATIVE advantage the same ratio must still pass gradient
    # (min(unclipped, clipped) keeps the unclipped branch)
    mb_neg = dict(mb, adv=-jnp.ones((4,)))
    g_neg = jax.grad(lambda p: ppo_loss(p, _toy_apply, mb_neg, cfg)[0])(
        {"theta": jnp.asarray(0.5)}
    )
    assert abs(float(g_neg["theta"])) > 1e-6


def test_ppo_loss_metrics():
    cfg = PPOConfig()
    store = {"x": jnp.asarray([1.0, -1.0, 0.5, 0.0])}
    mb = {
        "store": store,
        "logp_old": jnp.zeros((4,)),
        "adv": jnp.asarray([1.0, -1.0, 0.0, 2.0]),
        "ret": jnp.asarray([0.5, 0.5, 0.5, 0.5]),
    }
    loss, metrics = ppo_loss({"theta": jnp.asarray(0.3)}, _toy_apply, mb, cfg)
    assert np.isfinite(float(loss))
    for k in ("policy_loss", "value_loss", "entropy", "clip_frac"):
        assert np.isfinite(float(metrics[k])), k
    assert 0.0 <= float(metrics["clip_frac"]) <= 1.0


def _tiny_env():
    from scx.app.rlenv import CityRLEnv

    return CityRLEnv(n_envs=8, capacity=32, obs_size=16, n_traffic=2)


@pytest.mark.slow
def test_ppo_train_step_end_to_end():
    """Trajectory rollout through the real engine step + 2x2 minibatch
    epochs + adam: params move, metrics finite, env state advances."""
    import optax

    from train_ppo import ac_apply, actor_critic, net_init

    env = _tiny_env()
    params = net_init(jax.random.PRNGKey(0), 16)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    cfg = PPOConfig(epochs=2, minibatches=2)
    train_step, place = make_ppo_train_step(
        env, actor_critic, ac_apply, 4, opt, cfg
    )
    batch, cache = place(env.state), place(env.cache)

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    pos0 = np.asarray(batch.transform.pos)
    params, opt_state, batch, cache, metrics = train_step(
        params, opt_state, batch, cache, jax.random.PRNGKey(1)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # the shared torso and BOTH heads must have been updated
    for leaf in ("conv1", "pi_head", "v_head"):
        assert float(np.abs(np.asarray(params[leaf]) - p0[leaf]).max()) > 0
    # env state advanced under the policy's actions
    assert float(np.abs(np.asarray(batch.transform.pos) - pos0).max()) > 0

    # second call reuses the jit cache (no retrace errors) and stays finite
    params, opt_state, batch, cache, metrics = train_step(
        params, opt_state, batch, cache, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_ppo_train_step_sharded():
    """The same train step under shard_map over the 8-device CPU mesh:
    envs shard over 'dp', params replicate, gradients pmean — metrics
    finite, params identical across shards (replicated), state sharded."""
    import optax

    from scx.parallel.mesh import make_mesh
    from train_ppo import ac_apply, actor_critic, net_init

    env = _tiny_env()
    mesh = make_mesh(dp=4, sp=2)
    params = net_init(jax.random.PRNGKey(0), 16)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    cfg = PPOConfig(epochs=2, minibatches=2)
    train_step, place = make_ppo_train_step(
        env, actor_critic, ac_apply, 4, opt, cfg, mesh=mesh
    )
    batch, cache = place(env.state), place(env.cache)
    # envs shard over ALL mesh axes (no idle 'sp' lanes)
    spec = batch.alive.sharding.spec
    assert spec and spec[0] == ("dp", "sp")

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    params, opt_state, batch, cache, metrics = train_step(
        params, opt_state, batch, cache, jax.random.PRNGKey(1)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(np.abs(np.asarray(params["conv1"]) - p0["conv1"]).max()) > 0
    # state stayed sharded through the step
    spec = batch.alive.sharding.spec
    assert spec and spec[0] == ("dp", "sp")


@pytest.mark.slow
def test_ppo_train_step_sharded_static_bake():
    """Sharded PPO with the static-bake env: the baked columns thread
    through train_step as an explicit sharded argument (a closure capture
    would replicate them and break the per-shard vmap)."""
    import optax

    from scx.app.rlenv import CityRLEnv
    from scx.parallel.mesh import make_mesh
    from train_ppo import ac_apply, actor_critic, net_init

    env = CityRLEnv(
        n_envs=8, capacity=32, obs_size=16, n_traffic=2,
        interpret=True, static_bake=True,
    )
    mesh = make_mesh(dp=4, sp=2)
    params = net_init(jax.random.PRNGKey(0), 16)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    cfg = PPOConfig(epochs=1, minibatches=2)
    train_step, place = make_ppo_train_step(
        env, actor_critic, ac_apply, 4, opt, cfg, mesh=mesh
    )
    batch, cache, baked = place(env.state), place(env.cache), place(env.baked)
    assert baked.sharding.spec[0] == ("dp", "sp")

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    params, opt_state, batch, cache, metrics = train_step(
        params, opt_state, batch, cache, jax.random.PRNGKey(1), baked
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(np.abs(np.asarray(params["conv1"]) - p0["conv1"]).max()) > 0
