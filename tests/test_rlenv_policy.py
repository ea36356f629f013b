"""Policy-in-the-loop rollout + REINFORCE training step.

Covers CityRLEnv.make_policy_rollout: on-device policy application inside
the rollout scan, gradients through the policy only (actions are
stop_gradient'ed into the sim), and an optimizer update on the example's
conv policy (examples/train_reinforce.py).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from train_reinforce import policy_apply, policy_init


def test_policy_score_function_gradients():
    """The REINFORCE estimator needs d(logp)/d(mean) != 0: the log-density
    is evaluated at the stopped sample as a function of the params (logp of
    the noise alone is constant in the torso — the classic silent-zero-grad
    bug)."""
    params = policy_init(jax.random.PRNGKey(0), 16)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 4))

    actions, logp = policy_apply(params, obs, jax.random.PRNGKey(2))
    assert actions.shape == (4, 4) and logp.shape == (4,)
    a = np.asarray(actions)
    assert (a[:, 0] >= 0).all() and (a[:, 0] <= 1).all()  # throttle range
    assert (np.abs(a[:, 2]) <= 1).all()                   # steer range

    def loss(p):
        _, lp = policy_apply(p, obs, jax.random.PRNGKey(2))
        return jnp.sum(lp * jnp.arange(4.0))  # fake returns

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    # the conv torso must receive signal, not just log_std
    assert float(jnp.abs(grads["conv1"]).max()) > 0
    assert float(jnp.abs(grads["head"]).max()) > 0


@pytest.mark.slow
def test_policy_rollout_train_step():
    """Full loop: rollout scan with the policy on device, REINFORCE loss,
    adam update — params move, state advances, everything finite."""
    import optax

    from scx.app.rlenv import CityRLEnv

    env = CityRLEnv(n_envs=4, capacity=32, obs_size=16, n_traffic=2)
    L = 3
    params = policy_init(jax.random.PRNGKey(0), 16)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rollout = env.make_policy_rollout(policy_apply, L)

    # seed the player with forward speed: from rest, a random policy's
    # throttle and brake cancel for the first steps and every reward is
    # EXACTLY zero — a zero REINFORCE loss has zero gradients by
    # construction, which is correct but tests nothing
    s0 = env.state
    s0 = s0.replace(
        body=s0.body.replace(
            vel=s0.body.vel.at[:, env.player, 2].set(5.0)
        )
    )

    def loss_fn(p, batch, cache, key):
        batch, cache, (rews, logps, means) = rollout(batch, cache, p, key)
        rets = jnp.cumsum(rews[::-1], axis=0)[::-1]
        loss = -jnp.mean(logps * jax.lax.stop_gradient(rets))
        return loss, (batch, cache, rews, logps, means)

    @jax.jit
    def train_step(p, o, batch, cache, key):
        (loss, (batch, cache, rews, logps, means)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, batch, cache, key)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, batch, cache, loss, rews, logps, grads

    p1, opt_state, batch, cache, loss, rews, logps, grads = train_step(
        params, opt_state, s0, env.cache, jax.random.PRNGKey(3)
    )
    assert rews.shape == (L, 4) and logps.shape == (L, 4)
    assert np.isfinite(np.asarray(rews)).all()
    assert np.isfinite(np.asarray(logps)).all()
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    changed = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0, params, p1)
    assert any(jax.tree.leaves(changed)), "optimizer step must move params"
    # the sim advanced under the policy's (stopped) actions: the throttle
    # moved the player from rest in at least one env
    assert float(jnp.abs(batch.body.vel).max()) > 0


@pytest.mark.slow
def test_sharded_train_step_runs_on_mesh():
    """DP training over the virtual 8-device mesh: envs shard over 'dp',
    params replicate, gradients pmean — one step runs, moves params, and
    keeps every per-device shard of the state consistent."""
    import optax

    from scx.app.rlenv import CityRLEnv
    from train_reinforce import make_sharded_train_step

    from scx.parallel.mesh import make_mesh

    # dp=4 with 16 envs -> 4 envs per shard: the per-shard mean baseline
    # needs >1 env per chip or the advantage is identically zero
    env = CityRLEnv(n_envs=16, capacity=32, obs_size=16, n_traffic=2)
    params = policy_init(jax.random.PRNGKey(0), 16)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    train_step, place = make_sharded_train_step(
        env, policy_apply, 2, opt, mesh=make_mesh(dp=4)
    )

    # per-env DIFFERENT forward speeds: identical rewards across a shard
    # make the centered advantage exactly zero (no signal to test)
    s0 = env.state
    speeds = jnp.linspace(1.0, 8.0, 16)
    s0 = s0.replace(
        body=s0.body.replace(vel=s0.body.vel.at[:, env.player, 2].set(speeds))
    )
    batch, cache = place(s0), place(env.cache)
    p1, opt_state, batch, cache, loss, ep_rew = train_step(
        params, opt_state, batch, cache, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss)) and np.isfinite(float(ep_rew))
    changed = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0, params, p1)
    assert any(jax.tree.leaves(changed)), "sharded step must move params"
    # params stay replicated (a single consistent value post-update)
    assert np.isfinite(np.asarray(jax.device_get(p1["head"]))).all()
    assert batch.alive.shape[0] == 16
