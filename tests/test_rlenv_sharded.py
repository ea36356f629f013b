"""Env-sharded rollout: the shard_map('dp') path must reproduce the
unsharded vmap rollout bitwise (per-env math is untouched by placement)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scx.app.rlenv import CityRLEnv
from scx.parallel.mesh import make_mesh

ENVS = 8
ACTIONS = np.tile(
    np.asarray([0.6, 0.0, 0.05, 0.0], np.float32), (ENVS, 1)
)


def _make_env():
    return CityRLEnv(
        n_envs=ENVS, capacity=96, obs_size=32, n_traffic=4, interpret=True
    )


@pytest.mark.slow
def test_sharded_rollout_matches_vmap_bitwise():
    ref = _make_env()
    obs_ref, rew_ref = ref.rollout(ACTIONS, length=3)

    env = _make_env()
    mesh = make_mesh(dp=4, sp=2)
    (obs_sh, rew_sh), stats = env.rollout_sharded(ACTIONS, length=3, mesh=mesh)

    np.testing.assert_array_equal(np.asarray(obs_ref), np.asarray(obs_sh))
    np.testing.assert_array_equal(np.asarray(rew_ref), np.asarray(rew_sh))
    # psum'd fleet telemetry covers every shard
    alive_ref = int(jnp.sum(ref.state.alive))
    assert int(stats["alive"]) == alive_ref
    assert np.isfinite(float(stats["reward_sum"]))
    # state advanced identically too
    np.testing.assert_array_equal(
        np.asarray(ref.state.transform.pos), np.asarray(env.state.transform.pos)
    )


def test_sharded_rollout_state_stays_sharded():
    env = _make_env()
    mesh = make_mesh(dp=8, sp=1)
    env.rollout_sharded(ACTIONS, length=1, mesh=mesh)
    spec = env.state.alive.sharding.spec
    assert spec and spec[0] == "dp"
    # second call reuses the compiled fn (same mesh+length key)
    compiled = env._rollout_sharded_jit
    env.rollout_sharded(ACTIONS, length=1, mesh=mesh)
    assert env._rollout_sharded_jit is compiled
