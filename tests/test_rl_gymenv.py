"""CityVectorEnv: the gymnasium-style vector-env protocol adapter."""

import numpy as np

from scx.app.rlenv import CityRLEnv
from scx.rl import CityVectorEnv


def _wrapped(**kw):
    kw.setdefault("n_envs", 2)
    kw.setdefault("capacity", 48)
    kw.setdefault("obs_size", 16)
    kw.setdefault("n_traffic", 2)
    kw.setdefault("interpret", True)
    steps = kw.pop("max_episode_steps", 3)
    return CityVectorEnv(CityRLEnv(**kw), max_episode_steps=steps)


def test_protocol_state_mode():
    env = _wrapped(obs_mode="state", max_episode_steps=2)
    obs, info = env.reset()
    assert obs.shape == (2, 16) and isinstance(info, dict)
    obs, rew, term, trunc, info = env.step(np.zeros((2, 4)))
    assert obs.shape == (2, 16) and rew.shape == (2,)
    assert not term.any() and not trunc.any()
    assert "nan_rollbacks" in info
    # time limit
    obs, rew, term, trunc, info = env.step(np.zeros((2, 4)))
    assert trunc.all() and not term.any()
    # reset clears the clock
    env.reset()
    _, _, _, trunc, _ = env.step(np.zeros((2, 4)))
    assert not trunc.any()


def test_action_clipping_and_multiagent_shapes():
    env = _wrapped(obs_mode="state", n_agents=2)
    assert env.action_shape == (2, 4) and env.obs_shape == (2, 16)
    # out-of-range actions clip to the documented bounds (no NaN physics)
    obs, rew, *_ = env.step(np.full((2, 2, 4), 9.0))
    assert rew.shape == (2, 2)
    assert np.isfinite(np.asarray(obs)).all()


def test_render_rgb_array():
    env = _wrapped(obs_mode="state")
    frame = env.render()
    assert frame.shape == (16, 16, 3) and frame.dtype == np.uint8
