"""RL env batch stepping + checkpoint roundtrip + job system."""

import pytest
import numpy as np

from scx.app.checkpoint import load_checkpoint, save_checkpoint
from scx.app.rlenv import CityRLEnv
from scx.core.jobs import JobSystem
from scx.state import entity as ent


def test_rlenv_steps_and_renders():
    env = CityRLEnv(n_envs=4, capacity=96, obs_size=32, n_traffic=4, interpret=True)
    actions = np.tile(np.asarray([[0.8, 0.0, 0.1, 0.0]], np.float32), (4, 1))
    obs, reward = env.step(actions)
    for _ in range(5):
        obs, reward = env.step(actions)
    assert obs.shape == (4, 32, 32, 4)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.asarray(obs)[..., 0:3].std() > 0.01  # scene visible
    assert reward.shape == (4,)
    # envs differ (different procedural seeds)
    assert np.abs(np.asarray(obs[0]) - np.asarray(obs[1])).max() > 0.01


@pytest.mark.slow
def test_rlenv_deterministic():
    e1 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    e2 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    a = np.tile(np.asarray([[0.5, 0.0, -0.2, 0.0]], np.float32), (2, 1))
    o1, r1 = e1.step(a)
    o2, r2 = e2.step(a)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_checkpoint_roundtrip(tmp_path):
    state = ent.alloc_entity_state(64)
    state = state.replace(
        alive=state.alive.at[:5].set(True),
        transform=state.transform.replace(
            pos=state.transform.pos.at[2].set(np.asarray([1.0, 2.0, 3.0]))
        ),
    )
    path = str(tmp_path / "ckpt" / "sim")
    assert save_checkpoint(path, state, extra={"frame": 42})
    out = load_checkpoint(path)
    assert out is not None
    restored, extra = out
    assert extra["frame"] == 42
    np.testing.assert_array_equal(np.asarray(restored.alive), np.asarray(state.alive))
    np.testing.assert_allclose(
        np.asarray(restored.transform.pos), np.asarray(state.transform.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.traffic.mode), np.asarray(state.traffic.mode)
    )


def test_job_system():
    js = JobSystem(workers=2)
    acc = np.zeros(100, np.int64)

    def work(i):
        acc[i] = i * i

    js.dispatch(100, 16, work)
    np.testing.assert_array_equal(acc, np.arange(100) ** 2)

    fut = js.dispatch_async(lambda: 41 + 1)
    assert fut.result() == 42
    stats = js.begin_frame()
    assert stats.dispatched > 0 and stats.async_jobs == 1
    js.shutdown()


@pytest.mark.slow
def test_rlenv_rollout_matches_stepping():
    """Device-chained rollout == the same number of host step() calls."""
    import numpy as np

    e1 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    e2 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    acts = np.tile(np.asarray([[0.8, 0.0, 0.1, 0.0]], np.float32), (2, 1))
    rews = []
    for _ in range(3):
        obs, rew = e1.step(acts)
        rews.append(np.asarray(rew))
    obs_means, roll_rews = e2.rollout(acts, length=3)
    np.testing.assert_allclose(
        np.stack(rews), np.asarray(roll_rews), rtol=1e-5, atol=1e-6
    )
    # final states identical
    np.testing.assert_allclose(
        np.asarray(e1.state.transform.pos), np.asarray(e2.state.transform.pos),
        rtol=1e-5, atol=1e-6,
    )
    assert obs_means.shape == (3, 2)


@pytest.mark.slow
def test_rlenv_rollout_chunked_matches_single_launch():
    """Chunked device launches (watchdog guard) == one long launch."""
    import numpy as np

    e1 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    e2 = CityRLEnv(n_envs=2, capacity=96, obs_size=32, n_traffic=2, interpret=True)
    acts = np.tile(np.asarray([[0.8, 0.0, 0.1, 0.0]], np.float32), (2, 1))
    m1, r1 = e1.rollout(acts, length=5)          # single launch (default)
    m2, r2 = e2.rollout(acts, length=5, chunk=2)  # launches of 2+2+1
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(e1.state.transform.pos), np.asarray(e2.state.transform.pos),
        rtol=1e-5, atol=1e-6,
    )
