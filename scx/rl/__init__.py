"""On-device RL training over the batched city envs (beyond-parity: the
reference engine has no training story). REINFORCE lives in
examples/train_reinforce.py as a worked loop; the reusable pieces —
GAE and clipped PPO with a mesh-data-parallel train step — live here."""

from scx.rl.gae import gae
from scx.rl.gymenv import CityVectorEnv
from scx.rl.ppo import PPOConfig, make_ppo_train_step, ppo_loss

__all__ = [
    "gae", "CityVectorEnv", "PPOConfig", "make_ppo_train_step", "ppo_loss",
]
