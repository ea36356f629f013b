"""Generalized advantage estimation as a reverse lax.scan.

The recurrence delta_t + (gamma*lam) * A_{t+1} is inherently sequential in
time but embarrassingly parallel over the env fleet, so the scan carries
whole [N] rows — one fused elementwise op per step, nothing per-env.

The city envs are continuing (no terminations — a crashed car keeps
collecting negative reward), so the default has no done-mask; pass
`dones` when wrapping an episodic task to zero the bootstrap across
boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(
    rewards,
    values,
    last_value,
    gamma: float = 0.99,
    lam: float = 0.95,
    dones=None,
):
    """Compute GAE advantages and value targets.

    Args:
      rewards: [L, N] per-step rewards.
      values: [L, N] value predictions at each step's observation.
      last_value: [N] bootstrap value of the post-rollout observation.
      dones: optional [L, N] float/bool, 1 where the step ENDED an episode
        (the bootstrap through that boundary is masked out).

    Returns:
      (advantages [L, N], returns [L, N]) with returns = adv + values
      (the value-loss regression target).
    """
    rewards = jnp.asarray(rewards)
    values = jnp.asarray(values)
    if dones is None:
        nonterm = jnp.ones_like(rewards)
    else:
        nonterm = 1.0 - jnp.asarray(dones, rewards.dtype)

    def body(carry, xs):
        next_value, next_adv = carry
        r, v, nt = xs
        delta = r + gamma * next_value * nt - v
        adv = delta + gamma * lam * next_adv * nt
        return (v, adv), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.asarray(last_value), jnp.zeros_like(last_value)),
        (rewards, values, nonterm),
        reverse=True,
    )
    return advs, advs + values
