"""BASELINE config #5: vectorized sim-for-RL envs with scripted traffic and
RGB-D observations, one chip.

Reports env-steps/sec for the FULL loop (physics + traffic AI + 128x128
RGB-D render per env per step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    # BASELINE config #5 default scale: 4096 envs x 128x128 RGB-D
    n_envs = int(os.environ.get("RL_ENVS", "4096"))
    obs_size = int(os.environ.get("RL_OBS", "128"))
    static_bake = os.environ.get("RL_STATIC_BAKE", "1") == "1"  # A/B 2026-08-19: +32% @1024
    # RL_OBS_MODE=state: 16-float state vectors instead of pixels (no
    # raster at all) — the algorithm-prototyping/training-throughput shape
    obs_mode = os.environ.get("RL_OBS_MODE", "rgbd")
    from scx.app.rlenv import CityRLEnv

    t0 = time.time()
    env = CityRLEnv(
        n_envs=n_envs, capacity=160, obs_size=obs_size, n_traffic=8,
        interpret=False, static_bake=static_bake, obs_mode=obs_mode,
    )
    print(
        f"built {n_envs} envs in {time.time()-t0:.1f}s"
        + (" (static bake)" if static_bake else "")
        + (" (state obs)" if obs_mode == "state" else ""),
        flush=True,
    )

    import jax.numpy as jnp

    def force(out):
        # HOST READ of a device scalar: block_until_ready can phantom-
        # return on the axon backend (CLAUDE.md quirk 12)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    fast = os.environ.get("SCX_BENCH_FAST", "0") == "1"  # driver budget mode
    actions = np.tile(np.asarray([[0.7, 0.0, 0.1, 0.0]], np.float32), (n_envs, 1))
    steps = 10
    if not fast:
        t0 = time.time()
        obs, rew = env.step(actions)
        force(obs)
        print(f"compile+first step {time.time()-t0:.1f}s; obs {obs.shape}", flush=True)

        t0 = time.time()
        for _ in range(steps):
            obs, rew = env.step(actions)
        force(obs)
        dt = time.time() - t0
        rate = n_envs * steps / dt
        obs_desc = (
            "state-vector obs" if obs_mode == "state"
            else f"{obs_size}x{obs_size} RGB-D"
        )
        print(
            f"{rate:,.0f} env-steps/s with {obs_desc} "
            f"({steps} steps x {n_envs} envs in {dt:.2f}s, obs to host each step)",
            flush=True,
        )

    # device-resident rollout: obs consumed on chip (policy-on-chip shape)
    aux = env.rollout(actions, length=steps)
    force(aux)
    # Run a SECOND untimed rollout: the warm call's chunker starts cold and
    # picks small launch lengths; once its duration estimate converges it
    # chooses BIGGER chunk lengths the warm call never compiled, and a
    # remote compile landing inside the measured call reads 100-1000x slow
    # (this — not a "poisoned chunker" — was the r3/r4 421-vs-3186 anomaly;
    # resetting env._chunker made it worse by forcing the re-learn into the
    # measured call). The convergence call compiles every length the
    # measured calls will use.
    aux = env.rollout(actions, length=steps)
    force(aux)
    # quiet the remote compile service before measuring (CLAUDE.md trap 10b)
    if jax.default_backend() != "cpu":
        time.sleep(45)  # in the gate's FAST mode too: contamination is
        # exactly what made the r3 gate read low (trap 10b)
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        aux = env.rollout(actions, length=steps)
        force(aux)  # timed region ends with a host read (quirk 12)
        dt = min(dt, time.time() - t0)
    rate = n_envs * steps / dt
    print(
        f"{rate:,.0f} env-steps/s device-chained (obs consumed on device)",
        flush=True,
    )
    import json

    print(
        "BENCH_JSON "
        + json.dumps(
            {
                "metric": f"rl_env_steps_per_sec_{n_envs}x{obs_size}"
                + ("_state" if obs_mode == "state" else ""),
                "value": round(rate, 1),
                "unit": "env_steps/s",
                # config #5 sets scale, not a rate target; report vs the
                # round-1 measured 794 steps/s at 1024 envs as the baseline
                "vs_baseline": round(rate / 794.0, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
