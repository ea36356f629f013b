"""Vectorized RL environment — BASELINE config #5: thousands of vmapped city
envs with scripted traffic, RGB-D observations per step.

Each env is an independent city scene (per-env procedural sector via the
hash-compatible generator, so env i is deterministic in (seed, i)): player
vehicle driven by continuous actions, OnRails traffic agents following the
lane graph, physics at a fixed dt, and a 128x128 (configurable) RGB-D render
through the batched Pallas rasterizer.

The whole step — physics, traffic, render — is ONE jitted function over the
batch; sharding the env axis over a mesh (scx.parallel) scales it across
chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scx.app.sandbox import SimParams, make_sim_tick, spawn_player_vehicle
from scx.core import math3d as m3
from scx.core.config import EngineConfig, WorldPartitionConfig
from scx.render import RasterParams
from scx.render.camera import CameraParams, camera_view_proj_from_pose
from scx.render.mesh import build_mesh_pool
from scx.render.pipeline import bin_triangles, setup_triangles
from scx.ops.raster import rasterize_tiles_batched
from scx.state import entity as ent
from scx.traffic.lanes import LaneGraphBuilder
from scx.world import procgen
from scx.world.culling import cull_entities, emit_draws


class CityRLEnv:
    """Batched sim-for-RL env. Actions: [N,4] (throttle, brake, steer,
    handbrake); observations: RGB-D [N,H,W,4]."""

    def __init__(
        self,
        n_envs: int,
        capacity: int = 160,
        obs_size: int = 128,
        n_traffic: int = 8,
        seed: int = 1337,
        substeps: int = 1,
        interpret: bool | None = None,
    ):
        self.n_envs = n_envs
        self.capacity = capacity
        cfg = EngineConfig()
        self.cfg = cfg
        self.raster = RasterParams(
            width=obs_size,
            height=obs_size,
            tile_h=16,
            tile_w=128,
            max_tris=4096,
            max_tris_per_tile=128,
            interpret=(
                interpret
                if interpret is not None
                else jax.default_backend() == "cpu"
            ),
        )
        self.pool = build_mesh_pool()
        self.sim = SimParams()
        self._tick = make_sim_tick(cfg, self.sim, max_substeps=substeps)
        self.substeps = substeps
        self.seed = seed
        self.n_traffic = n_traffic
        self.player = capacity - 1

        # lanes shared across envs (every env uses sector (0,0)'s cross)
        lanes = LaneGraphBuilder(max_nodes=64, max_segments=32)
        lanes.build_procedural_for_sector((0, 0), (0.0, 0.0, 0.0), (64.0, 0.0, 64.0))
        self._lane_builder = lanes
        self.lanes = lanes.to_arrays()

        self._step_jit = jax.jit(self._step_impl)
        self.state = self._build_batch()

    # ------------------------------------------------------------------
    def _build_env(self, env_idx: int) -> ent.EntityState:
        cfg = WorldPartitionConfig(seed=self.seed + env_idx)
        state = ent.alloc_entity_state(self.capacity)
        recs = procgen.generate_sector_spawns(cfg, 0, 0)
        arrs = procgen.spawns_to_arrays(recs)
        k = len(recs)
        rot = np.zeros((k, 4), np.float32)
        rot[:, 0] = np.cos(arrs["rot"][:, 1] * 0.5)
        rot[:, 2] = np.sin(arrs["rot"][:, 1] * 0.5)
        state = state.replace(
            alive=state.alive.at[:k].set(True),
            transform=state.transform.replace(
                pos=state.transform.pos.at[:k].set(jnp.asarray(arrs["pos"])),
                rot=state.transform.rot.at[:k].set(jnp.asarray(rot)),
                scale=state.transform.scale.at[:k].set(jnp.asarray(arrs["scale"])),
            ),
            render=state.render.replace(
                mesh_id=state.render.mesh_id.at[:k].set(0),
                material_id=state.render.material_id.at[:k].set(0),
            ),
            body=state.body.replace(
                body_type=state.body.body_type.at[:k].set(ent.BODY_STATIC),
                half_extents=state.body.half_extents.at[:k].set(
                    jnp.asarray(arrs["scale"]) * 0.5
                ),
            ),
        )
        # traffic agents spread along the lanes
        segs = self._lane_builder.sector_segments[(0, 0)]
        for i in range(self.n_traffic):
            slot = k + i
            lane = segs[i % len(segs)]
            seg = self._lane_builder.segments[lane]
            s0 = 6.0 + 7.0 * i
            p = np.asarray(self._lane_builder.nodes[seg["start"]]["pos"]) + np.asarray(
                seg["dir"]
            ) * (s0 % max(seg["length"], 1.0))
            state = state.replace(
                alive=state.alive.at[slot].set(True),
                transform=state.transform.replace(
                    pos=state.transform.pos.at[slot].set(
                        jnp.asarray([p[0], 0.35, p[2]])
                    ),
                    scale=state.transform.scale.at[slot].set(
                        jnp.asarray([1.8, 1.2, 4.2])
                    ),
                ),
                traffic=state.traffic.replace(
                    mode=state.traffic.mode.at[slot].set(ent.TRAFFIC_ONRAILS),
                    lane_id=state.traffic.lane_id.at[slot].set(lane),
                    lane_s=state.traffic.lane_s.at[slot].set(
                        s0 % max(seg["length"], 1.0)
                    ),
                ),
                render=state.render.replace(
                    mesh_id=state.render.mesh_id.at[slot].set(0),
                    material_id=state.render.material_id.at[slot].set(0),
                ),
            )
        state = spawn_player_vehicle(state, self.player, pos=(32.0, 0.6, 16.0))
        return state

    def _build_batch(self):
        envs = [self._build_env(i) for i in range(self.n_envs)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *envs)

    # ------------------------------------------------------------------
    def _render_one(self, state):
        """Chase-view RGB-D for one env (camera behind the player)."""
        ppos = state.transform.pos[self.player]
        prot = state.transform.rot[self.player]
        fwd = m3.quat_rotate(prot, jnp.asarray([0.0, 0.0, 1.0]))
        fwd = m3.safe_normalize(
            fwd * jnp.asarray([1.0, 0.0, 1.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        cam_pos = ppos - fwd * 7.0 + jnp.asarray([0.0, 3.0, 0.0])
        # look-at via pose: build quaternion-free viewProj
        from scx.render.camera import camera_view_proj

        vp = camera_view_proj(
            cam_pos,
            ppos + jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]),
            aspect=1.0,
            params=CameraParams(fov_y_deg=70.0),
        )
        visible, mats = cull_entities(state, vp)
        draws = emit_draws(state, visible, mats, 256)
        setup, aabb, valid = setup_triangles(draws, self.pool, vp, self.raster)
        binned, counts = bin_triangles(setup, aabb, valid, self.raster)
        return binned, counts

    def _step_impl(self, batch, actions):
        def env_step(state, action):
            state, _, _ = self._tick(
                state, self.lanes, self.player, action, jnp.int32(self.substeps)
            )
            return state

        batch = jax.vmap(env_step)(batch, actions)
        binned, counts = jax.vmap(self._render_one)(batch)
        g = rasterize_tiles_batched(binned, counts, self.raster)
        obs = jnp.concatenate([g["color"], g["depth"][..., None]], axis=-1)
        # reward: forward progress of the player (m per step)
        fwd_speed = jax.vmap(
            lambda s: m3.dot(
                s.body.vel[self.player],
                m3.quat_rotate(
                    s.transform.rot[self.player], jnp.asarray([0.0, 0.0, 1.0])
                ),
            )
        )(batch)
        reward = fwd_speed * (self.cfg.physics.fixed_dt * self.substeps)
        return batch, obs, reward

    # ------------------------------------------------------------------
    def reset(self):
        self.state = self._build_batch()
        obs = np.zeros(
            (self.n_envs, self.raster.height, self.raster.width, 4), np.float32
        )
        return obs

    def step(self, actions):
        """actions [N,4] -> (obs [N,H,W,4], reward [N])."""
        self.state, obs, reward = self._step_jit(
            self.state, jnp.asarray(actions, jnp.float32)
        )
        return obs, reward
