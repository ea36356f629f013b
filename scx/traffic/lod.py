"""Traffic simulation LOD — the reference's 3-tier degradation strategy as a
single masked pass.

Reference semantics (sc_traffic_lod.cpp): desired tier by 2D distance to the
player with hysteresis bands (A enter 50 / exit 70, B enter 110 / exit 150,
sc_traffic_common.h:70-73); per-tier caps demote the FARTHEST agents first
(24 physics / 64 kinematic, :360-417); agents beyond the total cap are
despawned farthest-first, OnRails before Kinematic before Physics (:419-466).
Component add/remove (applyMode, :193-257) becomes a mode column switch: the
mode selects which update path touches the agent and whether its body joins
the physics set.

Sort-based rank enforcement replaces the reference's per-agent demotion
loops: one sort per tier, fixed shapes, no branches.
"""

from __future__ import annotations

import jax.numpy as jnp

from scx.core import math3d as m3
from scx.core.config import TrafficConfig
from scx.state.entity import (
    EntityState,
    TRAFFIC_KINEMATIC,
    TRAFFIC_NONE,
    TRAFFIC_ONRAILS,
    TRAFFIC_PHYSICS,
    BODY_DYNAMIC,
    BODY_KINEMATIC,
    BODY_NONE,
    C_VEHICLE,
    C_VEHICLE_INPUT,
)


def _rank_within(mask, key):
    """Rank of each True element among True elements ordered by key asc."""
    big = jnp.inf
    k = jnp.where(mask, key, big)
    order = jnp.argsort(k)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return rank  # valid only where mask


def traffic_lod_update(state: EntityState, player_pos, cfg: TrafficConfig):
    """Returns (state', despawn_mask)."""
    tr = state.traffic
    is_agent = state.alive & (tr.mode >= 0)
    d2 = m3.dot(
        (state.transform.pos - player_pos) * jnp.asarray([1.0, 0.0, 1.0]),
        (state.transform.pos - player_pos) * jnp.asarray([1.0, 0.0, 1.0]),
    )
    dist = jnp.sqrt(d2)

    cur = tr.mode
    # hysteresis per band (enter when closer than enter, keep until exit)
    want_a = jnp.where(
        cur == TRAFFIC_PHYSICS, dist < cfg.tier_a_exit, dist < cfg.tier_a_enter
    )
    in_b_band = jnp.where(
        cur <= TRAFFIC_KINEMATIC, dist < cfg.tier_b_exit, dist < cfg.tier_b_enter
    )
    desired = jnp.where(
        want_a, TRAFFIC_PHYSICS, jnp.where(in_b_band, TRAFFIC_KINEMATIC, TRAFFIC_ONRAILS)
    )

    # tier caps: farthest-first demotion via distance rank
    a_mask = is_agent & (desired == TRAFFIC_PHYSICS)
    a_rank = _rank_within(a_mask, dist)
    demote_a = a_mask & (a_rank >= cfg.max_vehicles_physics)
    desired = jnp.where(demote_a, TRAFFIC_KINEMATIC, desired)

    b_mask = is_agent & (desired == TRAFFIC_KINEMATIC)
    b_rank = _rank_within(b_mask, dist)
    demote_b = b_mask & (b_rank >= cfg.max_vehicles_kinematic)
    desired = jnp.where(demote_b, TRAFFIC_ONRAILS, desired)

    # total cap: despawn farthest, OnRails first then Kinematic then Physics
    # (key = tier_class * 1e6 + dist so higher tiers survive longer)
    tier_class = jnp.where(
        desired == TRAFFIC_ONRAILS, 2.0,
        jnp.where(desired == TRAFFIC_KINEMATIC, 1.0, 0.0),
    )
    total_rank = _rank_within(is_agent, tier_class * 1.0e6 + dist)
    despawn = is_agent & (total_rank >= cfg.max_vehicles_total)

    new_mode = jnp.where(is_agent & ~despawn, desired, tr.mode)

    # mode -> physics participation (applyMode component swaps, :193-257)
    body_type = jnp.where(
        is_agent & ~despawn,
        jnp.where(
            new_mode == TRAFFIC_PHYSICS,
            BODY_DYNAMIC,
            jnp.where(new_mode == TRAFFIC_KINEMATIC, BODY_KINEMATIC, BODY_NONE),
        ),
        state.body.body_type,
    )
    # promoted-to-A agents start from rest with the chassis mass
    newly_a = is_agent & (new_mode == TRAFFIC_PHYSICS) & (cur != TRAFFIC_PHYSICS)
    vel = jnp.where(newly_a[:, None], 0.0, state.body.vel)
    omega = jnp.where(newly_a[:, None], 0.0, state.body.omega)

    # tier A = full raycast vehicle (applyMode adds VehicleComponent +
    # VehicleInput, sc_traffic_lod.cpp:193-257): toggle the component bits
    # and lay wheels out from the collider extents with the traffic
    # suspension offset (sc_vehicle.cpp:266-304, traffic branch)
    is_a_now = is_agent & ~despawn & (new_mode == TRAFFIC_PHYSICS)
    # agents hold the vehicle bits only while tier A; non-agents (the
    # player's car) are untouched
    comp = jnp.where(
        is_agent,
        jnp.where(
            is_a_now,
            state.components | jnp.uint32(C_VEHICLE | C_VEHICLE_INPUT),
            state.components & ~jnp.uint32(C_VEHICLE | C_VEHICLE_INPUT),
        ),
        state.components,
    )
    he = state.body.half_extents
    hx = jnp.maximum(0.2, he[:, 0])
    hy = jnp.maximum(0.2, he[:, 1])
    hz = jnp.maximum(0.4, he[:, 2])
    wv = state.vehicle
    wheel_x = hx - 0.25 * 0.5  # wheel width default (sc_ecs.h:130)
    wheel_y = -hy + wv.wheel_radius - wv.susp_rest
    front_z = hz - wv.wheel_radius * 0.5
    rear_z = -hz + wv.wheel_radius * 0.5
    conn = jnp.stack(
        [
            jnp.stack([-wheel_x, wheel_y, front_z], -1),
            jnp.stack([wheel_x, wheel_y, front_z], -1),
            jnp.stack([-wheel_x, wheel_y, rear_z], -1),
            jnp.stack([wheel_x, wheel_y, rear_z], -1),
        ],
        axis=1,
    )  # [N,4,3]
    wheel_conn = jnp.where(newly_a[:, None, None], conn, wv.wheel_conn)

    state = state.replace(
        components=comp,
        traffic=tr.replace(mode=new_mode),
        body=state.body.replace(body_type=body_type, vel=vel, omega=omega),
        vehicle=wv.replace(
            wheel_conn=wheel_conn,
            smoothed=jnp.where(newly_a[:, None], 0.0, wv.smoothed),
        ),
    )
    return state, despawn


def tier_counts(state: EntityState):
    """Telemetry: totals per tier (TrafficDebugState counters)."""
    tr = state.traffic
    is_agent = state.alive & (tr.mode >= 0)
    return {
        "total": jnp.sum(is_agent.astype(jnp.int32)),
        "physics": jnp.sum((is_agent & (tr.mode == TRAFFIC_PHYSICS)).astype(jnp.int32)),
        "kinematic": jnp.sum(
            (is_agent & (tr.mode == TRAFFIC_KINEMATIC)).astype(jnp.int32)
        ),
        "onrails": jnp.sum((is_agent & (tr.mode == TRAFFIC_ONRAILS)).astype(jnp.int32)),
        # stuck monitor (sc_traffic_ai.cpp:396-424: wants >2 m/s, moving
        # <0.2 m/s for over a second)
        "stuck": jnp.sum((is_agent & (tr.stuck_timer > 1.0)).astype(jnp.int32)),
    }
