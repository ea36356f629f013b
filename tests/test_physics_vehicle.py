"""Raycast vehicle: suspension holds the chassis, throttle accelerates,
steering turns, handbrake reduces rear grip."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scx import physics as ph
from scx.physics import vehicle as vh


def car_scene():
    """Ground + one chassis box (2x1x4 half ext 1.0,0.5,2.0) like the demo car
    (sc_vehicle.cpp:436-501 spawns 1200kg car)."""
    params = vh.VehicleParams()
    pos = jnp.asarray([[0.0, -0.55, 0.0], [0.0, 0.5, 0.0]])
    bodies = ph.make_bodies(
        pos,
        size=jnp.asarray([[64.0, 0.05, 64.0], [1.0, 0.5, 2.0]]),
        body_type=jnp.asarray([ph.rigid.BODY_STATIC, ph.rigid.BODY_DYNAMIC], jnp.int32),
        mass=jnp.asarray([0.0, params.mass]),
        ang_damping=jnp.asarray([0.0, 0.5]),
    )
    wheels = vh.default_wheel_configs(jnp.asarray([1.0, 0.5, 2.0]), params)
    return bodies, wheels, params


def drive(bodies, wheels, params, engine, brake, steer, hb, steps, dt=1.0 / 60.0):
    solver = ph.SolverParams(max_pairs=8, dt=dt)

    def step(b, _):
        dv, dw, rt = vh.vehicle_forces(
            b, 1, wheels, engine, brake, steer, hb, params, dt
        )
        b = b.replace(
            vel=b.vel.at[1].add(dv),
            omega=b.omega.at[1].add(dw),
        )
        b = ph.step_bodies(b, solver)
        return b, rt

    return jax.lax.scan(step, bodies, None, length=steps)


def test_suspension_supports_car():
    bodies, wheels, params = car_scene()
    out, rt = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        bodies, wheels, params, 0.0, 0.0, 0.0, 0.0, 240
    )
    y = float(out.pos[1, 1])
    # equilibrium: per wheel force = stiffness*compression*mass, 4 wheels
    # carry m g  =>  compression = g/(4*stiffness) ~ 0.123, susp_len ~ 0.227.
    # hardpoint y = center - 0.15; ground top at -0.5; wheel ray t =
    # radius + susp_len  =>  center ~ -0.5 + 0.15 + 0.35 + 0.227 ~ 0.227
    assert 0.12 < y < 0.34, y
    assert bool(jnp.all(rt.in_contact[-1]))
    assert abs(float(out.vel[1, 1])) < 0.1


def test_throttle_accelerates_forward():
    bodies, wheels, params = car_scene()
    out, _ = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        bodies, wheels, params, 8000.0, 0.0, 0.0, 0.0, 120
    )
    v = np.asarray(out.vel[1])
    assert v[2] > 3.0, v     # +Z is forward
    assert abs(v[0]) < 0.5


def test_brake_stops_car():
    bodies, wheels, params = car_scene()
    mid, _ = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        bodies, wheels, params, 8000.0, 0.0, 0.0, 0.0, 120
    )
    out, _ = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        mid, wheels, params, 0.0, 12000.0, 0.0, 0.0, 180
    )
    assert abs(float(out.vel[1, 2])) < 0.3


@pytest.mark.slow
def test_steering_turns():
    bodies, wheels, params = car_scene()
    mid, _ = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        bodies, wheels, params, 8000.0, 0.0, 0.0, 0.0, 90
    )
    out, _ = jax.jit(drive, static_argnums=(3, 4, 5, 6, 7))(
        mid, wheels, params, 4000.0, 0.0, 0.3, 0.0, 180
    )
    v = np.asarray(out.vel[1])
    # steering 0.3 rad left (about +Y axis with +Z fwd -> -X?) just check turn
    assert abs(v[0]) > 0.5  # gained lateral velocity component
    assert abs(float(out.omega[1, 1])) > 0.05  # yawing


def test_smooth_controls_mapping():
    params = vh.VehicleParams()
    sm = jnp.zeros(4)
    raw = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    dt = 1.0 / 60.0
    for _ in range(300):
        sm, engine, brake, steer, hb = vh.smooth_controls(sm, raw, params, 0.0, dt)
    # converged: full throttle -> engine force, steer -> max angle at v=0
    assert abs(float(engine) - params.engine_force) < 1e-2
    assert abs(float(steer) - params.max_steer) < 1e-3
    # at max speed the steer limit drops to 20%
    _, engine2, _, steer2, _ = vh.smooth_controls(
        sm, raw, params, params.max_speed + 1.0, dt
    )
    assert float(engine2) == 0.0  # cutoff above max speed
    assert abs(float(steer2) - params.max_steer * 0.2) < 0.01


def test_per_vehicle_tuning_columns():
    """Per-entity tuning columns drive the solver: a car tuned with double
    engine force (set_vehicle_tuning, updateVehicleTuning parity
    sc_physics.cpp:970-1013) pulls ahead of a stock one in the SAME jitted
    step — no recompile for live tuning."""
    from scx.app.sandbox import spawn_player_vehicle
    from scx.physics.world import physics_sync_step
    from scx.state import entity as ent

    st = ent.alloc_entity_state(16)
    st = st.replace(
        alive=st.alive.at[0].set(True),
        components=st.components.at[0].set(
            ent.C_TRANSFORM | ent.C_COLLIDER | ent.C_RIGID_BODY
        ),
        transform=st.transform.replace(
            pos=st.transform.pos.at[0].set(jnp.asarray([0.0, -0.55, 0.0]))
        ),
        body=st.body.replace(
            body_type=st.body.body_type.at[0].set(ent.BODY_STATIC),
            half_extents=st.body.half_extents.at[0].set(
                jnp.asarray([64.0, 0.05, 64.0])
            ),
        ),
    )
    st = spawn_player_vehicle(st, 1, pos=(-4.0, 0.6, 0.0))
    st = spawn_player_vehicle(st, 2, pos=(4.0, 0.6, 0.0))
    # car 2 governed to 6 m/s (engine cutoff above max_speed)
    st = vh.set_vehicle_tuning(st, 2, vh.VehicleParams(max_speed=6.0))

    inp = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    st = st.replace(
        vehicle=st.vehicle.replace(
            input=st.vehicle.input.at[1].set(inp).at[2].set(inp)
        )
    )

    from scx.physics.world import empty_sync_cache

    dt = 1.0 / 60.0
    solver = ph.SolverParams(max_pairs=128, dt=dt)
    step = jax.jit(
        lambda s, c: physics_sync_step(s, solver, vh.VehicleParams(), dt, c)[:2]
    )
    cache = empty_sync_cache(solver.max_pairs)
    for _ in range(150):
        st, cache = step(st, cache)

    v1 = float(st.body.vel[1, 2])
    v2 = float(st.body.vel[2, 2])
    assert v1 > 10.0, v1          # stock car well past the governed speed
    assert v2 < 7.5, v2           # governed car capped near its max_speed
    assert float(st.transform.pos[1, 2]) > 0.5

    # live re-tune back to stock flows through without recompile
    st = vh.set_vehicle_tuning(st, 2, vh.VehicleParams())
    st, cache = step(st, cache)
    assert float(vh.tuning_gather(st.vehicle, 2).engine_force) == 8000.0


def test_vehicle_slot_cap_equivalence():
    """A right-sized vehicle slot cap (physics: right-sized vehicle slot
    capacity) must produce the same step as the full 32-slot default when
    it covers every vehicle: the slots are a pure gather set."""
    import numpy as np

    from scx.physics.world import physics_sync_step
    from scx.physics.world import empty_sync_cache
    from scx.app.sandbox import spawn_player_vehicle
    from scx import state as st

    n = 48
    s = st.alloc_entity_state(n)
    # ground + two vehicles at scattered slots
    s = s.replace(
        alive=s.alive.at[0].set(True),
        body=s.body.replace(
            body_type=s.body.body_type.at[0].set(st.BODY_STATIC),
            half_extents=s.body.half_extents.at[0].set(
                jnp.asarray([32.0, 0.1, 32.0])
            ),
        ),
        transform=s.transform.replace(
            pos=s.transform.pos.at[0].set(jnp.asarray([0.0, -0.1, 0.0]))
        ),
    )
    s = spawn_player_vehicle(s, 7, pos=(0.0, 0.6, 0.0))
    s = spawn_player_vehicle(s, 41, pos=(6.0, 0.6, 0.0))
    s = s.replace(
        vehicle=s.vehicle.replace(
            input=s.vehicle.input.at[7].set(jnp.asarray([0.8, 0.0, 0.2, 0.0]))
            .at[41].set(jnp.asarray([0.5, 0.0, -0.1, 0.0]))
        )
    )
    solver = ph.SolverParams(max_pairs=64, iterations=4)
    dt = 1.0 / 60.0

    def run(mv, ss):
        cache = empty_sync_cache(solver.max_pairs)
        f = jax.jit(
            lambda x, c: physics_sync_step(
                x, solver, vh.VehicleParams(), dt, c, max_vehicles=mv
            )[:2]
        )
        for _ in range(30):
            ss, cache = f(ss, cache)
        return ss

    out_small = run(6, s)    # covers both vehicles with margin
    out_full = run(32, s)    # the old fixed default
    for a, b in zip(jax.tree.leaves(out_small), jax.tree.leaves(out_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
    # and the vehicles actually drove
    assert float(out_full.body.vel[7, 2]) > 0.5
