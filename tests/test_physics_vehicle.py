"""Raycast vehicle: suspension holds the chassis, throttle accelerates,
steering turns, handbrake reduces rear grip."""

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
