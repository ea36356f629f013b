"""Physics correctness: integration, contacts, stacking, friction,
restitution, vmap equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from scx import physics as ph


def make_ground_scene(extra_pos, extra_kw=None, n_pad=0):
    """Static ground slab (64 x 0.1 x 64 like the reference sectors) + bodies."""
    extra_kw = extra_kw or {}
    k = extra_pos.shape[0]
    n = 1 + k + n_pad
    pos = jnp.zeros((n, 3)).at[0, 1].set(-0.55)
    pos = pos.at[1 : 1 + k].set(extra_pos)
    size = jnp.full((n, 3), 0.5).at[0].set(jnp.asarray([32.0, 0.05, 32.0]))
    body_type = jnp.full((n,), ph.rigid.BODY_DYNAMIC, jnp.int32).at[0].set(
        ph.rigid.BODY_STATIC
    )
    active = jnp.ones((n,), bool)
    if n_pad:
        active = active.at[1 + k :].set(False)
    kw = dict(size=size, body_type=body_type, active=active)
    kw.update(extra_kw)
    return ph.make_bodies(pos, **kw)


def run_steps(bodies, params, steps):
    def body_fn(b, _):
        return ph.step_bodies(b, params), None

    out, _ = jax.lax.scan(body_fn, bodies, None, length=steps)
    return out


def test_free_fall():
    b = ph.make_bodies(jnp.asarray([[0.0, 100.0, 0.0]]))
    p = ph.SolverParams(max_pairs=4)
    steps = 60
    out = jax.jit(run_steps, static_argnums=2)(b, p, steps)
    # semi-implicit Euler: y = y0 - g*dt^2*(1+2+...+n) = y0 - g dt^2 n(n+1)/2
    dt = p.dt
    expected = 100.0 - 9.81 * dt * dt * steps * (steps + 1) / 2
    assert abs(float(out.pos[0, 1]) - expected) < 1e-3


def test_box_rests_on_ground():
    b = make_ground_scene(jnp.asarray([[0.0, 0.501, 0.0]]))
    p = ph.SolverParams(max_pairs=8)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 120)
    # box half-extent 0.5 on ground top (y=-0.5): rest center y ~ 0.0
    assert abs(float(out.pos[1, 1]) - 0.0) < 0.02
    assert float(jnp.abs(out.vel[1]).max()) < 0.05


def test_dropped_box_settles():
    b = make_ground_scene(jnp.asarray([[0.0, 2.0, 0.0]]))
    p = ph.SolverParams(max_pairs=8)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 240)
    assert abs(float(out.pos[1, 1]) - 0.0) < 0.05
    assert float(jnp.abs(out.vel[1]).max()) < 0.1


def test_restitution_bounce():
    b = make_ground_scene(
        jnp.asarray([[0.0, 3.0, 0.0]]),
        extra_kw=dict(
            shape=jnp.asarray([0, ph.rigid.SHAPE_SPHERE], jnp.int32),
            restitution=jnp.asarray([1.0, 0.8]),
        ),
    )
    p = ph.SolverParams(max_pairs=8)
    traj = []
    state = b
    step = jax.jit(lambda s: ph.step_bodies(s, p))
    for _ in range(150):
        state = step(state)
        traj.append(float(state.pos[1, 1]))
    top_after_bounce = max(traj[60:150])
    # dropped from 3.0 (2.5m above rest): with e=0.8 expect a solid rebound
    assert top_after_bounce > 0.8


def test_friction_stops_sliding_box():
    b = make_ground_scene(
        jnp.asarray([[0.0, 0.5, 0.0]]),
    )
    b = b.replace(vel=b.vel.at[1].set(jnp.asarray([4.0, 0.0, 0.0])))
    p = ph.SolverParams(max_pairs=8)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 180)
    assert float(jnp.abs(out.vel[1, 0])) < 0.05  # friction stopped it
    # mu=0.64 combined -> stopping distance v^2/(2 mu g) ~ 1.3m
    assert 0.3 < float(out.pos[1, 0]) < 2.5


def test_stack_stability():
    b = make_ground_scene(
        jnp.asarray([[0.0, 0.5, 0.0], [0.02, 1.52, 0.0], [0.0, 2.54, 0.0]])
    )
    p = ph.SolverParams(max_pairs=16, iterations=12)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 300)
    ys = np.asarray(out.pos[1:4, 1])
    np.testing.assert_allclose(ys, [0.0, 1.0, 2.0], atol=0.12)
    xz = np.asarray(out.pos[1:4, (0, 2)])
    assert np.abs(xz).max() < 0.3


def test_sphere_capsule_rest():
    b = make_ground_scene(
        jnp.asarray([[2.0, 0.6, 0.0], [-2.0, 1.2, 0.0]]),
        extra_kw=dict(
            shape=jnp.asarray(
                [ph.rigid.SHAPE_BOX, ph.rigid.SHAPE_SPHERE, ph.rigid.SHAPE_CAPSULE],
                jnp.int32,
            ),
            size=jnp.asarray(
                [[32.0, 0.05, 32.0], [0.5, 0.5, 0.5], [0.3, 0.45, 0.0]]
            ),
        ),
    )
    p = ph.SolverParams(max_pairs=8)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 240)
    # sphere r=0.5 rests at y=0; capsule r=0.3 hh=0.45 upright rests at 0.25
    assert abs(float(out.pos[1, 1]) - 0.0) < 0.05
    assert abs(float(out.pos[2, 1]) - 0.25) < 0.1


def test_vmap_batch_matches_single():
    single = make_ground_scene(jnp.asarray([[0.0, 1.3, 0.0], [0.4, 2.4, 0.1]]))
    p = ph.SolverParams(max_pairs=16)
    out1 = jax.jit(run_steps, static_argnums=2)(single, p, 60)
    batch = jax.tree.map(lambda x: jnp.stack([x, x, x]), single)
    outb = jax.jit(
        jax.vmap(lambda bb: run_steps(bb, p, 60))
    )(batch)
    np.testing.assert_allclose(
        np.asarray(outb.pos[1]), np.asarray(out1.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outb.pos[0]), np.asarray(outb.pos[2]), atol=0
    )


def test_inactive_bodies_ignored():
    b = make_ground_scene(jnp.asarray([[0.0, 0.501, 0.0]]), n_pad=5)
    p = ph.SolverParams(max_pairs=16)
    out = jax.jit(run_steps, static_argnums=2)(b, p, 60)
    # padded slots stay exactly at origin, untouched by contacts
    np.testing.assert_allclose(np.asarray(out.pos[2:]), 0.0, atol=1e-6)
    assert abs(float(out.pos[1, 1])) < 0.02
