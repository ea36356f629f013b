"""Big-scene composition (scx.parallel.bigscene): spatial physics strips +
pose all_gather + render strips in ONE shard_map step must match the
single-chip solve + full-frame render of the same global scene."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from scx import physics as ph
from scx import render as rd
from scx.parallel import bigscene as bg
from scx.parallel.mesh import make_mesh
from scx.physics.warmstart import empty_contact_cache

from tests.test_parallel_spatial import (
    N_LOCAL, S, WIDTH, build_global_scene, shard_scene,
)


def _raster():
    return rd.RasterParams(
        width=128, height=64, tile_h=16, tile_w=128,
        max_tris=1024, max_tris_per_tile=64, max_clusters_per_tile=8,
        interpret=True,
    )


def _vp(params):
    return rd.camera_view_proj(
        jnp.asarray([2 * WIDTH, 18.0, 26.0]),
        jnp.asarray([2 * WIDTH, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=params.width / params.height,
    )


@pytest.mark.slow
def test_bigscene_step_matches_global_sim_and_render():
    mesh = make_mesh(dp=1, sp=S)
    params = ph.SolverParams(max_pairs=128, iterations=6)
    raster = _raster()
    vp = _vp(raster)

    bodies, n = build_global_scene()
    sharded = shard_scene(bodies, n)

    step = bg.make_bigscene_step(
        mesh, params, raster, x0=0.0, shard_width=WIDTH,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out = sharded
    for _ in range(3):
        out, rgb, stats = step(out, vp)
    jax.block_until_ready(rgb)
    assert rgb.shape == (raster.height, raster.width, 3)
    assert int(stats["halo_dropped"]) == 0
    assert int(stats["migration_dropped"]) == 0
    assert int(stats["tile_overflow"]) == 0

    # reference: global solve + full-frame render of the SAME fleet
    cache = empty_contact_cache(params.max_pairs)
    ref = bodies
    for _ in range(3):
        ref, cache, _ = ph.step_bodies_cached(ref, params, cache)

    # compare poses of the sharded fleet (any strip order) vs global
    def fleet(btree):
        pos = np.asarray(btree.pos).reshape(-1, 3)
        act = np.asarray(btree.active).reshape(-1)
        rows = pos[act]
        return rows[np.lexsort(rows.T)]

    got = fleet(out)
    want_rows = np.asarray(ref.pos)[np.asarray(ref.active)]
    want = want_rows[np.lexsort(want_rows.T)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)

    # render the gathered fleet unsharded: strips must compose to the same
    pos = jnp.asarray(np.asarray(out.pos).reshape(-1, 3))
    quat = jnp.asarray(np.asarray(out.quat).reshape(-1, 4))
    size = jnp.asarray(np.asarray(out.size).reshape(-1, 3))
    act = jnp.asarray(np.asarray(out.active).reshape(-1))
    draws = bg.gathered_draws(pos, quat, size, act)
    from scx.render.mesh import build_mesh_pool
    from scx.render.pipeline import render_frame

    full_rgb, _, _ = render_frame(draws, build_mesh_pool(), vp, raster)
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(full_rgb), atol=1e-5
    )


@pytest.mark.slow
def test_bigscene_chain_matches_stepwise():
    """The device-chained N-step variant == N single steps."""
    mesh = make_mesh(dp=1, sp=S)
    params = ph.SolverParams(max_pairs=128, iterations=6)
    raster = _raster()
    vp = _vp(raster)
    bodies, n = build_global_scene()
    sharded = shard_scene(bodies, n)

    step = bg.make_bigscene_step(
        mesh, params, raster, x0=0.0, shard_width=WIDTH,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out = sharded
    for _ in range(3):
        out, _, _ = step(out, vp)

    chain = bg.make_bigscene_chain(
        mesh, params, raster, x0=0.0, shard_width=WIDTH, n_steps=3,
        halo=3.0, halo_cap=16, mig_cap=8,
    )
    out2, cstats = chain(sharded, vp)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(out2.pos), atol=1e-5
    )
    assert int(cstats["active"]) == int(
        np.asarray(out.active).sum()
    )


def _entity_world():
    """Global EntityState for the traffic-equivalence case: per-strip ground
    slabs, kinematic traffic agents on an x-spanning lane graph (some about
    to cross a strip boundary), and a player physics vehicle coasting across
    one. Slot k*N_LOC+j lives in strip k so the sharded view is a reshape."""
    from scx.app.sandbox import spawn_player_vehicle
    from scx.state import entity as st
    from scx.traffic import lanes as tl

    S_E, N_LOC, W = 4, 16, 64.0
    b = tl.LaneGraphBuilder(max_nodes=256, max_segments=128)
    for sx in range(S_E):
        b.build_procedural_for_sector(
            (sx, 0), (sx * W, 0.0, 0.0), ((sx + 1) * W, 0.0, W)
        )
    lanes = b.to_arrays()

    s = st.alloc_entity_state(S_E * N_LOC)

    def put(i, **tr):
        nonlocal s
        s = s.replace(**tr)

    for k in range(S_E):
        base = k * N_LOC
        # ground slab (static)
        i = base
        s = s.replace(
            alive=s.alive.at[i].set(True),
            components=s.components.at[i].set(
                st.C_TRANSFORM | st.C_COLLIDER | st.C_RIGID_BODY
            ),
            transform=s.transform.replace(
                pos=s.transform.pos.at[i].set(
                    jnp.asarray([k * W + W / 2, -0.55, W / 2])
                )
            ),
            body=s.body.replace(
                body_type=s.body.body_type.at[i].set(st.BODY_STATIC),
                half_extents=s.body.half_extents.at[i].set(
                    jnp.asarray([W / 2, 0.05, W / 2])
                ),
                mass=s.body.mass.at[i].set(0.0),
            ),
        )
        # kinematic traffic agents on this strip's first eastbound lane,
        # the last one 3 m short of the right boundary (crosses mid-run)
        lane0 = b.sector_segments[(k, 0)][0]
        seg = b.segments[lane0]
        slen = seg["length"]
        for j, frac in enumerate((0.3, 0.6, 0.94)):
            i = base + 1 + j
            ls = frac * slen
            start = np.asarray(b.nodes[seg["start"]]["pos"])
            p = start + np.asarray(seg["dir"]) * ls
            s = s.replace(
                alive=s.alive.at[i].set(True),
                components=s.components.at[i].set(
                    st.C_TRANSFORM | st.C_TRAFFIC
                ),
                transform=s.transform.replace(
                    pos=s.transform.pos.at[i].set(jnp.asarray(p, jnp.float32))
                ),
                body=s.body.replace(
                    body_type=s.body.body_type.at[i].set(st.BODY_NONE)
                ),
                traffic=s.traffic.replace(
                    mode=s.traffic.mode.at[i].set(st.TRAFFIC_KINEMATIC),
                    lane_id=s.traffic.lane_id.at[i].set(lane0),
                    lane_s=s.traffic.lane_s.at[i].set(float(ls)),
                    speed=s.traffic.speed.at[i].set(10.0),
                ),
            )
    # a dynamic box resting near strip 1's right boundary (straddles halo)
    i = 1 * N_LOC + 8
    s = s.replace(
        alive=s.alive.at[i].set(True),
        components=s.components.at[i].set(
            st.C_TRANSFORM | st.C_COLLIDER | st.C_RIGID_BODY
        ),
        transform=s.transform.replace(
            pos=s.transform.pos.at[i].set(jnp.asarray([2 * W - 1.2, 0.5, 20.0]))
        ),
        body=s.body.replace(
            body_type=s.body.body_type.at[i].set(st.BODY_DYNAMIC),
        ),
    )
    # player vehicle coasting +x across strip 2's right boundary
    i = 2 * N_LOC + 9
    s = spawn_player_vehicle(s, i, pos=(3 * W - 2.0, 0.6, 40.0))
    s = s.replace(
        body=s.body.replace(vel=s.body.vel.at[i].set(jnp.asarray([8.0, 0.0, 0.0]))),
        vehicle=s.vehicle.replace(
            input=s.vehicle.input.at[i].set(jnp.asarray([0.6, 0.0, 0.0, 0.0]))
        ),
        transform=s.transform.replace(
            # face +x (lane yaw pi/2): quat (w,x,y,z) about y
            rot=s.transform.rot.at[i].set(
                jnp.asarray([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
            )
        ),
    )
    return s, lanes, S_E, N_LOC, W


@pytest.mark.slow
def test_bigscene_entity_step_matches_single_chip():
    """Traffic AI + vehicles + physics in the sharded bigscene == the
    single-chip composed step (VERDICT r2 item 4)."""
    from scx.core.config import EngineConfig, TrafficConfig
    from scx.app.sandbox import SimParams
    from scx.physics.world import empty_sync_cache
    from scx.physics.world import bodies_from_state, physics_sync_step
    from scx.state import entity as st
    from scx.traffic.ai import traffic_ai_update

    s0, lanes, S_E, N_LOC, W = _entity_world()
    cfg = EngineConfig(
        traffic=TrafficConfig(front_ray_length=6.0, lane_change_enabled=False)
    )
    sim = SimParams(solver=ph.SolverParams(max_pairs=128, iterations=6))
    mesh = make_mesh(dp=1, sp=S_E)
    dt = cfg.physics.fixed_dt

    step = bg.make_bigscene_entity_step(
        mesh, cfg, sim, None, x0=0.0, shard_width=W,
        halo=12.0, halo_cap=12, mig_cap=8,
    )
    sharded = jax.tree.map(
        lambda a: a.reshape((S_E, N_LOC) + a.shape[1:]), s0
    )
    caches = bg.empty_shard_caches(mesh, sim.solver.max_pairs)
    n_steps = 40
    migrated = 0
    for _ in range(n_steps):
        sharded, caches, stats = step(sharded, caches, lanes, None)
        migrated += int(stats["migrated"])
        assert int(stats["halo_dropped"]) == 0
        assert int(stats["migration_dropped"]) == 0
    assert migrated > 0, "nothing crossed a strip boundary"

    # single-chip reference: same system order, warm-started the same way
    @jax.jit
    def ref_step(s, cache):
        bodies = bodies_from_state(s)
        is_veh = (s.components & st.C_VEHICLE) != 0
        s = traffic_ai_update(s, lanes, bodies, is_veh, cfg.traffic, dt)
        s, cache, _ = physics_sync_step(
            s, sim.solver, sim.vehicle, dt, cache, key_id=s.uid,
        )
        return s, cache

    ref = s0
    ref_cache = empty_sync_cache(sim.solver.max_pairs)
    for _ in range(n_steps):
        ref, ref_cache = ref_step(ref, ref_cache)

    def rows(state, extra):
        pos = np.asarray(state.transform.pos).reshape(-1, 3)
        al = np.asarray(state.alive).reshape(-1)
        ex = np.stack(
            [np.asarray(getattr(state.traffic, f)).reshape(-1) for f in extra],
            axis=-1,
        )
        m = np.concatenate([pos, ex], axis=-1)[al]
        return m[np.lexsort(m[:, :3].T[::-1])]

    got = rows(sharded, ("lane_s", "speed"))
    want = rows(ref, ("lane_s", "speed"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert int(np.asarray(sharded.alive).sum()) == int(np.asarray(ref.alive).sum())
