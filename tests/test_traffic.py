"""Traffic: lane graph queries, LOD tiers + caps, AI following, spawner."""

import jax
import jax.numpy as jnp
import numpy as np

from scx import state as st
from scx.core.config import StreamingBudgets, TrafficConfig, WorldPartitionConfig
from scx.traffic import ai as tai
from scx.traffic import lanes as tl
from scx.traffic import lod as tlod
from scx.traffic.spawner import TrafficSpawner, snapshot_agents
from scx.world.streaming import WorldPartition


def grid_lanes(n_sectors=2, size=64.0):
    b = tl.LaneGraphBuilder(max_nodes=128, max_segments=64)
    for sx in range(n_sectors):
        b.build_procedural_for_sector(
            (sx, 0), (sx * size, 0.0, 0.0), ((sx + 1) * size, 0.0, size)
        )
    return b


def test_lane_graph_build_and_dedup():
    b = grid_lanes(2)
    # 4 segments per sector; adjacent X-road endpoints share nodes (dedup)
    assert len(b.segments) == 8
    # X road of sector 0 ends at x=64, sector 1 starts at x=64, same z, same dir
    n_positions = {tuple(np.round(n["pos"], 3)) for n in b.nodes}
    assert len(n_positions) == len(b.nodes)  # no duplicate nodes
    assert len(b.nodes) < 2 * 8  # dedup happened at the shared boundary


def test_nearest_and_advance():
    b = grid_lanes(1)
    arr = b.to_arrays()
    # point near the eastbound X lane (z = 32 - 1.75)
    lane, s, dist = tl.nearest_lane(arr, jnp.asarray([10.0, 0.0, 30.0]))
    assert int(lane) >= 0
    seg = b.segments[int(lane)]
    assert abs(float(dist) - abs(30.0 - (32.0 - 1.75))) < 0.01
    # advance 10m along it
    l2, s2, pos, d, ok = tl.advance_along_lane(arr, lane, s, 10.0)
    assert bool(ok)
    np.testing.assert_allclose(float(s2), float(s) + 10.0, atol=1e-4)


def test_advance_crosses_segments():
    b = grid_lanes(2)
    arr = b.to_arrays()
    # eastbound lane of sector 0 is segment 0 (length 64)
    lane0 = b.sector_segments[(0, 0)][0]
    l2, s2, pos, d, ok = tl.advance_along_lane(arr, jnp.int32(lane0), 60.0, 10.0)
    assert bool(ok)
    # walked into sector 1's eastbound lane
    assert int(l2) == b.sector_segments[(1, 0)][0]
    np.testing.assert_allclose(float(s2), 6.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pos)[0], 70.0, atol=1e-3)


def make_agents(dists, modes=None):
    n = 64
    s = st.alloc_entity_state(n)
    k = len(dists)
    s = s.replace(
        alive=s.alive.at[:k].set(True),
        traffic=s.traffic.replace(
            mode=s.traffic.mode.at[:k].set(
                jnp.asarray(modes if modes is not None else [st.TRAFFIC_ONRAILS] * k)
            ),
        ),
        transform=s.transform.replace(
            pos=s.transform.pos.at[:k, 0].set(jnp.asarray(dists, jnp.float32))
        ),
    )
    return s


def test_lod_tiers_and_hysteresis():
    cfg = TrafficConfig()
    s = make_agents([10.0, 60.0, 100.0, 200.0])
    player = jnp.zeros(3)
    s2, despawn = tlod.traffic_lod_update(s, player, cfg)
    modes = np.asarray(s2.traffic.mode[:4])
    assert modes[0] == st.TRAFFIC_PHYSICS       # 10m < 50 enter
    assert modes[1] == st.TRAFFIC_KINEMATIC     # 60m: between A-enter and B-enter
    assert modes[2] == st.TRAFFIC_KINEMATIC     # 100m < 110 enter
    assert modes[3] == st.TRAFFIC_ONRAILS       # 200m > 150
    assert not bool(despawn.any())
    # hysteresis: an A agent at 60m stays A (exit 70)
    s3 = make_agents([60.0], modes=[st.TRAFFIC_PHYSICS])
    s4, _ = tlod.traffic_lod_update(s3, player, cfg)
    assert int(s4.traffic.mode[0]) == st.TRAFFIC_PHYSICS
    # body types follow modes
    assert int(s2.body.body_type[0]) == st.BODY_DYNAMIC
    assert int(s2.body.body_type[1]) == st.BODY_KINEMATIC
    assert int(s2.body.body_type[3]) == st.BODY_NONE


def test_lod_caps_demote_farthest():
    cfg = TrafficConfig(max_vehicles_physics=2)
    s = make_agents([5.0, 10.0, 20.0, 30.0])
    s2, _ = tlod.traffic_lod_update(s, jnp.zeros(3), cfg)
    modes = np.asarray(s2.traffic.mode[:4])
    assert (modes[:2] == st.TRAFFIC_PHYSICS).all()
    assert (modes[2:] == st.TRAFFIC_KINEMATIC).all()  # demoted farthest


def test_lod_total_cap_despawns():
    cfg = TrafficConfig(max_vehicles_total=3)
    s = make_agents([10.0, 300.0, 400.0, 500.0])
    s2, despawn = tlod.traffic_lod_update(s, jnp.zeros(3), cfg)
    d = np.asarray(despawn[:4])
    assert d.sum() == 1 and d[3]  # farthest OnRails goes first


def test_ai_follows_lane():
    b = grid_lanes(1)
    arr = b.to_arrays()
    cfg = TrafficConfig()
    s = st.alloc_entity_state(8)
    # agent on the eastbound lane at s=10
    lane0 = b.sector_segments[(0, 0)][0]
    seg = b.segments[lane0]
    start = np.asarray(b.nodes[seg["start"]]["pos"])
    p0 = start + np.asarray(seg["dir"]) * 10.0
    s = s.replace(
        alive=s.alive.at[0].set(True),
        traffic=s.traffic.replace(
            mode=s.traffic.mode.at[0].set(st.TRAFFIC_ONRAILS),
            lane_id=s.traffic.lane_id.at[0].set(lane0),
            lane_s=s.traffic.lane_s.at[0].set(10.0),
        ),
        transform=s.transform.replace(
            pos=s.transform.pos.at[0].set(jnp.asarray(p0, jnp.float32))
        ),
    )
    dt = 1.0 / 60.0
    step = jax.jit(
        lambda ss: tai.traffic_ai_update(
            ss, arr, None, jnp.zeros(8, bool), cfg, dt
        )
    )
    for _ in range(240):
        s = step(s)
    # accelerated toward the 12 m/s lane speed and moved along +X
    assert float(s.traffic.speed[0]) > 8.0
    assert float(s.transform.pos[0, 0]) > float(p0[0]) + 15.0
    assert float(s.traffic.lane_s[0]) > 10.0
    # yaw aligned with lane direction (+X): forward ~ (1,0,0)
    yaw = float(tai.yaw_of_quat(s.transform.rot[0]))
    np.testing.assert_allclose(yaw, np.pi / 2, atol=0.1)


def test_spawner_spawns_and_respects_rules():
    wcfg = WorldPartitionConfig(load_radius=1, unload_radius=2)
    tcfg = TrafficConfig(density_per_km2=2000.0)  # 64m sector -> desired 8
    wp = WorldPartition(wcfg, StreamingBudgets(), capacity=2048)
    state = st.alloc_entity_state(2048)
    import time
    for _ in range(30):
        state = wp.update(state, (32.0, 0.0, 32.0), (0.0, 0.0, -1.0))
        time.sleep(0.01)
    lanes = tl.LaneGraphBuilder(max_nodes=512, max_segments=256)
    sp = TrafficSpawner(tcfg, wcfg)
    player = (1000.0, 0.0, 1000.0)  # far away: no exclusion interference
    for _ in range(5):
        state = sp.update(state, wp, lanes, player)
    snap = snapshot_agents(state)
    n_agents = int(snap["alive_agent"].sum())
    assert n_agents > 0
    # max 3 spawns/sector/frame * 9 sectors * 5 frames bound
    assert n_agents <= 9 * 8
    # lane gap rule: no two agents on same lane closer than 15m arclength
    lids = snap["lane_id"][snap["alive_agent"]]
    lss = snap["lane_s"][snap["alive_agent"]]
    for lid in set(lids.tolist()):
        ss = np.sort(lss[lids == lid])
        if len(ss) > 1:
            assert np.diff(ss).min() >= tcfg.min_lane_gap - 1e-3
    wp.shutdown()


def test_lod_tier_a_gets_vehicle_components():
    cfg = TrafficConfig()
    s = make_agents([10.0, 200.0])
    s = s.replace(
        body=s.body.replace(
            half_extents=s.body.half_extents.at[:2].set(
                jnp.asarray([[0.9, 0.6, 2.1]] * 2)
            )
        )
    )
    s2, _ = tlod.traffic_lod_update(s, jnp.zeros(3), cfg)
    from scx.state.entity import C_VEHICLE, C_VEHICLE_INPUT

    assert int(s2.traffic.mode[0]) == st.TRAFFIC_PHYSICS
    assert int(s2.components[0]) & C_VEHICLE
    assert int(s2.components[0]) & C_VEHICLE_INPUT
    # wheels laid out from the collider extents (front wheels at +z)
    conn = np.asarray(s2.transform.pos[0])  # just sanity on wheel_conn below
    wc = np.asarray(s2.vehicle.wheel_conn[0])
    assert wc[0, 2] > 0 and wc[2, 2] < 0      # front/rear z
    assert wc[0, 0] < 0 and wc[1, 0] > 0      # left/right x
    assert wc[0, 1] < 0                       # below chassis center
    # far agent stays OnRails without vehicle bits
    assert not (int(s2.components[1]) & C_VEHICLE)
    # demotion strips the bits again
    s3 = s2.replace(
        transform=s2.transform.replace(
            pos=s2.transform.pos.at[0, 0].set(500.0)
        )
    )
    s4, _ = tlod.traffic_lod_update(s3, jnp.zeros(3), cfg)
    assert not (int(s4.components[0]) & C_VEHICLE)


def test_authored_lanes_build():
    b = tl.LaneGraphBuilder(max_nodes=64, max_segments=32)
    b.build_authored_for_sector(
        (0, 0), [[(0.0, 0.0, 8.0), (30.0, 0.0, 8.0), (30.0, 0.0, 40.0)]]
    )
    segs = b.lanes_for_sector((0, 0))
    assert len(segs) == 2  # polyline of 3 points -> 2 chained segments
    arr = b.to_arrays()
    # advance walks across the chain corner
    l2, s2, pos, d, ok = tl.advance_along_lane(arr, jnp.int32(segs[0]), 25.0, 10.0)
    assert bool(ok) and int(l2) == segs[1]
    np.testing.assert_allclose(np.asarray(pos), [30.0, 0.0, 13.0], atol=1e-3)


def test_authored_spawn_points_preferred(tmp_path):
    """A sector's SPWN records (type 0) are used as traffic spawn points
    before random lane placement — the first agent lands at the authored
    point snapped to the authored lane."""
    import time

    from scx.world import format as wf

    root = str(tmp_path)
    coord = wf.SectorCoord(0, 0)
    sf = wf.SectorFile(
        sector=coord,
        lanes=[wf.Lane(id=1, points=[(0.0, 0.0, 8.0), (64.0, 0.0, 8.0)])],
        spawners=[
            wf.Spawner(id=2, transform=wf.Transform((20.0, 0.0, 9.0)), type=0)
        ],
    )
    wf.write_sector_file(wf.build_sector_path(root, coord), sf)

    wcfg = WorldPartitionConfig(load_radius=0, unload_radius=1)
    wp = WorldPartition(
        wcfg, StreamingBudgets(), capacity=512, world_root=root
    )
    state = st.alloc_entity_state(512)
    for _ in range(20):
        state = wp.update(state, (32.0, 0.0, 32.0), (0.0, 0.0, -1.0))
        time.sleep(0.01)
        if wp.stats.active_sectors:
            break
    assert wp.authored_spawners[(0, 0)][0].transform.position == (20.0, 0.0, 9.0)

    lanes = tl.LaneGraphBuilder(max_nodes=128, max_segments=64)
    sp = TrafficSpawner(TrafficConfig(density_per_km2=250.0), wcfg)
    state = sp.update(state, wp, lanes, (1000.0, 0.0, 1000.0))
    snap = snapshot_agents(state)
    agents = np.where(snap["alive_agent"])[0]
    assert len(agents) >= 1
    pos = snap["pos"][agents]
    # one agent snapped onto the authored lane at the spawner's arclength
    d = np.abs(pos - np.asarray([20.0, 0.35, 8.0])).max(-1)
    assert d.min() < 1e-3, pos
    wp.shutdown()


def test_lane_change_around_blocker():
    """Blocked behind a stopped vehicle -> hop to the parallel lane, glide
    over without teleporting, cooldown set (extension of the reference's
    declared-but-unimplemented laneChangeCooldown, sc_traffic_common.h:38-44)."""
    from scx.core import math3d as m3
    from scx.physics.world import bodies_from_state

    b = tl.LaneGraphBuilder(max_nodes=32, max_segments=16)
    n0 = b.add_node((0.0, 0.0, 0.0), (1.0, 0.0, 0.0))
    n1 = b.add_node((100.0, 0.0, 0.0), (1.0, 0.0, 0.0))
    lane0 = b.add_segment(n0, n1, (1.0, 0.0, 0.0), (0, 0))
    m0 = b.add_node((0.0, 0.0, 3.5), (1.0, 0.0, 0.0))
    m1 = b.add_node((100.0, 0.0, 3.5), (1.0, 0.0, 0.0))
    lane1 = b.add_segment(m0, m1, (1.0, 0.0, 0.0), (0, 0))
    arr = b.to_arrays()
    cfg = TrafficConfig()

    s = st.alloc_entity_state(8)
    face_x = m3.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.pi / 2)
    # agent 0: tier C on lane0 at s=10, facing +X, rolling
    s = s.replace(
        alive=s.alive.at[0].set(True).at[1].set(True),
        traffic=s.traffic.replace(
            mode=s.traffic.mode.at[0].set(st.TRAFFIC_ONRAILS),
            lane_id=s.traffic.lane_id.at[0].set(lane0),
            lane_s=s.traffic.lane_s.at[0].set(10.0),
            speed=s.traffic.speed.at[0].set(8.0),
        ),
        transform=s.transform.replace(
            pos=s.transform.pos.at[0].set(jnp.asarray([10.0, 0.0, 0.0]))
            .at[1].set(jnp.asarray([19.0, 0.5, 0.0])),
            rot=s.transform.rot.at[0].set(face_x),
        ),
        body=s.body.replace(
            body_type=s.body.body_type.at[1].set(st.BODY_DYNAMIC),
            mass=s.body.mass.at[1].set(1200.0),
            half_extents=s.body.half_extents.at[1].set(
                jnp.asarray([1.0, 0.8, 2.0])
            ),
        ),
    )
    is_vehicle = jnp.zeros(8, bool).at[1].set(True)
    dt = 1.0 / 60.0
    step = jax.jit(
        lambda ss: tai.traffic_ai_update(
            ss, arr, bodies_from_state(ss), is_vehicle, cfg, dt
        )
    )
    s1 = step(s)
    assert int(s1.traffic.sensor_hit_type[0]) == tai.HIT_VEHICLE
    assert int(s1.traffic.lane_id[0]) == lane1, "should hop to the parallel lane"
    assert float(s1.traffic.lane_cooldown[0]) > 3.0
    # glide: never a >1m jump, converges to the new lane's z
    prev = np.asarray(s1.transform.pos[0])
    s = s1
    for _ in range(240):
        s = step(s)
        cur = np.asarray(s.transform.pos[0])
        assert np.linalg.norm(cur - prev) < 1.0
        prev = cur
    assert abs(float(s.transform.pos[0, 2]) - 3.5) < 0.3
    assert int(s.traffic.lane_id[0]) == lane1


def test_ai_compaction_equivalence():
    """The compacted agent set (a_cap < capacity) must produce the same
    state update as the identity layout (a_cap == capacity): compaction is
    a pure gather -> control laws -> drop-masked scatter (ai.py)."""
    import dataclasses

    from scx.physics.world import bodies_from_state

    b = grid_lanes(1)
    arr = b.to_arrays()
    n = 64
    s = st.alloc_entity_state(n)
    lane0 = b.sector_segments[(0, 0)][0]
    # agents scattered across high/low slots, all three tiers, one with an
    # invalid lane (reacquisition path), plus a dynamic obstacle body
    agents = [
        (3, st.TRAFFIC_ONRAILS, lane0, 6.0),
        (17, st.TRAFFIC_KINEMATIC, lane0, 14.0),
        (29, st.TRAFFIC_PHYSICS, lane0, 22.0),
        (45, st.TRAFFIC_ONRAILS, -1, 0.0),
        (63, st.TRAFFIC_ONRAILS, lane0, 30.0),
    ]
    alive = s.alive
    tr = s.traffic
    pos = s.transform.pos
    seg = b.segments[lane0]
    start = np.asarray(b.nodes[seg["start"]]["pos"])
    d = np.asarray(seg["dir"])
    for slot, mode, lane, ls in agents:
        alive = alive.at[slot].set(True)
        tr = tr.replace(
            mode=tr.mode.at[slot].set(mode),
            lane_id=tr.lane_id.at[slot].set(lane),
            lane_s=tr.lane_s.at[slot].set(ls),
            speed=tr.speed.at[slot].set(5.0),
        )
        p = start + d * max(ls, 2.0)
        pos = pos.at[slot].set(jnp.asarray(p, jnp.float32))
    # obstacle vehicle body ahead of agent 3 (sensor + typed-hit path)
    alive = alive.at[8].set(True)
    pos = pos.at[8].set(jnp.asarray(start + d * 12.0 + [0.0, 0.5, 0.0], jnp.float32))
    s = s.replace(
        alive=alive,
        transform=s.transform.replace(pos=pos),
        traffic=tr,
        body=s.body.replace(
            body_type=s.body.body_type.at[8].set(st.BODY_DYNAMIC),
            mass=s.body.mass.at[8].set(1200.0),
        ),
    )
    is_vehicle = jnp.zeros(n, bool).at[8].set(True)
    dt = 1.0 / 60.0

    cfg_compact = TrafficConfig(max_vehicles_total=8)    # a_cap = 16 < 64
    cfg_identity = TrafficConfig(max_vehicles_total=n)   # a_cap = 64 == n
    assert dataclasses.asdict(cfg_compact) != dataclasses.asdict(cfg_identity)

    def run(cfg, ss):
        f = jax.jit(
            lambda x: tai.traffic_ai_update(
                x, arr, bodies_from_state(x), is_vehicle, cfg, dt
            )
        )
        for _ in range(30):
            ss = f(ss)
        return ss

    out_c = run(cfg_compact, s)
    out_i = run(cfg_identity, s)
    for leaf_c, leaf_i in zip(jax.tree.leaves(out_c), jax.tree.leaves(out_i)):
        np.testing.assert_allclose(
            np.asarray(leaf_c), np.asarray(leaf_i), rtol=1e-6, atol=1e-6
        )
