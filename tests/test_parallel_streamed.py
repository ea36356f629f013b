"""Streaming x spatial sharding (scx.parallel.streamed_bigscene): the
reference's defining loop — an unbounded streamed world
(sc_world_partition.cpp:799-966) — running across mesh 'sp' strips, with
device-side migration composing with host-side sector spawns."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scx import state as st
from scx.state import entity as ent
from scx.core.config import StreamingBudgets, WorldPartitionConfig
from scx.parallel import bigscene as bg
from scx.parallel.mesh import make_mesh
from scx.parallel.streamed_bigscene import StreamedBigScene
from scx.world.streaming import SectorState, WorldPartition

S, W = 2, 64.0          # two strips, one 64 m sector column each
N_LOC = 640             # per-strip capacity
STREAM = 512            # rows [0, STREAM) host-managed per strip


def _sharded_state():
    base = st.alloc_entity_state(S * N_LOC)
    return jax.tree.map(
        lambda a: a.reshape((S, N_LOC) + a.shape[1:]), base
    )


def _covered(c):
    return 0 <= c[0] < S


def _pump_sharded(sbs, pos, want_active, frames=200, sleep=0.01):
    """Pump until exactly `want_active` sectors are ACTIVE fleet-wide and
    every queue is drained (settle can pause between load batches when
    desired > max_concurrent_loads, so queue-empty alone is not settled)."""
    for _ in range(frames):
        sbs.update_streaming(pos)
        time.sleep(sleep)
        if len(sbs.active_sectors()) == want_active and all(
            p.stats.queued == p.stats.loading == p.stats.ready == 0
            and not p._despawn_queue
            for p in sbs.partitions
        ):
            break
    return sbs.state


def _pump_single(wp, state, pos, want_active, frames=200, sleep=0.01):
    for _ in range(frames):
        state = wp.update(state, pos, (0.0, 0.0, 1.0))
        time.sleep(sleep)
        if (
            wp.stats.active_sectors == want_active
            and wp.stats.queued == wp.stats.loading == wp.stats.ready == 0
            and not wp._despawn_queue
        ):
            break
    return state


def _alive_rows(state):
    """Sorted (pos, mesh_id, sector) rows for every alive entity, any
    leading shape."""
    pos = np.asarray(state.transform.pos).reshape(-1, 3)
    mesh = np.asarray(state.render.mesh_id).reshape(-1, 1)
    sector = np.asarray(state.sector).reshape(-1, 2)
    alive = np.asarray(state.alive).reshape(-1)
    rows = np.concatenate(
        [pos, mesh.astype(np.float64), sector.astype(np.float64)], axis=-1
    )[alive]
    return rows[np.lexsort(rows.T[::-1])]


def _make_sbs():
    cfg = WorldPartitionConfig(load_radius=1, unload_radius=2)
    bud = StreamingBudgets(
        max_activations_per_frame=4,
        max_despawns_per_frame=512,
        max_entities=STREAM,
    )
    mesh = make_mesh(dp=1, sp=S)
    sbs = StreamedBigScene(
        mesh, _sharded_state(), cfg, bud,
        x0=0.0, shard_width=W, stream_rows=STREAM,
    )
    return sbs, cfg, bud, mesh


def test_streamed_strips_match_single_chip():
    """Each strip streams ITS sectors; the union of streamed entities is
    exactly what one single-chip WorldPartition streams over the same
    covered world."""
    sbs, cfg, bud, _ = _make_sbs()
    cam = (64.0, 0.0, 32.0)  # sector (1,0): wants cx 0..2, cz -1..1
    try:
        _pump_sharded(sbs, cam, 6)
        got_sectors = sbs.active_sectors()
        want_sectors = {
            (cx, cz) for cx in (0, 1) for cz in (-1, 0, 1)
        }
        assert got_sectors == want_sectors, got_sectors
        # every strip owns only its own column
        for k, p in enumerate(sbs.partitions):
            for c, sec in p.sectors.items():
                if sec.state == SectorState.ACTIVE:
                    assert sbs.strip_of_sector(c, cfg.sector_size_meters) == k

        # single-chip reference over the same covered world
        ref_bud = StreamingBudgets(
            max_activations_per_frame=4,
            max_despawns_per_frame=512,
            max_entities=S * STREAM,
        )
        wp = WorldPartition(cfg, ref_bud, capacity=S * STREAM)
        wp.sector_filter = _covered
        ref_state = st.alloc_entity_state(S * STREAM)
        try:
            ref_state = _pump_single(wp, ref_state, cam, 6)
            got = _alive_rows(sbs.state)
            want = _alive_rows(ref_state)
            assert got.shape == want.shape, (got.shape, want.shape)
            np.testing.assert_array_equal(got, want)
        finally:
            wp.shutdown()

        # host bookkeeping matches device occupancy in the streamed region
        alive_dev = np.asarray(sbs.state.alive)
        for k, p in enumerate(sbs.partitions):
            np.testing.assert_array_equal(alive_dev[k, :STREAM], p._alive)
            assert not alive_dev[k, STREAM:].any()

        # ---- unload: move 4 sectors north; old rows despawn on both ----
        cam2 = (64.0, 0.0, 32.0 + 4 * W)
        _pump_sharded(sbs, cam2, 6, frames=240)
        wp2 = WorldPartition(cfg, ref_bud, capacity=S * STREAM)
        wp2.sector_filter = _covered
        ref2 = st.alloc_entity_state(S * STREAM)
        try:
            ref2 = _pump_single(wp2, ref2, cam2, 6, frames=240)
            got2 = _alive_rows(sbs.state)
            want2 = _alive_rows(ref2)
            assert {c for c in sbs.active_sectors()} == {
                (cx, cz) for cx in (0, 1) for cz in (3, 4, 5)
            }
            assert got2.shape == want2.shape
            np.testing.assert_array_equal(got2, want2)
        finally:
            wp2.shutdown()
    finally:
        sbs.shutdown()


@pytest.mark.slow
def test_streamed_migration_composes():
    """Agents migrate between strips WHILE sectors stream in: device
    migration splices never touch the host-managed streamed rows."""
    from scx.app.sandbox import SimParams
    from scx.core.config import EngineConfig, TrafficConfig
    from scx.physics.solver import SolverParams
    from scx.traffic import lanes as tl

    sbs, cfg, bud, mesh = _make_sbs()
    try:
        cam = (64.0, 0.0, 32.0)
        _pump_sharded(sbs, cam, 6)
        n_streamed = int(np.asarray(sbs.state.alive).sum())
        assert n_streamed > 0

        # lanes across both strips; 2 kinematic agents on strip 0's
        # eastbound lane, the second 2 m short of the boundary
        b = tl.LaneGraphBuilder(max_nodes=256, max_segments=128)
        for sx in range(S):
            b.build_procedural_for_sector(
                (sx, 0), (sx * W, 0.0, 0.0), ((sx + 1) * W, 0.0, W)
            )
        lanes = b.to_arrays()
        lane0 = b.sector_segments[(0, 0)][0]
        seg = b.segments[lane0]
        slen = seg["length"]
        s = sbs.state
        for j, frac in enumerate((0.5, 0.97)):
            k, i = 0, STREAM + j  # device-managed region
            ls = frac * slen
            p = np.asarray(b.nodes[seg["start"]]["pos"]) + np.asarray(
                seg["dir"]
            ) * ls
            s = s.replace(
                alive=s.alive.at[k, i].set(True),
                components=s.components.at[k, i].set(
                    ent.C_TRANSFORM | ent.C_TRAFFIC
                ),
                transform=s.transform.replace(
                    pos=s.transform.pos.at[k, i].set(
                        jnp.asarray(p, jnp.float32)
                    )
                ),
                traffic=s.traffic.replace(
                    mode=s.traffic.mode.at[k, i].set(ent.TRAFFIC_KINEMATIC),
                    lane_id=s.traffic.lane_id.at[k, i].set(lane0),
                    lane_s=s.traffic.lane_s.at[k, i].set(float(ls)),
                    speed=s.traffic.speed.at[k, i].set(10.0),
                ),
            )
        sbs.state = s

        ecfg = EngineConfig(
            traffic=TrafficConfig(lane_change_enabled=False)
        )
        sim = SimParams(solver=SolverParams(max_pairs=512, iterations=4))
        step = bg.make_bigscene_entity_step(
            mesh, ecfg, sim, None, x0=0.0, shard_width=W,
            halo=8.0, halo_cap=24, mig_cap=8, mig_lo=STREAM,
        )
        caches = bg.empty_shard_caches(mesh, sim.solver.max_pairs)
        migrated = 0
        for _ in range(30):
            sbs.state, caches, stats = step(sbs.state, caches, lanes, None)
            sbs.update_streaming(cam)  # streaming stays live between steps
            migrated += int(stats["migrated"])
            assert int(stats["migration_dropped"]) == 0
        assert migrated > 0, "no agent crossed a strip boundary"

        # both agents still alive somewhere; the migrated one landed in
        # the DEVICE region of strip 1, not in a streamed row
        alive = np.asarray(sbs.state.alive)
        mode = np.asarray(sbs.state.traffic.mode)
        agents = alive & (mode == ent.TRAFFIC_KINEMATIC)
        assert agents.sum() == 2, agents.sum()
        ks, rows = np.nonzero(agents)
        assert (rows >= STREAM).all(), (ks, rows)
        assert set(ks) == {0, 1}, ks  # one crossed, one stayed

        # host bookkeeping still matches the streamed region exactly
        for k, p in enumerate(sbs.partitions):
            np.testing.assert_array_equal(alive[k, :STREAM], p._alive)
    finally:
        sbs.shutdown()
