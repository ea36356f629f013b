"""Live-tuning console: the headless equivalent of the reference's ImGui
debug overlay actually DRIVES the engine (sc_imgui.cpp:351-554 — streaming
budget sliders, physics pause, vehicle handling tuning, agent inspection)."""

import numpy as np
import pytest

from scx.app import Sandbox
from scx.render import RasterParams


@pytest.fixture(scope="module")
def sandbox():
    sb = Sandbox(
        capacity=512,
        raster=RasterParams(
            width=128, height=32, tile_h=16, tile_w=128,
            max_tris=4096, max_tris_per_tile=64, interpret=True,
        ),
    )
    for _ in range(3):
        sb.frame(player_input=(0.5, 0.0, 0.0, 0.0))
    yield sb
    sb.shutdown()


def test_pause_stops_physics(sandbox):
    c = sandbox.console()
    assert "paused" in c.command("pause")
    p0 = np.asarray(sandbox.state.transform.pos[sandbox.player_slot]).copy()
    sandbox.frame(player_input=(1.0, 0.0, 0.0, 0.0))
    p1 = np.asarray(sandbox.state.transform.pos[sandbox.player_slot])
    assert np.allclose(p0, p1)  # device tick skipped
    assert "running" in c.command("pause")
    sandbox.frame(player_input=(1.0, 0.0, 0.0, 0.0))
    p2 = np.asarray(sandbox.state.transform.pos[sandbox.player_slot])
    assert not np.allclose(p1, p2)


def test_streaming_budget_slider(sandbox):
    c = sandbox.console()
    out = c.command("set budgets.max_activations_per_frame 7")
    assert "7" in out
    assert sandbox.partition.budgets.max_activations_per_frame == 7
    out = c.command("set streaming.load_radius 1")
    assert sandbox.partition.config.load_radius == 1
    assert c.command("get streaming.load_radius").endswith("1")


def test_vehicle_tuning_column_applies(sandbox):
    c = sandbox.console()
    c.command("set vehicle.max_speed 3.0")
    assert float(
        np.asarray(sandbox.state.vehicle.max_speed[sandbox.player_slot])
    ) == pytest.approx(3.0)
    # drive hard: the live cap must hold the speed near 3 m/s
    for _ in range(40):
        sandbox.frame(player_input=(1.0, 0.0, 0.0, 0.0))
    speed = float(
        np.linalg.norm(np.asarray(sandbox.state.body.vel[sandbox.player_slot]))
    )
    assert speed < 4.5
    c.command("set vehicle.max_speed 45.0")


def test_traffic_and_physics_set_rebuild_tick(sandbox):
    c = sandbox.console()
    old_tick = sandbox._tick
    out = c.command("set physics.iterations 4")
    assert "re-jitted" in out
    assert sandbox.sim.solver.iterations == 4
    assert sandbox._tick is not old_tick
    sandbox.frame()  # recompiled tick still runs


def test_inspect_and_raycast(sandbox):
    c = sandbox.console()
    out = c.command(f"inspect {sandbox.player_slot}")
    assert "alive=True" in out and "pos=" in out
    # straight down from above the player: must hit something (ground/props)
    p = np.asarray(sandbox.state.transform.pos[sandbox.player_slot])
    out = c.command(f"raycast {p[0]} 30 {p[2]} 0 -1 0")
    assert "hit" in out


def test_freeze_and_help_and_errors(sandbox):
    c = sandbox.console()
    assert "frozen" in c.command("freeze")
    assert sandbox.partition.frozen
    assert "live" in c.command("freeze")
    assert "set" in c.command("help")
    assert "error" in c.command("set nope.nope 1")
    assert "unknown" in c.command("wat")


def test_scene_tree(sandbox):
    out = sandbox.console().command("tree 3")
    assert "entities" in out and "sector" in out
    assert "[" in out  # at least one entity row with component tags


def test_assets_browser_and_rebind(sandbox):
    """Console asset panel: browsable texture/material list + live albedo
    rebinding (the reference DebugUI asset browser, sc_imgui.cpp:149-158)."""
    c = sandbox.console()
    out = c.command("assets")
    assert "textures (" in out and "materials (" in out
    assert "gen/checker" in out or "0x" in out

    # rebind material 0 (unlit, no texture) to the checker texture by name
    before = np.asarray(sandbox.assets.device_materials().texture_id).copy()
    msg = c.command("assets bind 0 gen/checker")
    assert "->" in msg, msg
    after = np.asarray(sandbox.assets.device_materials().texture_id)
    assert after[0] != before[0] and after[0] >= 0
    # render a frame through the rebound table (no crash, pixels change ok)
    sandbox.frame(player_input=(0.0, 0.0, 0.0, 0.0))

    # bad inputs report, not raise
    assert "failed" in c.command("assets bind 99 gen/checker")
    assert "failed" in c.command("assets bind 0 not/a/texture")
