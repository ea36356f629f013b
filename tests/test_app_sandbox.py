"""Full-engine integration: the sandbox composes streaming + traffic +
vehicle + physics + render and runs frames headlessly (the reference's
'sandbox as integration test' role, SURVEY §4)."""

import time

import numpy as np
import pytest

from scx.app import Sandbox
from scx.render import RasterParams


@pytest.fixture(scope="module")
def sandbox():
    sb = Sandbox(
        capacity=1024,
        raster=RasterParams(
            width=128, height=32, tile_h=16, tile_w=128,
            max_tris=4096, max_tris_per_tile=64, interpret=True,
        ),
    )
    yield sb
    sb.shutdown()


def test_world_streams_and_traffic_spawns(sandbox):
    for _ in range(12):
        rgb, tel = sandbox.frame(player_input=(0.8, 0.0, 0.0, 0.0))
        time.sleep(0.01)
    assert tel.active_sectors >= 9
    assert tel.entities > 100
    assert tel.traffic_total > 0
    assert rgb.shape == (32, 128, 3)


def test_player_vehicle_drives(sandbox):
    p0 = np.asarray(sandbox.state.transform.pos[sandbox.player_slot]).copy()
    for _ in range(60):
        sandbox.frame(player_input=(1.0, 0.0, 0.0, 0.0))
    p1 = np.asarray(sandbox.state.transform.pos[sandbox.player_slot])
    # suspension keeps the car above ground and throttle moves it forward
    assert 0.0 < p1[1] < 2.0
    assert p1[2] - p0[2] > 0.5  # +Z is forward
    assert np.asarray(sandbox.state.vehicle.wheel_contact[sandbox.player_slot]).all()


def test_frame_is_rendered(sandbox):
    rgb, tel = sandbox.frame()
    arr = np.asarray(rgb)
    assert np.isfinite(arr).all()
    assert arr.std() > 0.01  # something is on screen
    assert tel.visible > 0


def test_debug_overlay_formats(sandbox):
    text = sandbox.telemetry.format_overlay()
    assert "entities" in text and "traffic" in text and "sectors" in text


def test_debug_lines_overlay_in_frame(sandbox):
    """Immediate-mode debug lines drawn by Sandbox.frame and cleared after."""
    ppos = np.asarray(sandbox.state.transform.pos[sandbox.player_slot])
    # magenta line floating above the player, crossing the chase-cam view
    a = (float(ppos[0]) - 15.0, float(ppos[1]) + 2.0, float(ppos[2]))
    b = (float(ppos[0]) + 15.0, float(ppos[1]) + 2.0, float(ppos[2]))
    sandbox.debug.add_line(a, b, color=(1.0, 0.0, 1.0))
    rgb, _ = sandbox.frame()
    px = np.asarray(rgb).reshape(-1, 3)
    magenta = (px[:, 0] > 0.9) & (px[:, 1] < 0.1) & (px[:, 2] > 0.9)
    assert magenta.any()
    assert sandbox.debug.count == 0  # cleared after the frame
    # next frame has no overlay
    rgb2, _ = sandbox.frame()
    px2 = np.asarray(rgb2).reshape(-1, 3)
    assert not ((px2[:, 0] > 0.9) & (px2[:, 1] < 0.1) & (px2[:, 2] > 0.9)).any()
