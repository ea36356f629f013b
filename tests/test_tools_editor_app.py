"""Scripted interactive-editor sessions (scx.tools.editor_app).

The VERDICT r2 done-criterion: a scripted session that places, transforms
and deletes instances through the KEY-DRIVEN session (the same handle_key
path a human drives), saves the sector, streams it into the runtime, and
pixel-matches the editor's render — the reference's editor/runtime visual
parity property (AGENTS.md:120-128) exercised end-to-end through the
interactive surface (tools/world_editor/main.cpp:1717-1772 gizmo loop,
:899-923 save).
"""

import numpy as np
import pytest

from scx.tools.editor_app import EditorSession, default_palette


def make_session(tmp_path=None, **kw):
    return EditorSession(
        world_root=None if tmp_path is None else str(tmp_path),
        width=160, height=96, **kw,
    )


def feed(sess, keys):
    for k in keys:
        sess.handle_key(k)


def test_place_select_delete_undo_via_keys():
    sess = make_session()
    # place a cube at the cursor, then a second one after moving
    feed(sess, ["p"])
    assert len(sess.doc.entities) == 1
    assert sess.doc.selection  # placement selects
    feed(sess, ["right", "right", "p"])
    assert len(sess.doc.entities) == 2
    # delete the selection, undo brings it back, redo removes again
    feed(sess, ["X"])
    assert len(sess.doc.entities) == 1
    feed(sess, ["u"])
    assert len(sess.doc.entities) == 2
    feed(sess, ["U"])
    assert len(sess.doc.entities) == 1
    # undo chain all the way back to empty
    feed(sess, ["u", "u", "u"])
    assert len(sess.doc.entities) == 0


def test_palette_cycles():
    sess = make_session()
    labels = [it["label"] for it in default_palette()]
    assert sess.palette[sess.palette_idx]["label"] == labels[0]
    feed(sess, ["tab"])
    assert sess.palette[sess.palette_idx]["label"] == labels[1]
    feed(sess, ["p"])
    e = next(iter(sess.doc.entities.values()))
    assert e.name == labels[1]


def test_translate_mode_steps_with_snap():
    sess = make_session()
    feed(sess, ["p"])
    eid = sess.doc.selection[0]
    p0 = sess.doc.entities[eid].position.copy()
    snap = sess.doc.grid_snap
    # g -> x axis -> three + steps -> commit
    feed(sess, ["g", "x", "+", "+", "+", "enter"])
    assert sess.mode == "select"
    p1 = sess.doc.entities[eid].position
    np.testing.assert_allclose(p1 - p0, [3 * snap, 0, 0], atol=1e-6)
    # the whole drag is ONE undo step
    feed(sess, ["u"])
    np.testing.assert_allclose(sess.doc.entities[eid].position, p0, atol=1e-6)


def test_gizmo_cancel_restores():
    sess = make_session()
    feed(sess, ["p"])
    eid = sess.doc.selection[0]
    p0 = sess.doc.entities[eid].position.copy()
    depth_before = len(sess.stack.undo_stack)
    feed(sess, ["g", "y", "+", "+", "esc"])
    np.testing.assert_allclose(sess.doc.entities[eid].position, p0, atol=1e-6)
    assert sess.mode == "select"
    # cancelled drags leave no extra undo entry
    assert len(sess.stack.undo_stack) == depth_before


def test_rotate_and_scale_steps():
    sess = make_session()
    feed(sess, ["p"])
    eid = sess.doc.selection[0]
    feed(sess, ["r", "y", "+", "enter"])
    assert abs(sess.doc.entities[eid].rotation[1] - np.deg2rad(15.0)) < 1e-5
    feed(sess, ["s", "x", "+", "enter"])
    assert abs(sess.doc.entities[eid].scale[0] - 1.25) < 1e-5
    # two separate undo steps
    feed(sess, ["u"])
    assert abs(sess.doc.entities[eid].scale[0] - 1.0) < 1e-5
    feed(sess, ["u"])
    assert abs(sess.doc.entities[eid].rotation[1]) < 1e-5


def test_cursor_drag_runs_gizmo_math():
    """Arrow-key drags in translate mode run the pick-ray gizmo path: the
    entity tracks the cursor ray along the chosen axis."""
    sess = make_session()
    feed(sess, ["p"])
    eid = sess.doc.selection[0]
    p0 = sess.doc.entities[eid].position.copy()
    feed(sess, ["g", "x"] + ["right"] * 8 + ["enter"])
    p1 = sess.doc.entities[eid].position
    assert p1[0] > p0[0]  # moved along +x toward the cursor
    np.testing.assert_allclose(p1[1:], p0[1:], atol=1e-6)
    # snapped to the grid
    assert abs(p1[0] / sess.doc.grid_snap - round(p1[0] / sess.doc.grid_snap)) < 1e-4


def test_camera_mode_moves_viewpoint():
    sess = make_session()
    z0 = sess.camera.position.copy()
    feed(sess, ["c", "w", "w", "esc"])
    assert sess.mode == "select"
    assert np.linalg.norm(sess.camera.position - z0) > 0.1


def test_multi_select_group_drag():
    sess = make_session()
    feed(sess, ["p", "left", "left", "left", "left", "p"])
    assert len(sess.doc.entities) == 2
    # multi-select both: cursor is over #2; 'm' over #1's position needs a
    # pick — instead toggle-select via doc API parity: select both by keys
    from scx.tools.editor import select_toggle

    for eid in list(sess.doc.entities):
        if eid not in sess.doc.selection:
            select_toggle(sess.doc, eid)
    olds = {e: sess.doc.entities[e].position.copy() for e in sess.doc.entities}
    feed(sess, ["g", "z", "+", "+", "enter"])
    for eid, p in olds.items():
        moved = sess.doc.entities[eid].position - p
        np.testing.assert_allclose(moved, [0, 0, 2 * sess.doc.grid_snap], atol=1e-6)
    feed(sess, ["u"])  # one undo restores the whole group
    for eid, p in olds.items():
        np.testing.assert_allclose(sess.doc.entities[eid].position, p, atol=1e-6)


def test_scripted_session_save_stream_pixel_parity(tmp_path):
    """The full loop: author by keys -> save -> stream into the runtime ->
    render both paths with the same camera -> PIXEL-IDENTICAL."""
    import time

    import jax.numpy as jnp

    from scx import state as st
    from scx.core.config import StreamingBudgets, WorldPartitionConfig
    from scx.render import RasterParams, render_frame
    from scx.render.camera import camera_view_proj
    from scx.render.mesh import build_mesh_pool
    from scx.tools.editor import build_draw_items
    from scx.world.culling import cull_entities, emit_draws
    from scx.world.streaming import WorldPartition

    sess = make_session(tmp_path)
    # author a little scene: slab + two cubes, one rotated, one scaled up
    feed(sess, ["tab", "p"])                                # slab
    feed(sess, ["left", "left", "left", "tab", "tab", "p"])  # cube
    feed(sess, ["r", "y", "+", "+", "enter"])                # rotate it 30°
    feed(sess, ["right", "right", "right", "right", "right", "right", "p"])
    feed(sess, ["s", "y", "+", "enter"])                     # taller
    # delete + undo churn (exercises the stack before saving)
    feed(sess, ["X", "u"])
    assert len(sess.doc.entities) == 3
    path = sess.save()
    assert path is not None and sess.saved_path == path

    raster = RasterParams(
        width=128, height=64, tile_h=16, tile_w=128,
        max_tris=2048, max_tris_per_tile=64, interpret=True,
    )
    pool = build_mesh_pool()
    vp = camera_view_proj(
        jnp.asarray([4.0, 10.0, -14.0]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=2.0,
    )
    draws_editor = build_draw_items(sess.doc, max_draws=64)
    rgb_editor, _, _ = render_frame(draws_editor, pool, vp, raster)

    cfg = WorldPartitionConfig(load_radius=0, unload_radius=1)
    wp = WorldPartition(cfg, StreamingBudgets(), capacity=64,
                        world_root=str(tmp_path))
    state = st.alloc_entity_state(64)
    for _ in range(50):
        state = wp.update(state, (0.0, 0.0, 0.0), (0.0, 0.0, -1.0))
        if wp.stats.entities == 3:
            break
        time.sleep(0.01)
    assert wp.stats.entities == 3
    visible, mats = cull_entities(state, vp)
    draws_runtime = emit_draws(state, visible, mats, 64)
    rgb_runtime, _, _ = render_frame(draws_runtime, pool, vp, raster)
    wp.shutdown()

    a, b = np.asarray(rgb_editor), np.asarray(rgb_runtime)
    assert a.std() > 0.01
    np.testing.assert_array_equal(a, b)


def test_session_render_smoke():
    """EditorSession.render returns a frame with the scene + crosshair."""
    sess = make_session()
    feed(sess, ["p"])
    rgb = sess.render()
    assert rgb.shape == (96, 160, 3)
    assert rgb.std() > 0.01
    cx, cy = sess.cursor
    np.testing.assert_allclose(rgb[cy, cx], (1.0, 1.0, 1.0))


def test_editor_asset_hot_reload_pump(tmp_path):
    """Key 'F' rescans the asset root: changed textures reload in place,
    new models join the palette (VERDICT r2 item 7)."""
    import os

    import numpy as np

    from scx.tools.editor_app import EditorSession

    img = np.full((8, 8, 3), 20, np.uint8)
    with open(tmp_path / "brick.ppm", "wb") as fh:
        fh.write(b"P6\n8 8\n255\n" + img.tobytes())

    sess = EditorSession(world_root=str(tmp_path / "world"),
                         asset_root=str(tmp_path))
    n_palette = len(sess.palette)
    sess.handle_key("F")
    assert "assets:" in sess.status
    tid = sess.assets.load_texture("brick.ppm")
    sess.assets.begin_frame()
    slot = sess.assets.textures[tid].slot
    assert slot >= 0

    # change the texture + add a new model file
    img2 = np.full((8, 8, 3), 240, np.uint8)
    with open(tmp_path / "brick.ppm", "wb") as fh:
        fh.write(b"P6\n8 8\n255\n" + img2.tobytes())
    os.utime(tmp_path / "brick.ppm",
             (os.path.getmtime(tmp_path / "brick.ppm") + 7,) * 2)
    (tmp_path / "crate.glb").write_bytes(b"stub")

    reloaded = sess.pump_asset_changes()
    assert reloaded == [tid]
    after = np.asarray(sess.assets.device_pool())[slot]
    # disk color art decodes sRGB->linear at load (scx.assets.textures)
    from scx.assets.textures import srgb_to_linear

    want = float(srgb_to_linear(np.float32(240 / 255.0)))
    assert abs(float(after.mean()) - want) < 2e-2
    assert len(sess.palette) == n_palette + 1
    assert sess.palette[-1]["label"] == "crate.glb"
