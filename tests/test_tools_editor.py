"""Editor core: command stack undo/redo, picking, gizmo, document IO,
asset database."""

import numpy as np

from scx.core import math3d as m3
from scx.tools import (
    AssetDatabase,
    AssetKind,
    CommandStack,
    DeleteCommand,
    EditorDocument,
    EditorEntity,
    FlyCamera,
    PlaceCommand,
    SetPropertyCommand,
    TransformCommand,
    make_pick_ray,
    pick_entity,
    translate_gizmo_drag,
)
from scx.tools.editor import document_to_sector_file, sector_file_to_document
from scx.world import format as wf

import jax.numpy as jnp


def make_doc():
    doc = EditorDocument(sector=(1, 2))
    stack = CommandStack()
    e = EditorEntity(id=doc.allocate_id(), name="box", position=np.asarray([0.0, 0, -5], np.float32))
    stack.execute(doc, PlaceCommand(e))
    return doc, stack, e


def test_place_undo_redo():
    doc, stack, e = make_doc()
    assert e.id in doc.entities
    assert stack.undo(doc)
    assert e.id not in doc.entities
    assert stack.redo(doc)
    assert e.id in doc.entities


def test_transform_and_property_commands():
    doc, stack, e = make_doc()
    stack.execute(
        doc, TransformCommand(e.id, np.asarray([3.0, 0, -5]), np.zeros(3), np.ones(3))
    )
    np.testing.assert_allclose(doc.entities[e.id].position, [3, 0, -5])
    stack.execute(doc, SetPropertyCommand(e.id, "name", "tower"))
    assert doc.entities[e.id].name == "tower"
    stack.undo(doc)
    assert doc.entities[e.id].name == "box"
    stack.undo(doc)
    np.testing.assert_allclose(doc.entities[e.id].position, [0, 0, -5])


def test_delete_undo():
    doc, stack, e = make_doc()
    stack.execute(doc, DeleteCommand(e.id))
    assert e.id not in doc.entities
    stack.undo(doc)
    assert doc.entities[e.id].name == "box"


def test_pick_ray_and_entity():
    doc, stack, e = make_doc()
    # camera looking down -Z at the box at (0,0,-5)
    vp = np.asarray(
        m3.mat4_mul(
            m3.mat4_perspective_rh_zo(
                jnp.radians(60.0), 1.0, 0.1, 100.0, flip_y=False
            ),
            m3.mat4_look_at_rh(
                jnp.asarray([0.0, 0.0, 0.0]),
                jnp.asarray([0.0, 0.0, -1.0]),
                jnp.asarray([0.0, 1.0, 0.0]),
            ),
        )
    )
    origin, direction = make_pick_ray(255.5, 255.5, 512, 512, vp)
    np.testing.assert_allclose(direction, [0, 0, -1], atol=1e-3)
    eid, t = pick_entity(doc, origin, direction)
    assert eid == e.id
    # ray origin is on the near plane (z=-0.1): distance to front face 4.4
    assert abs(t - 4.4) < 0.01
    # ray that misses
    eid2, _ = pick_entity(doc, np.asarray([50.0, 0, 0]), direction)
    assert eid2 is None


def test_gizmo_translate_with_snap():
    # drag along +X with a ray pointing at x=3.3 area
    new = translate_gizmo_drag(
        entity_pos=[0.0, 0.0, 0.0],
        axis=[1.0, 0.0, 0.0],
        ray_origin=[3.3, 0.0, 10.0],
        ray_dir=[0.0, 0.0, -1.0],
        grid_snap=0.5,
    )
    np.testing.assert_allclose(new, [3.5, 0.0, 0.0], atol=1e-5)


def test_document_sector_roundtrip(tmp_path):
    doc, stack, e = make_doc()
    doc.entities[e.id].mesh_id = 12345
    sf = document_to_sector_file(doc)
    p = str(tmp_path / "s.scsector")
    wf.write_sector_file(p, sf)
    doc2 = sector_file_to_document(wf.read_sector_file(p))
    assert doc2.sector == (1, 2)
    e2 = list(doc2.entities.values())[0]
    assert e2.name == "box" and e2.mesh_id == 12345
    np.testing.assert_allclose(e2.position, [0, 0, -5], atol=1e-6)


def test_fly_camera():
    cam = FlyCamera()
    p0 = cam.position.copy()
    cam.update(0.1, move=(0, 0, 1.0))  # forward
    assert np.linalg.norm(cam.position - p0) > 0.5


def test_asset_database(tmp_path):
    (tmp_path / "meshes").mkdir()
    (tmp_path / "meshes" / "car.glb").write_bytes(b"x")
    (tmp_path / "tex.ppm").write_bytes(b"x")
    db = AssetDatabase(root=str(tmp_path))
    n = db.scan_all()
    assert n == 2
    models = db.find_by_kind(AssetKind.MODEL)
    assert len(models) == 1 and models[0].rel_path == "meshes/car.glb"
    # incremental: touch a file
    import os, time

    time.sleep(0.01)
    (tmp_path / "tex.ppm").write_bytes(b"xy")
    os.utime(tmp_path / "tex.ppm")
    changed = db.rescan_changed()
    assert len(changed) == 1
    # removal detected
    (tmp_path / "tex.ppm").unlink()
    changed = db.rescan_changed()
    assert len(changed) == 1


# ---------------------------------------------------------------------------
# Round-2 additions: rotate/scale gizmos, multi-select, editor->runtime
# render parity (VERDICT r1 items 3 and 5)
# ---------------------------------------------------------------------------

def test_rotate_gizmo_drag_quarter_turn():
    from scx.tools.editor import rotate_gizmo_drag

    center = np.zeros(3)
    # looking straight down at the Y gizmo disc: drag from +X to +Z
    e0 = rotate_gizmo_drag(
        np.zeros(3), (0.0, 1.0, 0.0), center,
        (2.0, 5.0, 0.0), (0.0, -1.0, 0.0),   # start ray hits (2,0,0)
        (0.0, 5.0, 2.0), (0.0, -1.0, 0.0),   # end ray hits (0,0,2)
        snap_deg=15.0,
    )
    # +X to +Z around +Y is -90 degrees in RH convention; at the gimbal
    # singularity the euler triple is non-unique, so verify the ROTATION:
    # the entity's +X axis must now point where the drag ended (+Z)
    q = m3.quat_from_euler_xyz(
        jnp.asarray(e0[0]), jnp.asarray(e0[1]), jnp.asarray(e0[2])
    )
    rotated_x = np.asarray(m3.quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(rotated_x, [0.0, 0.0, 1.0], atol=1e-3)


def test_rotate_gizmo_snap():
    from scx.tools.editor import rotate_gizmo_drag

    e = rotate_gizmo_drag(
        np.zeros(3), (0.0, 1.0, 0.0), np.zeros(3),
        (2.0, 5.0, 0.0), (0.0, -1.0, 0.0),
        (1.99, 5.0, 0.4), (0.0, -1.0, 0.0),  # ~11.4 degrees
        snap_deg=45.0,
    )
    assert abs(e[1]) < 1e-5  # snapped to 0


def test_scale_gizmo_drag():
    from scx.tools.editor import scale_gizmo_drag

    # handle at x=1 dragged to x=2.5: scale.x doubles-and-a-half
    s = scale_gizmo_drag(
        np.ones(3), 0, np.zeros(3),
        (1.0, 5.0, 0.0), (0.0, -1.0, 0.0),
        (2.5, 5.0, 0.0), (0.0, -1.0, 0.0),
    )
    np.testing.assert_allclose(s, [2.5, 1.0, 1.0], atol=1e-5)
    s_u = scale_gizmo_drag(
        np.ones(3), 0, np.zeros(3),
        (1.0, 5.0, 0.0), (0.0, -1.0, 0.0),
        (2.0, 5.0, 0.0), (0.0, -1.0, 0.0),
        uniform=True,
    )
    np.testing.assert_allclose(s_u, [2.0, 2.0, 2.0], atol=1e-5)


def test_multi_select_group_transform_undo():
    from scx.tools.editor import select_toggle, translate_selection

    doc = EditorDocument()
    stack = CommandStack()
    for i in range(3):
        e = EditorEntity(id=doc.allocate_id(), position=np.asarray(
            [float(i), 0.0, 0.0], np.float32))
        stack.execute(doc, PlaceCommand(e))
    select_toggle(doc, 1)
    select_toggle(doc, 3)
    assert doc.selection == [1, 3]
    translate_selection(doc, stack, (0.0, 2.0, 0.0))
    assert doc.entities[1].position[1] == 2.0
    assert doc.entities[2].position[1] == 0.0  # unselected untouched
    assert doc.entities[3].position[1] == 2.0
    stack.undo(doc)  # ONE undo reverts the whole group move
    assert doc.entities[1].position[1] == 0.0
    assert doc.entities[3].position[1] == 0.0
    select_toggle(doc, 3)
    assert doc.selection == [1]


def _parity_doc():
    from scx.world import procgen

    doc = EditorDocument(sector=(0, 0))
    specs = [
        ((8.0, 1.0, 8.0), (0.0, 0.6, 0.0), (2.0, 2.0, 2.0)),
        ((14.0, 0.5, 10.0), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
        ((10.0, 1.5, 14.0), (0.3, 0.9, 0.1), (1.5, 3.0, 1.5)),
    ]
    for pos, rot, scale in specs:
        doc.entities[doc.allocate_id()] = EditorEntity(
            id=doc.next_id - 1,
            mesh_id=procgen.MESH_CUBE_ID,
            material_id=procgen.MATERIAL_UNLIT_ID,
            position=np.asarray(pos, np.float32),
            rotation=np.asarray(rot, np.float32),
            scale=np.asarray(scale, np.float32),
        )
    return doc


def test_editor_render_parity_with_streamed_runtime(tmp_path):
    """The golden visual-parity test (AGENTS.md:120-128): author a sector in
    the editor, render it via the runtime renderer; save the file, stream it
    into the runtime, render with the same camera — PIXEL-IDENTICAL."""
    import time

    from scx import state as st
    from scx.core.config import StreamingBudgets, WorldPartitionConfig
    from scx.render import RasterParams, render_frame
    from scx.render.camera import camera_view_proj
    from scx.render.mesh import build_mesh_pool
    from scx.tools.editor import build_draw_items
    from scx.world.culling import cull_entities, emit_draws
    from scx.world.streaming import WorldPartition

    doc = _parity_doc()
    raster = RasterParams(
        width=128, height=64, tile_h=16, tile_w=128,
        max_tris=2048, max_tris_per_tile=64, interpret=True,
    )
    pool = build_mesh_pool()
    vp = camera_view_proj(
        jnp.asarray([10.0, 12.0, -6.0]), jnp.asarray([10.0, 0.0, 10.0]),
        jnp.asarray([0.0, 1.0, 0.0]), aspect=2.0,
    )
    max_draws = 64

    # --- editor path: document -> DrawList -> runtime renderer
    draws_editor = build_draw_items(doc, max_draws=max_draws)
    rgb_editor, _, _ = render_frame(draws_editor, pool, vp, raster)

    # --- runtime path: save .scsector -> stream -> cull -> render
    sf = document_to_sector_file(doc)
    wf.write_sector_file(wf.build_sector_path(str(tmp_path), sf.sector), sf)
    cfg = WorldPartitionConfig(load_radius=0, unload_radius=1)
    wp = WorldPartition(cfg, StreamingBudgets(), capacity=64,
                        world_root=str(tmp_path))
    state = st.alloc_entity_state(64)
    for _ in range(30):
        state = wp.update(state, (10.0, 0.0, 10.0), (0.0, 0.0, -1.0))
        time.sleep(0.01)
    assert wp.stats.entities == 3
    visible, mats = cull_entities(state, vp)
    draws_runtime = emit_draws(state, visible, mats, max_draws)
    rgb_runtime, _, _ = render_frame(draws_runtime, pool, vp, raster)
    wp.shutdown()

    a = np.asarray(rgb_editor)
    b = np.asarray(rgb_runtime)
    assert a.std() > 0.01  # scene actually visible
    np.testing.assert_array_equal(a, b)
