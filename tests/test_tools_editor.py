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
