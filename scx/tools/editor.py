"""Editor core: document, undo/redo commands, picking, gizmo math.

Headless port of the reference world editor's core (tools/world_editor/
editor_core/editor_core.h:50-216, editor_core.cpp): an EditorDocument holds a
sector's instances + selection + grid snap; mutations go through an
undo/redo command stack (Place/Delete/Transform/SetProperty,
editor_core.h:89-149); picking builds a ray from the inverse viewProj and
slab-tests entity world AABBs (editor_core.cpp:386-505); the translate gizmo
drags along a world axis with snapping (editor_core.cpp:507-601); documents
convert to/from SectorFile (editor_core.cpp:612-660).

The interactive ImGui shell is not reproduced — these operations are the
editor's engine-facing surface and drive the same renderer path
(scx.render) the runtime uses, preserving the reference's visual-parity
property (AGENTS.md:120-128).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import numpy as np

from scx.core import math3d as m3
from scx.world import format as wf

import jax.numpy as jnp


@dataclass
class EditorEntity:
    """Editor-side instance (mirror of sc_world.Instance + local AABB)."""

    id: int
    name: str = ""
    model_id: int = 0
    mesh_id: int = 0
    material_id: int = 0
    albedo_texture_id: int = 0
    material_flags: int = 0
    tags: int = 0
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    aabb_min: np.ndarray = field(default_factory=lambda: np.full(3, -0.5, np.float32))
    aabb_max: np.ndarray = field(default_factory=lambda: np.full(3, 0.5, np.float32))


@dataclass
class EditorDocument:
    """Sector document + selection + snapping (editor_core.h:50-60)."""

    sector: tuple = (0, 0)
    entities: dict = field(default_factory=dict)  # id -> EditorEntity
    selection: list = field(default_factory=list)
    grid_snap: float = 0.5
    next_id: int = 1
    dirty: bool = False

    def allocate_id(self) -> int:
        i = self.next_id
        self.next_id += 1
        return i

    def world_matrix(self, e: EditorEntity) -> np.ndarray:
        return np.asarray(
            m3.mat4_trs(
                jnp.asarray(e.position), jnp.asarray(e.rotation), jnp.asarray(e.scale)
            )
        )


# ---------------------------------------------------------------------------
# Undo/redo command stack (editor_core.h:89-149)
# ---------------------------------------------------------------------------

class Command:
    def apply(self, doc: EditorDocument):
        raise NotImplementedError

    def revert(self, doc: EditorDocument):
        raise NotImplementedError


@dataclass
class PlaceCommand(Command):
    entity: EditorEntity

    def apply(self, doc):
        doc.entities[self.entity.id] = dataclasses.replace(self.entity)
        doc.dirty = True

    def revert(self, doc):
        doc.entities.pop(self.entity.id, None)
        doc.selection = [s for s in doc.selection if s != self.entity.id]
        doc.dirty = True


@dataclass
class DeleteCommand(Command):
    entity_id: int
    _saved: EditorEntity | None = None

    def apply(self, doc):
        self._saved = doc.entities.pop(self.entity_id, None)
        doc.selection = [s for s in doc.selection if s != self.entity_id]
        doc.dirty = True

    def revert(self, doc):
        if self._saved is not None:
            doc.entities[self.entity_id] = self._saved
        doc.dirty = True


@dataclass
class TransformCommand(Command):
    entity_id: int
    position: np.ndarray
    rotation: np.ndarray
    scale: np.ndarray
    _old: tuple | None = None

    def apply(self, doc):
        e = doc.entities.get(self.entity_id)
        if e is None:
            return
        self._old = (e.position.copy(), e.rotation.copy(), e.scale.copy())
        e.position = np.asarray(self.position, np.float32)
        e.rotation = np.asarray(self.rotation, np.float32)
        e.scale = np.asarray(self.scale, np.float32)
        doc.dirty = True

    def revert(self, doc):
        e = doc.entities.get(self.entity_id)
        if e is None or self._old is None:
            return
        e.position, e.rotation, e.scale = self._old
        doc.dirty = True


@dataclass
class SetPropertyCommand(Command):
    entity_id: int
    prop: str
    value: object
    _old: object = None

    def apply(self, doc):
        e = doc.entities.get(self.entity_id)
        if e is None:
            return
        self._old = getattr(e, self.prop)
        setattr(e, self.prop, self.value)
        doc.dirty = True

    def revert(self, doc):
        e = doc.entities.get(self.entity_id)
        if e is None:
            return
        setattr(e, self.prop, self._old)
        doc.dirty = True


class CommandStack:
    def __init__(self, limit: int = 256):
        self.undo_stack: list[Command] = []
        self.redo_stack: list[Command] = []
        self.limit = limit

    def execute(self, doc: EditorDocument, cmd: Command):
        cmd.apply(doc)
        self.undo_stack.append(cmd)
        if len(self.undo_stack) > self.limit:
            self.undo_stack.pop(0)
        self.redo_stack.clear()

    def undo(self, doc: EditorDocument) -> bool:
        if not self.undo_stack:
            return False
        cmd = self.undo_stack.pop()
        cmd.revert(doc)
        self.redo_stack.append(cmd)
        return True

    def redo(self, doc: EditorDocument) -> bool:
        if not self.redo_stack:
            return False
        cmd = self.redo_stack.pop()
        cmd.apply(doc)
        self.undo_stack.append(cmd)
        return True


# ---------------------------------------------------------------------------
# Picking (editor_core.cpp:386-505)
# ---------------------------------------------------------------------------

def make_pick_ray(mouse_x, mouse_y, width, height, view_proj) -> tuple:
    """Mouse pixel -> world ray via inverse viewProj (NDC unproject)."""
    inv = np.linalg.inv(np.asarray(view_proj))
    ndc_x = (mouse_x + 0.5) / width * 2.0 - 1.0
    ndc_y = (mouse_y + 0.5) / height * 2.0 - 1.0
    p_near = inv @ np.asarray([ndc_x, ndc_y, 0.0, 1.0])
    p_far = inv @ np.asarray([ndc_x, ndc_y, 1.0, 1.0])
    p_near = p_near[:3] / p_near[3]
    p_far = p_far[:3] / p_far[3]
    d = p_far - p_near
    d = d / max(np.linalg.norm(d), 1e-9)
    return p_near.astype(np.float32), d.astype(np.float32)


def _ray_aabb(origin, direction, bmin, bmax):
    inv = 1.0 / np.where(np.abs(direction) < 1e-9, 1e-9, direction)
    t1 = (bmin - origin) * inv
    t2 = (bmax - origin) * inv
    tmin = np.max(np.minimum(t1, t2))
    tmax = np.min(np.maximum(t1, t2))
    if tmax < max(tmin, 0.0):
        return None
    return tmin if tmin >= 0 else tmax


def pick_entity(doc: EditorDocument, origin, direction):
    """Closest entity under the ray (world AABB slab test)."""
    best_t, best_id = None, None
    for eid, e in doc.entities.items():
        mat = doc.world_matrix(e)
        corners = []
        for cx in (e.aabb_min[0], e.aabb_max[0]):
            for cy in (e.aabb_min[1], e.aabb_max[1]):
                for cz in (e.aabb_min[2], e.aabb_max[2]):
                    p = mat @ np.asarray([cx, cy, cz, 1.0])
                    corners.append(p[:3])
        corners = np.asarray(corners)
        t = _ray_aabb(
            np.asarray(origin), np.asarray(direction),
            corners.min(0), corners.max(0),
        )
        if t is not None and (best_t is None or t < best_t):
            best_t, best_id = t, eid
    return best_id, best_t


# ---------------------------------------------------------------------------
# Gizmo (editor_core.cpp:507-601)
# ---------------------------------------------------------------------------

def translate_gizmo_drag(
    entity_pos, axis, ray_origin, ray_dir, grid_snap: float = 0.0
):
    """Closest point on the axis line to the pick ray -> new position with
    optional snapping along the axis."""
    p0 = np.asarray(entity_pos, np.float64)
    a = np.asarray(axis, np.float64)
    a = a / max(np.linalg.norm(a), 1e-9)
    o = np.asarray(ray_origin, np.float64)
    d = np.asarray(ray_dir, np.float64)
    # closest points of two lines: p0 + s*a and o + t*d
    b = a @ d
    denom = 1.0 - b * b
    if abs(denom) < 1e-9:
        return np.asarray(entity_pos, np.float32)
    r = o - p0
    s = (r @ a - b * (r @ d)) / denom
    if grid_snap > 0.0:
        s = round(s / grid_snap) * grid_snap
    return (p0 + a * s).astype(np.float32)


# ---------------------------------------------------------------------------
# Fly camera (editor_core.h:62-72)
# ---------------------------------------------------------------------------

@dataclass
class FlyCamera:
    position: np.ndarray = field(
        default_factory=lambda: np.asarray([0.0, 10.0, 20.0], np.float32)
    )
    yaw: float = 0.0
    pitch: float = -0.4
    speed: float = 12.0
    fast_multiplier: float = 4.0

    def forward(self) -> np.ndarray:
        cp = np.cos(self.pitch)
        return np.asarray(
            [np.sin(self.yaw) * cp, np.sin(self.pitch), -np.cos(self.yaw) * cp],
            np.float32,
        )

    def update(self, dt, move=(0.0, 0.0, 0.0), look=(0.0, 0.0), fast=False):
        self.yaw += look[0]
        self.pitch = float(np.clip(self.pitch + look[1], -1.5, 1.5))
        fwd = self.forward()
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= max(np.linalg.norm(right), 1e-9)
        v = self.speed * (self.fast_multiplier if fast else 1.0)
        self.position = (
            self.position
            + (fwd * move[2] + right * move[0] + np.asarray([0, 1, 0]) * move[1])
            * v
            * dt
        ).astype(np.float32)


# ---------------------------------------------------------------------------
# Document <-> SectorFile (editor_core.cpp:612-660)
# ---------------------------------------------------------------------------

def document_to_sector_file(doc: EditorDocument) -> wf.SectorFile:
    out = wf.SectorFile(sector=wf.SectorCoord(*doc.sector))
    for e in doc.entities.values():
        out.instances.append(
            wf.Instance(
                id=e.id,
                model_id=e.model_id,
                mesh_id=e.mesh_id,
                material_id=e.material_id,
                albedo_texture_id=e.albedo_texture_id,
                material_flags=e.material_flags,
                transform=wf.Transform(
                    tuple(map(float, e.position)),
                    tuple(map(float, e.rotation)),
                    tuple(map(float, e.scale)),
                ),
                name=e.name,
                tags=e.tags,
            )
        )
    return out


def sector_file_to_document(sf: wf.SectorFile) -> EditorDocument:
    doc = EditorDocument(sector=(sf.sector.x, sf.sector.z))
    max_id = 0
    for inst in sf.instances:
        e = EditorEntity(
            id=inst.id or doc.allocate_id(),
            name=inst.name,
            model_id=inst.model_id,
            mesh_id=inst.mesh_id,
            material_id=inst.material_id,
            albedo_texture_id=inst.albedo_texture_id,
            material_flags=inst.material_flags,
            tags=inst.tags,
            position=np.asarray(inst.transform.position, np.float32),
            rotation=np.asarray(inst.transform.rotation, np.float32),
            scale=np.asarray(inst.transform.scale, np.float32),
        )
        doc.entities[e.id] = e
        max_id = max(max_id, e.id)
    doc.next_id = max_id + 1
    return doc
