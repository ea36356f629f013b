"""On-device culling + draw-list emission.

The reference's CullingSystem runs a parallel-for sphere-vs-frustum test over
all entities (sc_world_partition.cpp:1240-1271) and RenderPrep emits
DrawItems for visible entities under a max-draws budget
(sc_world_partition.cpp:1286-1359).  Here both are single fused array ops —
the parallel-for IS the array.
"""

from __future__ import annotations

import jax.numpy as jnp

from scx.core import math3d as m3
from scx.render.pipeline import DrawList
from scx.state.entity import EntityState


def world_matrices(state: EntityState):
    """Per-entity world matrix from TRS (flat hierarchy fast path; parented
    transforms resolved by one gather pass per level)."""
    t = state.transform
    mats = m3.mat4_trs_quat(t.pos, t.rot, t.scale)
    # one parent level (wheels under chassis etc.); roots have parent == -1.
    # Deeper chains would need K gather passes — the reference's city content
    # is depth <= 1 (sc_ecs.cpp:118-211 walks arbitrary depth; we fix K=1).
    has_parent = t.parent >= 0
    parent_idx = jnp.maximum(t.parent, 0)
    mats = jnp.where(
        has_parent[:, None, None], m3.mat4_mul(mats[parent_idx], mats), mats
    )
    return mats


def cull_entities(state: EntityState, view_proj, freeze_planes=None):
    """Visibility mask via world bounding sphere vs frustum
    (Gribb-Hartmann planes). freeze_planes: debug frozen-culling frustum
    (sc_world_partition.cpp:1227-1233)."""
    planes = (
        freeze_planes
        if freeze_planes is not None
        else m3.frustum_from_view_proj(view_proj)
    )
    mats = world_matrices(state)
    center, radius = m3.world_bounding_sphere(
        state.render.aabb_min, state.render.aabb_max, mats
    )
    vis = m3.sphere_in_frustum(planes, center, radius)
    renderable = state.alive & (state.render.mesh_id >= 0)
    return vis & renderable, mats


def emit_draws(state: EntityState, visible, mats, max_draws: int) -> DrawList:
    """Visible entities -> fixed-capacity DrawList (maxDraws budget,
    sc_world_partition.h:311). Deterministic lowest-slot-first selection."""
    n = state.capacity
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(visible, idx, n)
    order = jnp.sort(key)[:max_draws]
    ok = order < n
    sel = jnp.minimum(order, n - 1)
    return DrawList(
        mesh_id=jnp.where(ok, state.render.mesh_id[sel], 0),
        material_id=jnp.where(ok, state.render.material_id[sel], 0),
        model=mats[sel],
        valid=ok,
    )
