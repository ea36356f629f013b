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
    local = m3.mat4_trs_quat(t.pos, t.rot, t.scale)
    # hierarchy resolution by pointer jumping: K gather passes support
    # chains of depth 2^K (the reference walks arbitrary depth with dirty
    # flags, sc_ecs.cpp:118-211; city content is shallow, K=3 covers 8)
    mats = local
    anc = t.parent  # 2^k-th ancestor (or -1)
    for _ in range(3):
        has = anc >= 0
        safe = jnp.maximum(anc, 0)
        mats = jnp.where(
            has[:, None, None], m3.mat4_mul(mats[safe], mats), mats
        )
        anc = jnp.where(has, anc[safe], -1)  # ancestor doubling
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
