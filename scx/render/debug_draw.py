"""Debug line drawing: host accumulator + device overlay pass.

The reference accumulates CPU line lists (grid/axes/sector bounds/entity
bounds/physics wireframes, sc_debug_draw.h:22-37, sc_debug_draw_system.cpp:
46-140) and streams them through a dedicated Vulkan line pipeline.  Here
lines rasterize as a scatter overlay on the finished frame: project both
endpoints, sample fixed points along each segment, depth-test against the
G-buffer and write colors — one fused pass for all lines.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from scx.core import math3d as m3

SAMPLES_PER_LINE = 64


class DebugDraw:
    """Host-side line accumulator (fixed capacity, cleared per frame)."""

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self.p0 = np.zeros((capacity, 3), np.float32)
        self.p1 = np.zeros((capacity, 3), np.float32)
        self.color = np.zeros((capacity, 3), np.float32)
        self.count = 0

    def clear(self):
        self.count = 0

    def add_line(self, a, b, color=(0.0, 1.0, 0.0)):
        if self.count >= self.capacity:
            return
        i = self.count
        self.p0[i] = a
        self.p1[i] = b
        self.color[i] = color
        self.count += 1

    def add_grid(self, center=(0.0, 0.0, 0.0), half: float = 32.0, step: float = 4.0,
                 color=(0.25, 0.25, 0.25)):
        """Grid + axes helper (sc_debug_draw.cpp:22-57)."""
        cx, cy, cz = center
        n = int(half / step)
        for i in range(-n, n + 1):
            o = i * step
            self.add_line((cx - half, cy, cz + o), (cx + half, cy, cz + o), color)
            self.add_line((cx + o, cy, cz - half), (cx + o, cy, cz + half), color)
        self.add_line((cx, cy, cz), (cx + 2, cy, cz), (1.0, 0.2, 0.2))
        self.add_line((cx, cy, cz), (cx, cy + 2, cz), (0.2, 1.0, 0.2))
        self.add_line((cx, cy, cz), (cx, cy, cz + 2), (0.2, 0.2, 1.0))

    def add_aabb(self, bmin, bmax, color=(1.0, 1.0, 0.2)):
        x0, y0, z0 = bmin
        x1, y1, z1 = bmax
        for a, b in (
            ((x0, y0, z0), (x1, y0, z0)), ((x1, y0, z0), (x1, y0, z1)),
            ((x1, y0, z1), (x0, y0, z1)), ((x0, y0, z1), (x0, y0, z0)),
            ((x0, y1, z0), (x1, y1, z0)), ((x1, y1, z0), (x1, y1, z1)),
            ((x1, y1, z1), (x0, y1, z1)), ((x0, y1, z1), (x0, y1, z0)),
            ((x0, y0, z0), (x0, y1, z0)), ((x1, y0, z0), (x1, y1, z0)),
            ((x1, y0, z1), (x1, y1, z1)), ((x0, y0, z1), (x0, y1, z1)),
        ):
            self.add_line(a, b, color)

    def arrays(self):
        n = self.capacity
        valid = np.zeros(n, bool)
        valid[: self.count] = True
        return (
            jnp.asarray(self.p0),
            jnp.asarray(self.p1),
            jnp.asarray(self.color),
            jnp.asarray(valid),
        )


def overlay_lines(rgb, depth, view_proj, p0, p1, color, valid, depth_test=True):
    """Scatter debug lines over the frame. rgb [H,W,3], depth [H,W]."""
    h, w = rgb.shape[0], rgb.shape[1]

    c0 = m3.transform_point_h(view_proj, p0)
    c1 = m3.transform_point_h(view_proj, p1)
    ok = valid & (c0[:, 3] > 1e-4) & (c1[:, 3] > 1e-4)

    t = jnp.linspace(0.0, 1.0, SAMPLES_PER_LINE)
    c = c0[:, None, :] + (c1 - c0)[:, None, :] * t[None, :, None]  # [L,S,4]
    ndc = c[..., 0:3] / jnp.maximum(c[..., 3:4], 1e-6)
    sx = ((ndc[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32)
    sy = ((ndc[..., 1] * 0.5 + 0.5) * h).astype(jnp.int32)
    z = ndc[..., 2]

    on = (
        ok[:, None]
        & (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        & (z >= 0.0) & (z <= 1.0)
    )
    if depth_test:
        safe_x = jnp.clip(sx, 0, w - 1)
        safe_y = jnp.clip(sy, 0, h - 1)
        scene_z = depth[safe_y, safe_x]
        on = on & (z <= scene_z + 1e-3)

    sx = jnp.where(on, sx, w)  # dropped by scatter mode="drop"
    cols = jnp.broadcast_to(color[:, None, :], c.shape[:2] + (3,))
    return rgb.at[sy.reshape(-1), sx.reshape(-1)].set(
        cols.reshape(-1, 3), mode="drop"
    )
