from scx.render.mesh import (
    MeshPool,
    build_mesh_pool,
    builtin_cube,
    builtin_triangle,
    MESH_CUBE,
    MESH_TRIANGLE,
)
from scx.render.pipeline import (
    DrawList,
    RasterParams,
    render_frame,
    expand_draws,
    setup_triangles,
    bin_triangles,
    shade,
)
from scx.render.camera import camera_view_proj, CameraParams
