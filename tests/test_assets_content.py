"""Registry-driven GLB content end-to-end: asset_registry.txt + .glb files
under a world root become device pool meshes + materials, and authored
sector instances referencing those asset ids stream in with the right
slots (reference handle-resolution path, sc_world_partition.cpp:746-797)."""

import pytest
import time

import numpy as np

from scx.assets.content import load_world_content
from scx.assets.registry import asset_id_from_path
from scx.assets.residency import AssetManager
from scx.core.config import AssetResidencyConfig
from scx.world import format as wf

from tests.test_assets import make_glb


def _author_world(root):
    (root / "models").mkdir()
    (root / "models" / "quad.glb").write_bytes(make_glb())
    (root / "asset_registry.txt").write_text(
        "quad|models/quad.glb|materials/quad_mat\n"
        "# comment line\n"
        "ghost|models/missing.glb|materials/ghost_mat\n"
    )
    mesh_id = asset_id_from_path("models/quad.glb")
    mat_id = asset_id_from_path("materials/quad_mat")
    sf = wf.SectorFile(sector=wf.SectorCoord(0, 0))
    sf.instances.append(
        wf.Instance(
            id=1, mesh_id=mesh_id, material_id=mat_id,
            transform=wf.Transform(position=(4.0, 1.0, 4.0)),
            name="quad_instance",
        )
    )
    wf.write_sector_file(wf.build_sector_path(str(root), sf.sector), sf)
    return mesh_id, mat_id


def test_load_world_content(tmp_path):
    mesh_id, mat_id = _author_world(tmp_path)
    assets = AssetManager(AssetResidencyConfig())
    content = load_world_content(str(tmp_path), assets)
    assert content is not None
    # builtin cube + triangle + the quad; missing.glb falls back to cube
    assert len(content.meshes) == 3
    assert content.mesh_slot[mesh_id] == 2
    assert content.mesh_slot[asset_id_from_path("models/missing.glb")] == 0
    assert content.material_slot[mat_id] == 0  # fresh AssetManager
    resolve = content.resolver(lambda kind, aid: -7)
    assert resolve("mesh", mesh_id) == 2
    assert resolve("mesh", 999999) == -7  # falls through to default


def test_no_registry_returns_none(tmp_path):
    assets = AssetManager(AssetResidencyConfig())
    assert load_world_content(str(tmp_path), assets) is None


@pytest.mark.slow
def test_sandbox_streams_glb_instance(tmp_path):
    from scx.app import Sandbox
    from scx.render import RasterParams

    mesh_id, mat_id = _author_world(tmp_path)
    sb = Sandbox(
        capacity=256,
        raster=RasterParams(
            width=128, height=32, tile_h=16, tile_w=128,
            max_tris=4096, max_tris_per_tile=64, interpret=True,
        ),
        world_root=str(tmp_path),
        with_traffic=False,
    )
    try:
        assert sb.content is not None
        # pool holds the imported quad at slot 2
        assert int(sb.mesh_pool.mesh_tri_count[2]) == 2
        for _ in range(20):
            sb.frame()
            time.sleep(0.01)
        slots = np.asarray(sb.state.render.mesh_id)
        alive = np.asarray(sb.state.alive)
        assert (slots[alive] == 2).any(), "authored GLB instance not streamed"
    finally:
        sb.shutdown()


def test_reference_shipped_registry_parses():
    """The reference's actual assets/world/asset_registry.txt loads with
    our parser and produces the same FNV ids its runtime would."""
    import os

    path = "/root/reference/assets/world/asset_registry.txt"
    if not os.path.exists(path):  # repo-only environments
        return
    from scx.assets.registry import load_asset_registry

    entries = load_asset_registry(path)
    labels = [e.label for e in entries]
    assert labels == ["Cube", "CheckerCube", "TestCube", "Triangle"]
    cube_ids = {e.mesh_id for e in entries if e.mesh_path == "meshes/cube"}
    assert len(cube_ids) == 1  # same path -> same FNV id
    assert cube_ids.pop() == asset_id_from_path("meshes/cube")
