"""Procedural sector content: bit-compatible with the reference generator.

Goldens from an independent C++ implementation of the documented hash chain
(sc_world_partition.cpp:105-169 semantics)."""

import numpy as np

from scx.core.config import WorldPartitionConfig
from scx.world import procgen


def test_spawn_chain_golden():
    cfg = WorldPartitionConfig(seed=1337)
    recs = procgen.generate_sector_spawns(cfg, 3, -2)
    # ground + 19 props (golden count)
    assert len(recs) == 1 + 19
    g = recs[0]
    assert g.name == "Ground_3_-2"
    np.testing.assert_allclose(g.position, (224.0, -0.55, -96.0), atol=1e-5)
    np.testing.assert_allclose(g.scale, (64.0, 0.10, 64.0), atol=1e-6)
    assert g.mesh_asset_id == procgen.MESH_CUBE_ID
    assert g.material_asset_id == procgen.MATERIAL_UNLIT_ID

    p0 = recs[1]
    np.testing.assert_allclose(
        [p0.position[0], p0.position[2]], [228.490219, -119.450920], atol=2e-4
    )
    np.testing.assert_allclose(
        p0.scale, [0.887658, 2.478235, 1.769432], atol=1e-5
    )
    np.testing.assert_allclose(p0.position[1], 2.478235 * 0.5, atol=1e-5)
    np.testing.assert_allclose(p0.rotation[1], 0.162772, atol=1e-5)
    # m=0.047485 < 0.40 -> checker; mesh roll 0.483297 < 0.9 -> cube
    assert p0.material_asset_id == procgen.MATERIAL_CHECKER_ID
    assert p0.mesh_asset_id == procgen.MESH_CUBE_ID

    p1 = recs[2]
    np.testing.assert_allclose(
        [p1.position[0], p1.position[2]], [195.680466, -111.903297], atol=2e-4
    )
    # m=0.444118 in [0.40, 0.80) -> test material
    assert p1.material_asset_id == procgen.MATERIAL_TEST_ID

    p2 = recs[3]
    np.testing.assert_allclose(p2.rotation[1], 3.353550, atol=1e-5)
    # m=0.832188 >= 0.80 -> unlit
    assert p2.material_asset_id == procgen.MATERIAL_UNLIT_ID


def test_determinism_and_bounds():
    cfg = WorldPartitionConfig(seed=42)
    a = procgen.generate_sector_spawns(cfg, -7, 11)
    b = procgen.generate_sector_spawns(cfg, -7, 11)
    assert [r.position for r in a] == [r.position for r in b]
    size = cfg.sector_size_meters
    for r in a[1:]:
        assert -7 * size + 1.0 <= r.position[0] <= -6 * size - 1.0
        assert 11 * size + 1.0 <= r.position[2] <= 12 * size - 1.0
        assert cfg.props_per_sector_min <= len(a) - 1 <= cfg.props_per_sector_max


def test_spawns_to_arrays():
    cfg = WorldPartitionConfig()
    arrs = procgen.spawns_to_arrays(procgen.generate_sector_spawns(cfg, 0, 0))
    n = arrs["pos"].shape[0]
    assert arrs["mesh"].shape == (n,) and arrs["scale"].shape == (n, 3)
    assert arrs["mesh"].dtype == np.uint64
