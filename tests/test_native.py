"""Native library: builds, and its codec/procgen are bit-compatible with
the Python implementations."""

import numpy as np
import pytest

from scx import native
from scx.core import prng
from scx.core.config import WorldPartitionConfig
from scx.world import format as wf
from scx.world import procgen


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_hashes_match(lib):
    for x in (0, 1, 0xDEADBEEF, 123456):
        assert lib.scn_mix32(x) == prng.mix32(x)
    assert lib.scn_hash_coord_seed(1337, -3, 7) == prng.hash_coord_seed(1337, -3, 7)
    assert lib.scn_fnv1a64(b"meshes/cube") == prng.fnv1a64("meshes/cube")


def test_sector_parse_matches_python(lib, tmp_path):
    f = wf.SectorFile(
        sector=wf.SectorCoord(-4, 9),
        instances=[
            wf.Instance(
                id=7, model_id=1, mesh_id=2, material_id=3,
                transform=wf.Transform((1, 2, 3), (0.1, 0.2, 0.3), (2, 2, 2)),
                name="a",
            ),
            wf.Instance(
                id=8, mesh_id=22, material_id=33,
                transform=wf.Transform((-5, 0, 4), (0, 1, 0), (1, 3, 1)),
                name="b",
            ),
        ],
        lanes=[wf.Lane(id=9, points=[(0, 0, 0), (1, 0, 2)])],
    )
    p = str(tmp_path / "s.scsector")
    wf.write_sector_file(p, f)
    data = open(p, "rb").read()
    out = native.parse_sector_instances(data)
    assert out is not None
    coord, transforms, ids = out
    assert coord == (-4, 9)
    assert len(transforms) == 2
    np.testing.assert_allclose(transforms[0], [1, 2, 3, 0.1, 0.2, 0.3, 2, 2, 2], atol=1e-6)
    assert ids[0].tolist() == [7, 1, 2, 3]
    assert ids[1].tolist() == [8, 0, 22, 33]


def test_procgen_matches_python(lib):
    cfg = WorldPartitionConfig(seed=1337)
    py = procgen.generate_sector_spawns(cfg, 3, -2)
    out = native.generate_sector_spawns(1337, 3, -2)
    assert out is not None
    transforms, kind = out
    assert len(transforms) == len(py)
    for i, rec in enumerate(py):
        np.testing.assert_allclose(transforms[i, 0:3], rec.position, atol=1e-5)
        np.testing.assert_allclose(transforms[i, 6:9], rec.scale, atol=1e-6)
        np.testing.assert_allclose(transforms[i, 4], rec.rotation[1], atol=1e-5)
    # material classes line up
    mat_map = {
        procgen.MATERIAL_CHECKER_ID: 1,
        procgen.MATERIAL_TEST_ID: 2,
        procgen.MATERIAL_UNLIT_ID: 3,
    }
    for i, rec in enumerate(py[1:], start=1):
        assert (kind[i] & 0xF) == mat_map[rec.material_asset_id]
        is_tri = rec.mesh_asset_id == procgen.MESH_TRIANGLE_ID
        assert bool(kind[i] >> 4) == is_tri
