"""Sector/manifest binary format: byte-exact layout + roundtrip +
version compatibility (reference world_format.cpp)."""

import struct

from scx.world import format as wf


def sample_sector():
    return wf.SectorFile(
        sector=wf.SectorCoord(3, -2),
        instances=[
            wf.Instance(
                id=7,
                model_id=111,
                mesh_id=222,
                material_id=333,
                albedo_texture_id=444,
                material_flags=wf.MATERIAL_FLAG_USE_TEXTURE,
                transform=wf.Transform((1, 2, 3), (0.1, 0.2, 0.3), (2, 2, 2)),
                name="Building_A",
                tags=5,
            )
        ],
        lanes=[wf.Lane(id=9, flags=1, points=[(0, 0, 0), (1, 0, 2)])],
        spawners=[wf.Spawner(id=4, type=2, rate=0.5)],
        colliders=[wf.ColliderRec(id=6, shape=1, size=(1, 2, 3))],
    )


def test_roundtrip(tmp_path):
    p = str(tmp_path / "sector_3_-2.scsector")
    f = sample_sector()
    assert wf.write_sector_file(p, f)
    g = wf.read_sector_file(p)
    assert g is not None
    assert g.version == wf.SECTOR_VERSION
    assert (g.sector.x, g.sector.z) == (3, -2)
    inst = g.instances[0]
    assert inst.id == 7 and inst.model_id == 111 and inst.mesh_id == 222
    assert inst.material_id == 333 and inst.albedo_texture_id == 444
    assert inst.material_flags == 1 and inst.name == "Building_A" and inst.tags == 5
    assert abs(inst.transform.rotation[1] - 0.2) < 1e-6
    assert g.lanes[0].points[1] == (1.0, 0.0, 2.0)
    assert g.spawners[0].rate == 0.5
    assert g.colliders[0].shape == 1 and g.colliders[0].size == (1.0, 2.0, 3.0)


def test_byte_layout(tmp_path):
    """Header bytes and instance record size match the reference's v4 writer
    (world_format.cpp:85-105): record = 8+8+8+8+36+64+4+8+4 = 148."""
    p = str(tmp_path / "s.scsector")
    wf.write_sector_file(p, sample_sector())
    data = open(p, "rb").read()
    magic, version, sx, sz = struct.unpack_from("<IIii", data, 0)
    assert magic == 0x54434553  # "SECT"
    assert version == 4 and sx == 3 and sz == -2
    cid, size, count = struct.unpack_from("<III", data, 16)
    assert cid == struct.unpack("<I", b"INST")[0]
    assert count == 1
    assert size == 4 + 148


def test_v3_file_without_model_id(tmp_path):
    """Backward compat: a v3 file (no model_id) still loads."""
    p = str(tmp_path / "v3.scsector")
    f = sample_sector()
    f.version = 3
    wf.write_sector_file(p, f)
    g = wf.read_sector_file(p)
    assert g.version == 3
    inst = g.instances[0]
    assert inst.model_id == 0  # absent in v3
    assert inst.mesh_id == 222 and inst.name == "Building_A"
    assert inst.albedo_texture_id == 444  # overrides exist in v3


def test_unknown_chunk_skipped(tmp_path):
    p = str(tmp_path / "x.scsector")
    wf.write_sector_file(p, sample_sector())
    data = open(p, "rb").read()
    # splice an unknown chunk right after the header
    unknown = struct.pack("<II", 0x5A5A5A5A, 8) + b"ZZZZZZZZ"
    data2 = data[:16] + unknown + data[16:]
    open(p, "wb").write(data2)
    g = wf.read_sector_file(p)
    assert g is not None and len(g.instances) == 1


def test_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "world_manifest.scworld")
    m = wf.WorldManifest(sectors=[wf.SectorCoord(0, 0), wf.SectorCoord(-5, 7)])
    wf.write_world_manifest(p, m)
    g = wf.read_world_manifest(p)
    assert [(c.x, c.z) for c in g.sectors] == [(0, 0), (-5, 7)]
    data = open(p, "rb").read()
    assert struct.unpack_from("<I", data, 0)[0] == 0x444C5257  # "WRLD"


def test_sector_path():
    assert wf.build_sector_path("/w", wf.SectorCoord(3, -2)).endswith(
        "sectors/sector_3_-2.scsector"
    )
