from scx.world.format import (
    SectorCoord,
    Instance,
    Lane,
    Spawner,
    ColliderRec,
    SectorFile,
    WorldManifest,
    read_sector_file,
    write_sector_file,
    read_world_manifest,
    write_world_manifest,
    build_sector_path,
    build_world_manifest_path,
)
from scx.world.procgen import SpawnRecord, generate_sector_spawns
from scx.world.streaming import WorldPartition, SectorState, StreamingStats
from scx.world.culling import cull_entities, emit_draws
