from scx.core.prng import (
    mix32,
    hash_coord_seed,
    Rand01,
    fnv1a64,
    normalize_path_for_id,
    asset_id_from_path,
)
from scx.core import math3d
from scx.core.config import (
    WorldPartitionConfig,
    StreamingBudgets,
    TrafficConfig,
    AssetResidencyConfig,
    PhysicsConfig,
    RenderConfig,
    VehicleTuning,
    EngineConfig,
)
