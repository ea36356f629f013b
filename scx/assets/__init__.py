from scx.assets.registry import AssetRegistryEntry, load_asset_registry
from scx.assets.textures import (
    load_ppm,
    load_image,
    fallback_texture,
    white_texture,
    checker_texture,
)
from scx.assets.gltf import load_glb, flatten_model_to_mesh, compute_mesh_bounds
from scx.assets.residency import AssetManager, ResidencyStats
