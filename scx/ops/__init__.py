from scx.ops.raster import rasterize_tiles, rasterize_reference
