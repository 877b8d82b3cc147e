from pointstowood_tpu.data.tiling import preprocess_cloud, Tile
from pointstowood_tpu.data.dataset import TileBatcher, pad_tiles

__all__ = ["preprocess_cloud", "Tile", "TileBatcher", "pad_tiles"]
