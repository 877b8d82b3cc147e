from pointstowood_tpu.ops.knn import knn_masked, radius_masked
from pointstowood_tpu.ops.voxel import voxel_cell_ids, voxel_representatives
from pointstowood_tpu.ops.sampling import compact_indices, random_sample
from pointstowood_tpu.ops.interpolate import knn_interpolate
from pointstowood_tpu.ops.normalization import quantile_normalize

__all__ = [
    "knn_masked",
    "radius_masked",
    "voxel_cell_ids",
    "voxel_representatives",
    "compact_indices",
    "random_sample",
    "knn_interpolate",
    "quantile_normalize",
]
