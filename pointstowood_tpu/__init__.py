"""pointstowood_tpu — TPU-native wood/leaf semantic segmentation of TLS point clouds.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
harryjfowen/PointsToWood (reference mounted at /root/reference): PLY/PCD/LAS
ingestion, ground/reflectance normalization, multi-scale voxel tiling,
a PointNet++-style hierarchical encoder/decoder over padded static-shape
tile batches with fixed-k neighbor search, kNN fusion of tile predictions
back onto the original cloud, and training with focal-poly loss.

The design is TPU-first: dense (B, N, C) padded layouts with validity masks,
fixed-k neighbor index arrays instead of edge lists, XLA segment ops and
Pallas kernels instead of CUDA extensions, and pjit/mesh data parallelism
instead of single-device loops.
"""

__version__ = "0.1.0"
