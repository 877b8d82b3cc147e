from pointstowood_tpu.io.loader import load_file, save_file
from pointstowood_tpu.io.ply import read_ply, write_ply
from pointstowood_tpu.io.pcd import read_pcd, write_pcd

__all__ = [
    "load_file",
    "save_file",
    "read_ply",
    "write_ply",
    "read_pcd",
    "write_pcd",
]
