from pointstowood_tpu.parallel.mesh import data_mesh

__all__ = ["data_mesh"]
