from pointstowood_tpu.predict.fusion import Fusion, fuse_labels
from pointstowood_tpu.predict.predicter import run_inference, semantic_segmentation

__all__ = ["Fusion", "fuse_labels", "run_inference", "semantic_segmentation"]
