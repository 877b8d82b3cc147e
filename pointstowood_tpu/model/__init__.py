from pointstowood_tpu.model.network import Net
from pointstowood_tpu.model.layers import MaskedBatchNorm, RefMLP, InvertedResidualBlock

__all__ = ["Net", "MaskedBatchNorm", "RefMLP", "InvertedResidualBlock"]
