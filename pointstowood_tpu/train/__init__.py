from pointstowood_tpu.train.loss import poly1_focal_loss
from pointstowood_tpu.train.schedule import onecycle_cos_lr, cosine_warmup_restarts_lr
from pointstowood_tpu.train.metrics import binary_counts, batch_metrics

__all__ = [
    "poly1_focal_loss",
    "onecycle_cos_lr",
    "cosine_warmup_restarts_lr",
    "binary_counts",
    "batch_metrics",
]
