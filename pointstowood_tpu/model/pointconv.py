"""Fixed-k PointNet set-abstraction convolution.

TPU-native reformulation of the reference's custom PointNetConv
(reference: pointstowood/src/pointnet.py:20-132). The edge-list +
scatter-max message passing becomes: gather the (B, S, k) neighborhoods,
build per-edge messages, run the local MLP over the dense (B, S, k, C)
block (pure matmuls on the MXU), and reduce with a masked max over the k
axis.

Message layout matches the reference exactly (pointnet.py:116-132):
``[x_j, (pos_j - pos_i) / (max_dist_i + 1e-8), reflectance_j]`` where
``max_dist_i`` is the per-center maximum neighbor distance (the reference's
scatter_max over edge targets).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointstowood_tpu.model.layers import RefMLP


def gather_points(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: arr (B, N, C), idx (B, ...) -> (B, ..., C)."""
    b = arr.shape[0]
    flat = idx.reshape(b, -1)
    out = jnp.take_along_axis(arr, flat[..., None], axis=1)
    return out.reshape(idx.shape + (arr.shape[-1],))


class PointConv(nn.Module):
    """One set-abstraction conv over a padded batch.

    Inputs:
      x:          (B, N, C_in) source features, or None at the stem stage
      pos4:       (B, N, 4) source xyz (already divided by the per-sample
                  scale factor, as the reference does at model.py:122) +
                  reflectance (NOT scaled, matching model.py:109,122)
      center_idx: (B, S) int32 indices of sampled centers into the sources
      nbr_idx:    (B, S, k) int32 neighbor indices into the sources
      nbr_valid:  (B, S, k) bool neighbor validity
      center_valid: (B, S) bool
    Output: (B, S, C_out) features, zero at invalid centers.
    """

    channels: tuple  # local_nn widths, e.g. (C+4, 2C, 4C)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos4, center_idx, nbr_idx, nbr_valid, center_valid,
                 use_running_average: bool = False):
        pos_j = gather_points(pos4, nbr_idx)              # (B, S, k, 4)
        pos_i = gather_points(pos4, center_idx)           # (B, S, 4)
        # geometry in fp32 (relative positions of nearby points would lose
        # ~all precision in bf16); the MLP compute runs in self.dtype.
        rel = pos_j[..., :3] - pos_i[..., None, :3]       # (B, S, k, 3)
        dist = jnp.linalg.norm(rel, axis=-1)              # (B, S, k)
        max_dist = jnp.max(jnp.where(nbr_valid, dist, 0.0), axis=-1, keepdims=True)
        geo = (rel / (max_dist[..., None] + 1e-8)).astype(self.dtype)
        refl_j = pos_j[..., 3:4].astype(self.dtype)
        if x is None:
            msg = jnp.concatenate([geo, refl_j], axis=-1)
        else:
            x_j = gather_points(x.astype(self.dtype), nbr_idx)  # (B, S, k, C_in)
            msg = jnp.concatenate([x_j, geo, refl_j], axis=-1)
        msg = RefMLP(self.channels, name="local_nn", dtype=self.dtype)(
            msg, mask=nbr_valid, use_running_average=use_running_average
        )
        neg = jnp.finfo(msg.dtype).min
        out = jnp.max(jnp.where(nbr_valid[..., None], msg, neg), axis=-2)
        # centers with no valid neighbors (padding only) -> 0, matching the
        # scatter-max fill for untouched rows.
        any_nbr = jnp.any(nbr_valid, axis=-1) & center_valid
        return jnp.where(any_nbr[..., None], out, 0.0)
