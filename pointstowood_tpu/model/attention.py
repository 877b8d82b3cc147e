"""Attention model variants (archive capability parity).

Rebuilds the reference's archived attention components in the dense padded
layout:

* ``PositionalEncoding`` / ``AdaptiveBlending`` / ``ATSearchKNN`` — learned
  feature-space neighbor search (reference: pointstowood/archive/attknnv3.py):
  sinusoidal encoding of xyz, adaptive pos/feature blending weights, then
  kNN in the blended embedding space. The reference constructs its blending
  MLP *inside* forward (fresh random weights every call,
  attknnv3.py:68); here it is a registered flax submodule so the weights
  actually train — documented deviation.
* ``AttentivePointConv`` — neighborhood QKV attention message passing
  (reference: pointstowood/src/pointnetatt.py:1-117, an orphan fragment
  never imported by the live model): qkv projection over
  [rel-pos, reflectance, x_j], per-neighborhood softmax, LayerNorm -> MLP
  -> output projection, masked max aggregation.

The live Net exposes these behind ``attention_knn`` / ``attention_conv``
flags (archive/model_attknn.py:107-158 uses ATSearchKNN for the SA2/SA3
neighborhoods while keeping the plain PointNetConv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointstowood_tpu.model.layers import RefMLP
from pointstowood_tpu.model.pointconv import gather_rows
from pointstowood_tpu.ops.knn import knn_masked


class PositionalEncoding(nn.Module):
    """Sinusoidal encoding of xyz (attknnv3.py:12-28): per-axis sin/cos over
    linearly spaced frequency bands, truncated to d_model channels."""

    d_model: int
    max_freq: float = 10.0
    num_freq_bands: int = 64

    def __call__(self, xyz):
        freq = jnp.linspace(1.0, self.max_freq, self.num_freq_bands)
        x_freq = xyz[..., None] * freq  # (..., 3, F)
        enc = jnp.stack([jnp.sin(x_freq), jnp.cos(x_freq)], axis=-1)
        enc = enc.reshape(xyz.shape[:-1] + (-1,))
        return enc[..., : self.d_model]


class AdaptiveBlending(nn.Module):
    """Learned pos-vs-feature blending weights (attknnv3.py:30-50)."""

    attention_dim: int = 64

    @nn.compact
    def __call__(self, features, pos):
        fw = nn.Dense(1, name="feat2")(
            nn.relu(nn.Dense(self.attention_dim, name="feat1")(features))
        )
        pw = nn.Dense(1, name="pos2")(
            nn.relu(nn.Dense(self.attention_dim, name="pos1")(pos))
        )
        soft = jax.nn.softmax(jnp.concatenate([fw, pw], axis=-1), axis=-1)
        return soft[..., :1], soft[..., 1:2]


class ATSearchKNN(nn.Module):
    """Feature-space kNN (attknnv3.py:52-83): encode positions, blend
    encoded features and positions with learned weights, normalize per
    sample over valid points, and search neighbors in the blended space."""

    k: int
    attention_dim: int = 32
    knn_chunk: int = 1024
    knn_method: str = "fast"

    @nn.compact
    def __call__(self, x, pos4, mask, center_idx, center_valid):
        pos3 = pos4[..., :3]
        enc = PositionalEncoding(self.attention_dim, name="encoding")(pos3)
        feats = jnp.concatenate([x.astype(jnp.float32), enc], axis=-1)
        pos_enc = jnp.concatenate([pos3, enc], axis=-1)
        fw, pw = AdaptiveBlending(self.attention_dim, name="blending")(feats, pos_enc)
        combined = jnp.concatenate([pos_enc * pw, feats * fw], axis=-1)
        # per-sample masked standardization (attknnv3.py:7-10 normalizes per
        # batch id with scatter mean/std)
        m = mask[..., None].astype(combined.dtype)
        count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(combined * m, axis=1, keepdims=True) / count
        var = jnp.sum(jnp.square(combined - mean) * m, axis=1, keepdims=True) / count
        combined = (combined - mean) / (jnp.sqrt(var) + 1e-8)
        centers = gather_rows(combined, center_idx)
        nbr_idx, _, nbr_valid = jax.vmap(
            lambda q, s, qm, sm: knn_masked(
                q, s, k=self.k, query_mask=qm, source_mask=sm,
                chunk_size=self.knn_chunk, method=self.knn_method,
                with_dist=False)
        )(centers, combined, center_valid, mask)
        return nbr_idx, nbr_valid


class AttentivePointConv(nn.Module):
    """QKV neighborhood attention conv (pointnetatt.py:1-117) in the dense
    fixed-k layout. Message input order matches the reference
    (pointnetatt.py:61): [normalized rel-pos (3), reflectance (1), x_j]."""

    in_channels: int
    attention_division: int = 2
    # optional per-edge MLP applied after the attention block and before
    # the max aggregation (the reference's local_nn hook,
    # pointnetatt.py:83-84); widths start at in_channels.
    local_channels: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos4, center_idx, nbr_idx, nbr_valid, center_valid,
                 radius=None, use_running_average: bool = False):
        a = max(self.in_channels // self.attention_division, 32)
        src = jnp.concatenate([x.astype(jnp.float32), pos4], axis=-1)
        gathered = gather_rows(src, nbr_idx)
        pos_j = gathered[..., -4:]
        x_j = gathered[..., :-4]
        pos_i = gather_rows(pos4, center_idx)
        rel = pos_j[..., :3] - pos_i[..., None, :3]
        # safe sqrt: see pointconv.py (NaN gradient of norm at 0)
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-24)
        if radius is not None:
            nbr_valid = nbr_valid & (dist <= radius)
        max_dist = jnp.max(jnp.where(nbr_valid, dist, 0.0), axis=-1, keepdims=True)
        geo = rel / (max_dist[..., None] + 1e-8)
        combined = jnp.concatenate(
            [geo, pos_j[..., 3:4], x_j], axis=-1
        ).astype(self.dtype)

        qkv = nn.Dense(3 * a, use_bias=False, name="qkv_proj", dtype=self.dtype)(combined)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = float(a) ** -0.5
        logits = jnp.sum(q * k, axis=-1) * scale  # (B, S, k)
        logits = jnp.where(nbr_valid, logits.astype(jnp.float32), -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(nbr_valid, attn, 0.0)  # all-invalid rows -> zeros
        out = v * attn[..., None].astype(v.dtype)
        out = nn.LayerNorm(name="norm", dtype=self.dtype)(out)
        out = nn.relu(nn.Dense(a, use_bias=False, name="mlp", dtype=self.dtype)(out))
        out = nn.Dense(self.in_channels, use_bias=False, name="out_proj",
                       dtype=self.dtype)(out)
        if self.local_channels is not None:
            out = RefMLP(self.local_channels, name="local_nn", dtype=self.dtype)(
                out, mask=nbr_valid, use_running_average=use_running_average
            )
        neg = jnp.finfo(out.dtype).min
        agg = jnp.max(jnp.where(nbr_valid[..., None], out, neg), axis=-2)
        any_nbr = jnp.any(nbr_valid, axis=-1) & center_valid
        return jnp.where(any_nbr[..., None], agg, 0.0)
