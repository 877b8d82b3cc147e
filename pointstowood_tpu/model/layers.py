"""Masked building blocks of the backbone.

These reproduce the torch layer semantics of the reference under a padded
static-shape layout: every op takes a validity mask and computes statistics
over valid elements only, so padding never leaks into results.

BatchNorm note: every BatchNorm1d in the reference normalizes per channel
over the flattened point/edge dimension (the model runs "batch-as-one-graph"
with (sum N_i, C) tensors, and the Conv1d blocks run on a (1, C, N) view —
reference: pointstowood/src/model.py:75-85, 241-243). MaskedBatchNorm below
is that exact operation over (..., C) with a mask.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-channel dims, restricted to valid elements.

    Follows torch.nn.BatchNorm1d semantics: train time normalizes with the
    biased batch variance and updates running stats as
    ``running = (1 - momentum) * running + momentum * batch`` with the
    *unbiased* batch variance (torch momentum convention, default 0.1);
    eval time normalizes with running stats.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )

        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = jnp.float32(x32.size // x32.shape[-1])
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
            else:
                # where(), never x * mask: masked lanes can hold inf garbage
                # (e.g. a fully padded sample downstream of a masked max)
                # and inf * 0 = NaN would poison the whole batch statistic.
                m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
                n = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
                mean = jnp.sum(jnp.where(m, x32, 0.0), axis=reduce_axes) / n
                var = jnp.sum(
                    jnp.where(m, jnp.square(x32 - mean), 0.0), axis=reduce_axes
                ) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class RefMLP(nn.Module):
    """The reference's MLP factory (model.py:198-202): for channel list
    [c0, c1, ..., cn], each block is Linear -> ReLU, with a BatchNorm after
    the ReLU on every block except the first.

    ``dtype`` is the compute dtype (activations + matmul); parameters and
    BatchNorm statistics stay fp32. bfloat16 here is the TPU analogue of
    the reference's AMP autocast (trainer.py:174, predicter.py:197).
    """

    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        x = x.astype(self.dtype)
        for i in range(1, len(self.channels)):
            x = nn.Dense(self.channels[i], name=f"lin{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
            if i != 1:
                x = MaskedBatchNorm(self.channels[i], name=f"bn{i}")(
                    x, mask=mask, use_running_average=use_running_average
                )
        return x


class DepthwiseSeparableBlock(nn.Module):
    """DepthwiseSeparableConv1d with kernel_size=1 (model.py:18-44).

    A 1x1 depthwise conv is a per-channel affine; the pointwise conv is a
    Dense. Sequence: depthwise -> BN -> ReLU -> pointwise -> BN -> ReLU.
    (The reference's pointwise_bn is sized in_channels — only valid because
    in == out everywhere it is used; we keep in == out.)
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        dw_scale = self.param("dw_scale", nn.initializers.ones, (self.features,))
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (self.features,))
        x = x * dw_scale.astype(self.dtype) + dw_bias.astype(self.dtype)
        x = MaskedBatchNorm(self.features, name="dw_bn")(
            x, mask=mask, use_running_average=use_running_average
        )
        x = nn.relu(x)
        x = nn.Dense(self.features, name="pw", dtype=self.dtype)(x)
        x = MaskedBatchNorm(self.features, name="pw_bn")(
            x, mask=mask, use_running_average=use_running_average
        )
        return nn.relu(x)


class InvertedResidualBlock(nn.Module):
    """MobileNet-style inverted residual over per-point features
    (model.py:46-85). All convs are 1x1, so everything is Dense/affine.
    in_features == out_features in every use (the reference shortcut is then
    the identity)."""

    features: int
    expansion_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        ura = use_running_average
        dt = self.dtype
        expanded = self.features * self.expansion_factor
        x = x.astype(dt)
        h = nn.Dense(expanded, name="expand", dtype=dt)(x)
        h = MaskedBatchNorm(expanded, name="expand_bn")(h, mask=mask, use_running_average=ura)
        h = nn.relu(h)
        h = DepthwiseSeparableBlock(expanded, name="ds1", dtype=dt)(h, mask=mask, use_running_average=ura)
        h = MaskedBatchNorm(expanded, name="mid_bn")(h, mask=mask, use_running_average=ura)
        h = nn.relu(h)
        h = DepthwiseSeparableBlock(expanded, name="ds2", dtype=dt)(h, mask=mask, use_running_average=ura)
        h = MaskedBatchNorm(expanded, name="out_bn")(h, mask=mask, use_running_average=ura)
        h = nn.Dense(self.features, name="project", dtype=dt)(h)
        h = MaskedBatchNorm(self.features, name="project_bn")(h, mask=mask, use_running_average=ura)
        return nn.relu(h + x)


class ReflectanceGate(nn.Module):
    """The reference's ReflectanceYesNo module (model.py:155-175).

    Its output is identically 1.0: gumbel_softmax(hard=True) over a single
    logit is a one-hot of one category, and the softmax Jacobian of a
    1-element axis is zero, so no gradient reaches the fc weights either.
    The parameters are created anyway (they exist in reference checkpoints
    and must round-trip through the converter); the computation is dead code
    that XLA eliminates.
    """

    hidden_dim: int = 32

    @nn.compact
    def __call__(self, reflectance, mask=None):
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(reflectance[..., None]))
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(h))
        if mask is None:
            pooled = jnp.mean(h, axis=-2)
        else:
            m = mask[..., None]
            pooled = jnp.sum(jnp.where(m, h, 0.0), axis=-2) / jnp.maximum(
                jnp.sum(m.astype(h.dtype), axis=-2), 1.0
            )
        _ = nn.Dense(1, name="fc3")(pooled)  # dead: gate is identically 1
        return jnp.ones_like(reflectance)


class ReflectanceWeighting(nn.Module):
    """The reference's ReflectanceWeighting module (model.py:177-196).

    DEAD CODE UPSTREAM: defined but never instantiated by the reference
    Net, so its parameters appear in no checkpoint and it affects no
    output. Provided so the component inventory is complete including the
    reference's dead code; wiring it in is a deliberate model change.

    Semantics (dense/masked formulation of the reference's flat-graph
    one): a 2-layer ReLU MLP over per-point reflectance, mean-pooled per
    tile (the reference's scatter_add / bincount pooling over `batch`),
    projected to one relu'd scalar weight per tile, broadcast back to
    every point of that tile.
    """

    hidden_dim: int = 32

    @nn.compact
    def __call__(self, reflectance, mask=None):
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(reflectance[..., None]))
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(h))
        if mask is None:
            pooled = jnp.mean(h, axis=-2)
        else:
            m = mask[..., None]
            pooled = jnp.sum(jnp.where(m, h, 0.0), axis=-2) / jnp.maximum(
                jnp.sum(m.astype(h.dtype), axis=-2), 1.0
            )
        w = nn.relu(nn.Dense(1, name="fc3")(pooled))  # (..., 1) per tile
        return jnp.broadcast_to(w, reflectance.shape)
