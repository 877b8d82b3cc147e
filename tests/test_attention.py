"""Attention-variant tests (archive capability parity)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointstowood_tpu.model import Net
from pointstowood_tpu.model.attention import (
    ATSearchKNN,
    AttentivePointConv,
    PositionalEncoding,
)


def _batch(seed=0, b=2, n=128):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    pos -= pos.mean(axis=1, keepdims=True)
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1)
    return jnp.array(pos), jnp.array(refl), jnp.array(mask), jnp.array(sf)


def test_positional_encoding_shape_and_range():
    pe = PositionalEncoding(32)
    xyz = jnp.array(np.random.default_rng(0).normal(size=(4, 10, 3)), jnp.float32)
    out = jax.jit(pe.__call__)(xyz)
    assert out.shape == (4, 10, 32)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6  # sin/cos bounded


def test_atsearch_returns_valid_neighbors():
    pos, refl, mask, sf = _batch(n=64)
    x = jnp.array(np.random.default_rng(1).normal(size=(2, 64, 16)), jnp.float32)
    pos4 = jnp.concatenate([pos, refl[..., None]], axis=-1)
    cidx = jnp.tile(jnp.arange(32, dtype=jnp.int32)[None], (2, 1))
    cval = jnp.ones((2, 32), bool)
    mod = ATSearchKNN(k=8, attention_dim=16, knn_chunk=32)
    v = jax.jit(mod.init)(jax.random.key(0), x, pos4, mask, cidx, cval)
    nbr_idx, nbr_valid = jax.jit(mod.apply)(v, x, pos4, mask, cidx, cval)
    assert nbr_idx.shape == (2, 32, 8)
    assert np.asarray(nbr_valid).all()
    assert np.asarray(nbr_idx).max() < 64
    # blending weights are registered parameters (the reference creates them
    # inside forward and never trains them — fixed here)
    assert "blending" in v["params"]


def test_attentive_conv_masking():
    rng = np.random.default_rng(2)
    b, n, s, k, c = 2, 64, 32, 8, 16
    x = jnp.array(rng.normal(size=(b, n, c)), jnp.float32)
    pos4 = jnp.array(rng.normal(size=(b, n, 4)), jnp.float32)
    cidx = jnp.array(rng.integers(0, n, size=(b, s)), jnp.int32)
    nidx = jnp.array(rng.integers(0, n, size=(b, s, k)), jnp.int32)
    nval = np.ones((b, s, k), bool)
    nval[:, -4:, :] = False  # centers with no valid neighbors
    cval = np.ones((b, s), bool)
    mod = AttentivePointConv(in_channels=c, local_channels=(c, 24, 32))
    v = jax.jit(mod.init)(
        jax.random.key(0), x, pos4, cidx, nidx, jnp.array(nval), jnp.array(cval)
    )
    out = jax.jit(
        lambda v, *a: mod.apply(v, *a, use_running_average=True)
    )(v, x, pos4, cidx, nidx, jnp.array(nval), jnp.array(cval))
    assert out.shape == (b, s, 32)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    np.testing.assert_array_equal(o[:, -4:, :], 0.0)  # empty neighborhoods -> 0
    assert np.abs(o[:, :-4]).max() > 0


@pytest.mark.parametrize("flags", [dict(attention_knn=True),
                                   dict(attention_conv=True)])
def test_attention_net_variants_forward(flags):
    pos, refl, mask, sf = _batch(n=128)
    net = Net(channels=8, knn_chunk=64, **flags)
    init_fn = jax.jit(functools.partial(net.init, training=False))
    v = init_fn({"params": jax.random.key(0)}, pos, refl, mask, sf)
    out = jax.jit(functools.partial(net.apply, training=False))(
        v, pos, refl, mask, sf
    )
    assert out.shape == (2, 128)
    assert np.isfinite(np.asarray(out)).all()
    if "attention_knn" in flags:
        assert "atsearch" in v["params"]["sa2_module"]
        assert "atsearch" not in v["params"]["sa1_module"]  # SA1 stays radius
