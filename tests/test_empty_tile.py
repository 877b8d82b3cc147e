"""Regression: a fully padded sample in a batch (the batcher pads the final
partial batch with empty tiles) must not poison valid samples.

The original failure chain: masked max over an all-invalid sample ->
finfo.min -> bf16 matmul overflow to inf -> inf * 0 mask products = NaN in
BatchNorm batch statistics -> NaN logits for every sample in the batch ->
the training step's finite guard skipped those batches every epoch.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.config import TrainConfig
from pointstowood_tpu.model import Net
from pointstowood_tpu.train.trainer import make_optimizer, make_train_step


def _batch_with_empty_sample(b=4, n=128, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    pos -= pos.mean(axis=1, keepdims=True)
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[-1] = False  # fully padded sample
    pos[-1] = 0.0
    refl[-1] = 0.0
    sf = np.maximum(np.linalg.norm(pos, axis=2).max(axis=1), 1e-12)
    sf[-1] = 1.0
    labels = rng.integers(0, 2, size=(b, n)).astype(np.float32)
    labels[-1] = 0.0
    return tuple(map(jnp.asarray, (pos, refl, mask, sf, labels)))


def test_empty_sample_keeps_valid_logits_finite_bf16():
    pos, refl, mask, sf, _ = _batch_with_empty_sample()
    net = Net(channels=8, knn_chunk=64, dtype=jnp.bfloat16)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, refl, mask, sf
    )
    out = jax.jit(functools.partial(net.apply, training=False))(
        variables, pos, refl, mask, sf
    )
    o = np.asarray(out)
    assert np.isfinite(o[:3]).all(), "valid samples contaminated"

    # valid-sample logits must equal those of the same batch without the
    # empty sample (same compiled shapes: reuse with a full mask)
    mask_full = jnp.asarray(np.ones(mask.shape, bool))
    pos2 = pos.at[-1].set(pos[0])
    refl2 = refl.at[-1].set(refl[0])
    sf2 = sf.at[-1].set(sf[0])
    out2 = jax.jit(functools.partial(net.apply, training=False))(
        variables, pos2, refl2, mask_full, sf2
    )
    np.testing.assert_allclose(
        np.asarray(out2)[:3], o[:3], rtol=2e-2, atol=2e-3
    )


def test_empty_sample_train_step_finite_bf16():
    cfg = TrainConfig()
    net = Net(channels=8, knn_chunk=64, dtype=jnp.bfloat16)
    pos, refl, mask, sf, labels = _batch_with_empty_sample()
    variables = jax.jit(functools.partial(net.init, training=True))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        pos, refl, mask, sf,
    )
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])
    step = make_train_step(net, tx, cfg)
    _, _, _, loss, _, finite = step(
        variables["params"], variables["batch_stats"], opt_state,
        pos, refl, mask, sf, labels, jnp.float32(1e-4), jax.random.key(2),
    )
    assert bool(finite), "train step reported non-finite with an empty sample"
    assert np.isfinite(float(loss))
