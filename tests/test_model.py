"""Backbone tests: shapes, masking invariance, train/eval modes, gradients.

Everything is jitted: eager JAX dispatch is pathologically slow in this
environment (see conftest), and jit is the only supported execution mode of
the framework anyway.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointstowood_tpu.model import Net
from pointstowood_tpu.model.layers import MaskedBatchNorm, RefMLP


def _tile_batch(seed=0, b=2, n=128):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    pos -= pos.mean(axis=1, keepdims=True)
    sf = np.linalg.norm(pos, axis=2).max(axis=1)
    return jnp.array(pos), jnp.array(refl), jnp.array(mask), jnp.array(sf)


NET = Net(knn_chunk=64)


@functools.lru_cache(maxsize=None)
def _fns():
    init_eval = jax.jit(functools.partial(NET.init, training=False))
    init_train = jax.jit(functools.partial(NET.init, training=True))
    apply_eval = jax.jit(functools.partial(NET.apply, training=False))

    def _train(variables, pos, refl, mask, sf, key):
        return NET.apply(
            variables, pos, refl, mask, sf, training=True,
            rngs={"sample": key}, mutable=["batch_stats"],
        )

    apply_train = jax.jit(_train)
    return init_eval, init_train, apply_eval, apply_train


# --------------------------------------------------------------- layers


def test_masked_batchnorm_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 6)).astype(np.float32) * 3 + 1
    bn = MaskedBatchNorm(6)
    variables = jax.jit(bn.init)(jax.random.key(0), jnp.array(x))
    out, mutated = jax.jit(
        lambda v, a: bn.apply(v, a, mutable=["batch_stats"])
    )(variables, jnp.array(x))
    tbn = torch.nn.BatchNorm1d(6)
    tout = tbn(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    # eval mode uses running stats
    tbn.eval()
    ev = jax.jit(lambda v, a: bn.apply(v, a, use_running_average=True))(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        jnp.array(x),
    )
    np.testing.assert_allclose(
        np.asarray(ev), tbn(torch.tensor(x)).detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_masked_batchnorm_ignores_padding():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    xp = np.concatenate([x, 100 * np.ones((6, 4), np.float32)])
    mask = np.array([True] * 10 + [False] * 6)
    bn = MaskedBatchNorm(4)
    v = jax.jit(bn.init)(jax.random.key(0), jnp.array(x))
    out_ref, _ = jax.jit(lambda v, a: bn.apply(v, a, mutable=["batch_stats"]))(v, jnp.array(x))
    out_pad, _ = jax.jit(
        lambda v, a, m: bn.apply(v, a, mask=m, mutable=["batch_stats"])
    )(v, jnp.array(xp), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(out_pad)[:10], np.asarray(out_ref), rtol=1e-4, atol=1e-5)


def test_refmlp_layer_structure():
    mlp = RefMLP((4, 8, 16))
    v = jax.jit(mlp.init)(jax.random.key(0), jnp.zeros((2, 4)))
    assert set(v["params"].keys()) == {"lin1", "lin2", "bn2"}  # no bn1


# --------------------------------------------------------------- network


def test_net_forward_shapes_and_padding_invariance():
    init_eval, _, apply_eval, _ = _fns()
    pos, refl, mask, sf = _tile_batch(b=2, n=128)
    variables = init_eval({"params": jax.random.key(0)}, pos, refl, mask, sf)
    logits = apply_eval(variables, pos, refl, mask, sf)
    assert logits.shape == (2, 128)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()

    # mark the tail of each sample invalid and fill with garbage: valid
    # logits must be unaffected (same static shape => same compiled fn)
    n_valid = 96
    mask2 = np.ones((2, 128), bool)
    mask2[:, n_valid:] = False
    pos2 = np.asarray(pos).copy()
    refl2 = np.asarray(refl).copy()
    pos2[:, n_valid:] = 55.0
    refl2[:, n_valid:] = -9.0
    base = apply_eval(variables, jnp.array(pos2) * 0 + pos, refl, jnp.array(mask2), sf)
    poisoned = apply_eval(variables, jnp.array(pos2), jnp.array(refl2), jnp.array(mask2), sf)
    np.testing.assert_allclose(
        np.asarray(poisoned)[:, :n_valid], np.asarray(base)[:, :n_valid],
        rtol=2e-3, atol=2e-4,
    )


def test_net_train_mode_runs_and_differs_by_rng():
    _, init_train, _, apply_train = _fns()
    pos, refl, mask, sf = _tile_batch(b=2, n=128)
    variables = init_train(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        pos, refl, mask, sf,
    )
    out1, mut = apply_train(variables, pos, refl, mask, sf, jax.random.key(5))
    out2, _ = apply_train(variables, pos, refl, mask, sf, jax.random.key(6))
    assert out1.shape == (2, 128)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(mut["batch_stats"]["norm"]["mean"]), 0.0)


def test_net_gradients_flow():
    _, init_train, _, _ = _fns()
    pos, refl, mask, sf = _tile_batch(b=1, n=128)
    variables = init_train(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        pos, refl, mask, sf,
    )

    @jax.jit
    def grad_fn(params):
        def loss_fn(p):
            logits, _ = NET.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                pos, refl, mask, sf, training=True,
                rngs={"sample": jax.random.key(2)}, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.where(mask, jnp.square(logits), 0.0))

        return jax.grad(loss_fn)(params)

    grads = grad_fn(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    nz = [float(jnp.abs(g).max()) > 0 for g in flat]
    # most parameters receive gradient (the dead reflectance gates do not)
    assert sum(nz) > len(nz) * 0.6


def test_gate_params_exist_but_are_inert():
    init_eval, _, apply_eval, _ = _fns()
    pos, refl, mask, sf = _tile_batch(b=2, n=128)
    variables = init_eval({"params": jax.random.key(0)}, pos, refl, mask, sf)
    p = variables["params"]
    assert "reflectanceyesno" in p["sa1_module"]
    out1 = apply_eval(variables, pos, refl, mask, sf)
    import flax

    p2 = flax.core.unfreeze(p)
    p2["sa1_module"]["reflectanceyesno"]["fc3"]["kernel"] = (
        p2["sa1_module"]["reflectanceyesno"]["fc3"]["kernel"] + 100.0
    )
    out2 = apply_eval(
        {"params": p2, "batch_stats": variables["batch_stats"]},
        pos, refl, mask, sf,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_reflectance_weighting_semantics():
    """ReflectanceWeighting is dead code upstream (defined, never
    instantiated — model.py:177-196) but the inventory carries it: one
    relu'd scalar per tile from mean-pooled MLP features, broadcast to
    every point, padding excluded from the pool."""
    from pointstowood_tpu.model.layers import ReflectanceWeighting

    mod = ReflectanceWeighting(hidden_dim=8)
    rng = np.random.default_rng(3)
    refl = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    mask = jnp.asarray(np.arange(16)[None, :] < np.array([[16], [9]]))
    v = mod.init(jax.random.key(0), refl, mask=mask)
    w = np.asarray(mod.apply(v, refl, mask=mask))
    assert w.shape == (2, 16)
    assert (w >= 0).all()
    # per-tile constant weight broadcast to every point
    assert np.allclose(w, w[:, :1])
    # masked pooling: padding rows must not influence the weight
    refl2 = refl.at[1, 9:].set(1e3)
    w2 = np.asarray(mod.apply(v, refl2, mask=mask))
    np.testing.assert_allclose(w, w2)


def test_param_count_matches_reference_formula():
    """The reference prints sum(p.numel()); our total must equal the same
    architecture arithmetic at C=32 (computed independently below)."""
    init_eval, _, _, _ = _fns()
    pos, refl, mask, sf = _tile_batch(b=1, n=128)
    v = init_eval({"params": jax.random.key(0)}, pos, refl, mask, sf)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))

    c = 32
    lin = lambda i, o: i * o + o
    bn = lambda f: 2 * f

    def mlp(ch):
        return sum(
            lin(ch[i - 1], ch[i]) + (bn(ch[i]) if i != 1 else 0)
            for i in range(1, len(ch))
        )

    ds = lambda f: f + f + bn(f) + lin(f, f) + bn(f)

    def irb(f):
        e = 4 * f
        return (lin(f, e) + bn(e)) + ds(e) + bn(e) + ds(e) + bn(e) + lin(e, f) + bn(f)

    gate = lambda h=32: lin(1, h) + lin(h, h) + lin(h, 1)

    expected = mlp((3, c))
    expected += mlp((c + 4, 2 * c, 4 * c)) + irb(4 * c) + gate()
    expected += mlp((4 * c + 4, 6 * c, 8 * c)) + irb(8 * c) + gate()
    expected += mlp((8 * c + 4, 12 * c, 16 * c)) + irb(16 * c) + gate()
    expected += mlp((16 * c + 3, 16 * c, 16 * c))
    expected += mlp((32 * c, 24 * c, 16 * c))
    expected += mlp((24 * c, 20 * c, 16 * c))
    expected += mlp((20 * c, 16 * c, 16 * c))
    expected += mlp((17 * c, 16 * c, 16 * c))
    expected += lin(16 * c, 16 * c) + bn(16 * c) + lin(16 * c, 1)
    assert n_params == expected


def test_pointconv_packed_bf16_gather_matches_fp32():
    """The packed-bf16 fused gather (wide stages, C_in >= 256) matches the
    fp32-gather formulation within bf16 tolerance: hi/lo position
    reconstruction error is far inside the bf16 message quantization."""
    import jax
    import numpy as np

    from pointstowood_tpu.model.pointconv import PointConv

    rng = np.random.default_rng(3)
    b, n, s, k, c_in = 2, 64, 16, 4, 256
    x32 = jnp.asarray(rng.normal(size=(b, n, c_in)).astype(np.float32))
    pos4 = jnp.asarray(
        rng.uniform(-1, 1, (b, n, 4)).astype(np.float32))
    center_idx = jnp.asarray(rng.integers(0, n, (b, s)).astype(np.int32))
    nbr_idx = jnp.asarray(rng.integers(0, n, (b, s, k)).astype(np.int32))
    nbr_valid = jnp.asarray(np.ones((b, s, k), bool))
    center_valid = jnp.asarray(np.ones((b, s), bool))

    def run(dtype, x):
        conv = PointConv((c_in + 4, 32, 32), dtype=dtype)
        v = conv.init(jax.random.key(0), x, pos4, center_idx, nbr_idx,
                      nbr_valid, center_valid, use_running_average=True)
        return np.asarray(conv.apply(
            v, x, pos4, center_idx, nbr_idx, nbr_valid, center_valid,
            use_running_average=True).astype(jnp.float32))

    y32 = run(jnp.float32, x32)          # fp32 fused-gather path
    y16 = run(jnp.bfloat16, x32.astype(jnp.bfloat16))  # packed path
    scale = np.abs(y32).max()
    np.testing.assert_allclose(y16, y32, atol=0.05 * scale)


def test_transpose_knn_equivalence_and_gate():
    """The transpose-fused FP search (Net.transpose_knn): outputs match
    the separate-search path within near-tie tolerance, and the
    PTW_TRANSPOSE_KNN env override beats the attribute (the engines rely
    on this precedence to gate by host regime, predicter.build_net)."""
    import functools
    import os

    rng = np.random.default_rng(5)
    b, n = 1, 4096
    pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 2
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)
    args = [jnp.asarray(v) for v in (pos, refl, mask, sf)]

    n_on = Net(channels=8, knn_method="fast", transpose_knn=True)
    n_off = Net(channels=8, knn_method="fast", transpose_knn=False)
    v = jax.jit(functools.partial(n_on.init, training=False))(
        {"params": jax.random.key(0)}, *args)
    o_on = np.asarray(jax.jit(
        functools.partial(n_on.apply, training=False))(v, *args))
    o_off = np.asarray(jax.jit(
        functools.partial(n_off.apply, training=False))(v, *args))
    assert np.isfinite(o_on).all() and np.isfinite(o_off).all()
    # identical FP neighbor sets except packed-bits near-ties
    corr = np.corrcoef(o_on.ravel(), o_off.ravel())[0, 1]
    assert corr > 0.9999, corr

    # env override wins over the attribute (either direction)
    old = os.environ.get("PTW_TRANSPOSE_KNN")
    try:
        os.environ["PTW_TRANSPOSE_KNN"] = "1"
        forced = np.asarray(jax.jit(functools.partial(
            Net(channels=8, knn_method="fast", transpose_knn=False).apply,
            training=False))(v, *args))
        assert np.array_equal(forced, o_on)
        os.environ["PTW_TRANSPOSE_KNN"] = "0"
        forced_off = np.asarray(jax.jit(functools.partial(
            Net(channels=8, knn_method="fast", transpose_knn=True).apply,
            training=False))(v, *args))
        assert np.array_equal(forced_off, o_off)
    finally:
        if old is None:
            os.environ.pop("PTW_TRANSPOSE_KNN", None)
        else:
            os.environ["PTW_TRANSPOSE_KNN"] = old
