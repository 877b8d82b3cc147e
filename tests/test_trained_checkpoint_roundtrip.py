"""Converter round-trip from a TRAINED torch checkpoint (VERDICT r3).

The other converter tests drive the .pth converter with randomized
weights; this one closes the remaining gap: a torch replica of the
reference network is actually TRAINED (AdamW on BCE-with-logits, BN
running statistics accumulated in train mode — the state a real
reference checkpoint carries), saved in BOTH on-disk formats the
reference trainer produces —

  * epoch/best checkpoints: ``torch.save({'model_state_dict': sd}, f)``
    (reference src/trainer.py:82,88)
  * final model: ``torch.save(sd, f)`` — a bare state_dict
    (reference src/trainer.py:133,136)

— then loaded through the production ``load_torch_checkpoint`` +
``convert_torch_state_dict`` path, and the converted flax net must
reproduce the trained torch model's per-point probabilities at the
flagship width (C=32).

Runtime note: a few torch CPU training steps at C=32/N=1024 plus one
C=32 flax compile — slow by design (flagship evidence), but well under
the flagship engine-parity test's cost.
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import OracleNet
from pointstowood_tpu.model import Net
from pointstowood_tpu.utils.checkpoint_convert import (
    load_torch_checkpoint,
    merge_into_variables,
)

C = 32
N = 1024
K = 32


def _cloud(seed=141190):
    """Same density as the full-net parity fixture (no 0.08 m ball holds
    more than k=32 points), scaled to N=1024."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0, 0.76, size=(N, 3)).astype(np.float32)
    xyz -= xyz.mean(axis=0)
    refl = rng.normal(size=N).astype(np.float32)
    sf = float(np.linalg.norm(xyz, axis=1).max())
    # learnable structure: "wood" = upper half + reflective points
    labels = ((xyz[:, 2] > 0) | (refl > 1.0)).astype(np.float32)
    return xyz, refl, sf, labels


def _train_oracle(xyz, refl, sf, labels, steps=3):
    om = OracleNet(C=C, k=K).train()
    opt = torch.optim.AdamW(om.parameters(), lr=1e-3)
    lossf = torch.nn.BCEWithLogitsLoss()
    txyz = torch.tensor(xyz)
    trefl = torch.tensor(refl)
    tsf = torch.tensor(sf)
    tlab = torch.tensor(labels)
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        logits = om(txyz, trefl, tsf)
        loss = lossf(logits, tlab)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    om.eval()
    return om, losses


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    xyz, refl, sf, labels = _cloud()
    om, losses = _train_oracle(xyz, refl, sf, labels)
    d = tmp_path_factory.mktemp("ckpt")
    epoch_path = str(d / "epoch_3.pth")
    final_path = str(d / "model.pth")
    # the two reference save formats (src/trainer.py:82 and :133,136)
    torch.save({"model_state_dict": om.state_dict()}, epoch_path)
    torch.save(om.state_dict(), final_path)
    with torch.no_grad():
        logits = om(torch.tensor(xyz), torch.tensor(refl),
                    torch.tensor(sf)).numpy()
    probs = 1.0 / (1.0 + np.exp(-logits))
    return dict(xyz=xyz, refl=refl, sf=sf, losses=losses,
                epoch_path=epoch_path, final_path=final_path,
                ref_probs=probs, state_dict=om.state_dict())


def test_training_actually_happened(trained):
    """The checkpoint must carry trained state, not init: BN running
    stats moved off their (0, 1) init and the loss decreased."""
    sd = trained["state_dict"]
    rm = sd["norm.running_mean"].numpy()
    rv = sd["norm.running_var"].numpy()
    nbt = int(sd["norm.num_batches_tracked"])
    assert nbt >= 3
    assert float(np.abs(rm).max()) > 0.0
    assert float(np.abs(rv - 1.0).max()) > 1e-6
    assert trained["losses"][-1] < trained["losses"][0]


def test_both_reference_formats_convert_identically(trained):
    """The epoch wrapper and the bare final state_dict must load to the
    SAME converted tree (cheap leaf-exact check, so the probability
    parity below only needs one C=32 flax compile)."""
    a = load_torch_checkpoint(trained["epoch_path"])
    b = load_torch_checkpoint(trained["final_path"])
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(va, vb, err_msg=str(pa))


def test_trained_roundtrip_probability_parity(trained):
    # load_torch_checkpoint handles both on-disk formats and returns the
    # converted {'params', 'batch_stats'} tree directly; the formats are
    # pinned identical above, so one forward covers both
    converted = load_torch_checkpoint(trained["epoch_path"])

    net = Net(
        channels=C, k=K, knn_method="exact", voxel_priority="last",
        stage_fractions=(1.0, 1.0, 1.0), dtype=jnp.float32,
    )
    pos_j = jnp.asarray(trained["xyz"][None])
    refl_j = jnp.asarray(trained["refl"][None])
    mask_j = jnp.ones((1, N), bool)
    sf_j = jnp.asarray([trained["sf"]], dtype=jnp.float32)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos_j, refl_j, mask_j, sf_j
    )
    merged = merge_into_variables(variables, converted)
    logits = jax.jit(
        lambda v: net.apply(v, pos_j, refl_j, mask_j, sf_j, training=False)
    )(merged)
    probs = np.asarray(jax.nn.sigmoid(logits))[0]

    max_dp = float(np.abs(probs - trained["ref_probs"]).max())
    assert max_dp < 1e-4, f"max |delta prob| = {max_dp}"
