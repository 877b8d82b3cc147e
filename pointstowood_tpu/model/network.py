"""The wood/leaf segmentation backbone: a PointNet++-style hierarchical
encoder/decoder over padded static-shape tile batches.

Architecture parity with the reference ``Net`` (reference:
pointstowood/src/model.py:204-245): stem MLP [3->C]; three set-abstraction
stages at voxel resolutions 0.04/0.08/0.16 with local-MLP widths
[C+4,2C,4C] / [4C+4,6C,8C] / [8C+4,12C,16C], each followed by an inverted
residual block; a global max-pool stage [16C+3,16C,16C]; four feature-
propagation stages with kNN(k=2) inverse-distance interpolation; and a
Conv1d->BN->ReLU->Conv1d head.

TPU-first differences from the reference (behavior-preserving):
  * dense (B, N, C) padded layout + masks instead of flat batch-as-one-graph
    edge lists; every stage shape is static (XLA compiles once per bucket);
  * fixed-count sampling: training draws exactly 50% of valid points
    (model.py:97-101); eval voxel-grid representatives are compacted into a
    static per-stage budget (model.py:103-106), overflow keeping
    lowest-index points;
  * FP4's knn_interpolate from the single global vector is an exact
    broadcast (k-NN of one source point returns that point; verified
    equivalent in tests), so it is implemented as a broadcast;
  * the ReflectanceYesNo gate is instantiated for checkpoint compatibility
    but evaluated as its closed form, the constant 1 (see layers.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointstowood_tpu.model.layers import (
    InvertedResidualBlock,
    MaskedBatchNorm,
    RefMLP,
    ReflectanceGate,
)
from pointstowood_tpu.model.attention import ATSearchKNN, AttentivePointConv
from pointstowood_tpu.model.pointconv import PointConv, gather_points
from pointstowood_tpu.ops.interpolate import (
    knn_interpolate_batched,
    uses_fused_kernel,
)
from pointstowood_tpu.ops.knn import knn_masked, knn_topk_with_transpose
from pointstowood_tpu.ops.sampling import random_sample
from pointstowood_tpu.ops.voxel import voxel_cell_ids, voxel_representatives


class SAStage(nn.Module):
    """One set-abstraction stage: sample centers, gather fixed-k
    neighborhoods, PointConv, inverted residual block
    (reference SAModule, model.py:87-127)."""

    resolution: float
    k: int
    nn_channels: tuple
    out_features: int
    capacity: int  # static number of center slots
    use_radius: bool  # SA1 uses radius search (r = 2*resolution)
    knn_chunk: int = 1024
    knn_method: str = "fast"
    knn_recall: float = 0.9
    dtype: jnp.dtype = jnp.float32
    # eval-time voxel representative choice: "hash" (spatially unbiased
    # overflow) or "last" (reference consecutive_cluster CPU parity)
    voxel_priority: str = "hash"
    # archive variants: learned feature-space neighbor search for non-radius
    # stages (archive/model_attknn.py:107-158) and QKV attention messages
    # (src/pointnetatt.py)
    attention_knn: bool = False
    attention_conv: bool = False

    @nn.compact
    def __call__(self, x, pos3, refl, mask, sf, training: bool,
                 use_running_average: bool = False, stem_edge=None,
                 want_transpose: bool = False):
        b = pos3.shape[0]
        # Gate params exist for checkpoint parity; output is identically 1.
        gate = ReflectanceGate(name="reflectanceyesno")(refl, mask=mask)
        refl = refl * gate

        if training:
            keys = jax.random.split(self.make_rng("sample"), b)
            center_idx, center_valid = jax.vmap(
                lambda key, m: random_sample(key, m, self.capacity, fraction=0.5)
            )(keys, mask)
        else:
            ids = jax.vmap(
                lambda p, m: voxel_cell_ids(p, self.resolution, mask=m)
            )(pos3, mask)
            center_idx, center_valid = jax.vmap(
                lambda i, m: voxel_representatives(
                    i, self.capacity, mask=m, priority=self.voxel_priority
                )
            )(ids, mask)

        # The conv sees positions divided by the per-sample scale factor
        # (model.py:122); reflectance rides along unscaled as column 3.
        pos4 = jnp.concatenate(
            [pos3 / sf[:, None, None], refl[..., None]], axis=-1
        )
        transpose = None
        if self.attention_knn and not self.use_radius:
            # learned feature-space neighbor search (SA2/SA3 in the archived
            # attention model, model_attknn.py:147)
            pos4_unscaled = jnp.concatenate([pos3, refl[..., None]], axis=-1)
            nbr_idx, nbr_valid = ATSearchKNN(
                k=self.k, attention_dim=self.nn_channels[0] // 2,
                knn_chunk=self.knn_chunk, knn_method=self.knn_method,
                name="atsearch",
            )(x, pos4_unscaled, mask, center_idx, center_valid)
        else:
            centers = gather_points(pos3, center_idx)
            from pointstowood_tpu.ops.pallas_knn import transpose_supported
            if (want_transpose and self.knn_method == "fast"
                    and transpose_supported(self.capacity, pos3.shape[1],
                                            self.k)):
                # Fused kernel also folds each stage point's nearest-2
                # centers (the matching FP stage's k=2 interpolation
                # search IS this kNN's transpose — see
                # ops/knn.knn_topk_with_transpose); the stage's own
                # neighbors come back bit-identical to the plain path.
                nbr_idx, nbr_valid, t_idx, t_valid = knn_topk_with_transpose(
                    centers, pos3, self.k, center_valid, mask
                )
                transpose = (t_idx, t_valid)
            else:
                # k nearest (exact distances are not needed here: the SA1
                # radius cap is applied inside the conv from its fp32
                # relative positions, and SA2/SA3 only need validity —
                # skipping the distance recompute saves one (B, S, k, 3)
                # gather per stage, the dominant TPU cost).
                nbr_idx, _, nbr_valid = jax.vmap(
                    lambda q, s, qm, sm: knn_masked(
                        q, s, k=self.k,
                        query_mask=qm, source_mask=sm,
                        chunk_size=self.knn_chunk,
                        method=self.knn_method,
                        recall_target=self.knn_recall,
                        with_dist=False)
                )(centers, pos3, center_valid, mask)
        # radius search (SA1, model.py:117-118) operates in unscaled
        # coordinates; in the scaled frame the cap becomes radius / sf.
        radius = (
            (self.resolution * 2) / sf[:, None, None] if self.use_radius else None
        )
        if self.attention_conv and x is not None:
            x = AttentivePointConv(
                in_channels=x.shape[-1],
                local_channels=(x.shape[-1],) + tuple(self.nn_channels[1:]),
                dtype=self.dtype, name="conv",
            )(x, pos4, center_idx, nbr_idx, nbr_valid, center_valid,
              radius=radius, use_running_average=use_running_average)
        else:
            x = PointConv(self.nn_channels, name="conv", dtype=self.dtype)(
                None if stem_edge is not None else x,
                pos4, center_idx, nbr_idx, nbr_valid, center_valid,
                radius=radius, use_running_average=use_running_average,
                stem_edge=stem_edge, sf=sf,
            )
        x = InvertedResidualBlock(self.out_features, name="residual_block",
                                  dtype=self.dtype)(
            x, mask=center_valid, use_running_average=use_running_average
        )
        pos3 = gather_points(pos3, center_idx)
        refl = jnp.take_along_axis(refl, center_idx, axis=1)
        return x, pos3, refl, center_valid, transpose


class Net(nn.Module):
    """Full backbone. Input is a padded tile batch; output per-point logits.

    Call signature:
      pos3 (B, N, 3) centered xyz; refl (B, N); mask (B, N) validity;
      sf (B,) per-sample scale factor (max point norm, trainer.py:56);
      training: True for 50% random sampling + batch-stat BN.
    Returns (B, N) float32 logits (num_classes == 1) or (B, N, num_classes).
    """

    num_classes: int = 1
    channels: int = 32
    k: int = 32
    sa_resolutions: Sequence[float] = (0.04, 0.08, 0.16)
    stage_fractions: Sequence[float] = (0.5, 0.5, 0.5)
    fp_k: int = 2
    knn_chunk: int = 1024
    # 'approx': TPU PartialReduce selection, bf16 distance matmuls (fast
    # path); 'exact': fp32 streaming top-k (parity path). See ops/knn.py.
    knn_method: str = "fast"
    # scalar, or a per-SA-stage sequence (SA1, SA2, SA3): SA1 ranks the
    # full tile (recall costs the most there) while SA2/SA3 rank sampled
    # subsets — the accuracy-vs-latency frontier is measured per stage in
    # BASELINE.md (scripts/c32_accuracy_and_knn_deviation.py --recalls)
    knn_recall: float | Sequence[float] = 0.9
    # eval voxel representative choice; "last" = reference parity (see
    # ops/voxel.voxel_representatives)
    voxel_priority: str = "hash"
    # archive model variants (see SAStage)
    attention_knn: bool = False
    attention_conv: bool = False
    # Transpose-fused FP search (fold the decoder's k=2 interpolation
    # neighbors into the SA kNN kernels — see knn_topk_with_transpose).
    # Strictly faster ON-DEVICE (model-fwd 1181 -> 1133 ms on the 1M-pt
    # plot; canonical forward 69.6 -> 62.7 ms), but the larger fused
    # executables cost extra per-dispatch wall on remote-relay hosts, so
    # the inference engine disables it there (predicter.build_net gates
    # on utils.host_regime, the round-4 padding-lever pattern). None =
    # enabled; env PTW_TRANSPOSE_KNN=0/1 overrides everything.
    transpose_knn: bool | None = None
    # Compute dtype for MLP/conv activations (parameters and BN stats stay
    # fp32). bfloat16 is the TPU analogue of the reference's AMP autocast
    # (trainer.py:174, predicter.py:197); geometry (kNN, interpolation
    # weights, relative positions) always runs fp32. The production configs
    # (ModelConfig.compute_dtype) default to bfloat16; the class default is
    # fp32 so direct Net() construction is exact.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos3, refl, mask, sf, training: bool = False,
                 use_running_average: bool | None = None):
        c = self.channels
        # decoupled for diagnostics: sampling mode (training) and BN-stat
        # mode (use_running_average) default to the standard pairing
        ura = (not training) if use_running_average is None else use_running_average
        n = pos3.shape[1]
        caps = []
        cap = n
        for f in self.stage_fractions:
            cap = max(int(cap * f), 1)
            caps.append(cap)

        # The stem is BN-free (single Linear+ReLU), so it can be re-applied
        # per edge inside SA1 (see PointConv's stem_edge) with shared params.
        stem = RefMLP((3, c), name="stem_mlp", dtype=self.dtype)
        x0 = stem(pos3, mask=mask, use_running_average=ura)

        sa_specs = [
            ((c + 4, c * 2, c * 4), c * 4, True),
            ((c * 4 + 4, c * 6, c * 8), c * 8, False),
            ((c * 8 + 4, c * 12, c * 16), c * 16, False),
        ]
        xs, poss, masks = [x0], [pos3], [mask]
        x, p, r, m = x0, pos3, refl, mask
        # Per-stage transpose top-2 (the matching FP stage's k=2 search,
        # folded inside the SA kNN kernel) — only worth computing for FP
        # stages that will take the gather path; the fused interpolation
        # kernel needs no indices (decision shared via uses_fused_kernel).
        # Precedence: PTW_TRANSPOSE_KNN env (A/B knob) > transpose_knn
        # attr (engines gate by host regime) > enabled.
        import os
        env = os.environ.get("PTW_TRANSPOSE_KNN")
        if env is not None:
            transpose_enabled = env not in ("0", "false", "")
        elif self.transpose_knn is not None:
            transpose_enabled = self.transpose_knn
        else:
            transpose_enabled = True
        fused_bound = 4096 if training else 2048
        transposes = [None, None, None]
        for i, ((nn_ch, out_f, use_rad), res) in enumerate(
            zip(sa_specs, self.sa_resolutions)
        ):
            rec = (float(self.knn_recall)
                   if isinstance(self.knn_recall, (int, float))
                   else float(self.knn_recall[i]))
            src_n = p.shape[1]
            # want the transpose when the FP stage will gather anyway
            # (fused kernel not taking it), OR when free indices flip
            # the fused-vs-gather race: at > 2048 sources the gather
            # formulation minus its (now free) search beats the fused
            # quadratic tile work (interp_scatter_probe FP2-train
            # ledger: 16.2 ms incl. ~4.3 search vs fused 14.7).
            gather_anyway = not uses_fused_kernel(
                src_n, caps[i], c * 16, self.fp_k,
                self.knn_method, fused_bound)
            want_t = (self.fp_k == 2 and transpose_enabled
                      and (gather_anyway or caps[i] > 2048))
            x, p, r, m, tp = SAStage(
                resolution=res, k=self.k, nn_channels=nn_ch, out_features=out_f,
                capacity=caps[i], use_radius=use_rad, knn_chunk=self.knn_chunk,
                knn_method=self.knn_method, knn_recall=rec,
                dtype=self.dtype, voxel_priority=self.voxel_priority,
                attention_knn=self.attention_knn,
                attention_conv=self.attention_conv,
                name=f"sa{i + 1}_module",
            )(x, p, r, m, sf, training, use_running_average=ura,
              stem_edge=(
                  stem if i == 0 and not self.attention_conv else None
              ),
              want_transpose=want_t)
            transposes[i] = tp
            xs.append(x)
            poss.append(p)
            masks.append(m)

        # Global stage (GlobalSAModule, model.py:129-140): MLP on [x, pos3]
        # then per-sample masked max pool.
        g = RefMLP((c * 16 + 3, c * 16, c * 16), name="sa4_module",
                   dtype=self.dtype)(
            jnp.concatenate([x, p.astype(x.dtype)], axis=-1), mask=m,
            use_running_average=ura,
        )
        neg = jnp.finfo(g.dtype).min
        g = jnp.max(jnp.where(m[..., None], g, neg), axis=1)  # (B, 16C)
        # fully padded samples (batch-dim padding tiles) would pool to
        # finfo.min and overflow downstream bf16 matmuls to inf -> 0 them
        g = jnp.where(jnp.any(m, axis=1)[:, None], g, 0.0)

        # FP4: interpolation from the single global point == broadcast.
        y = jnp.broadcast_to(g[:, None, :], (g.shape[0], caps[2], g.shape[-1]))
        y = RefMLP((c * 32, c * 24, c * 16), name="fp4_module",
                   dtype=self.dtype)(
            jnp.concatenate([y, xs[3]], axis=-1), mask=masks[3],
            use_running_average=ura,
        )

        fp_specs = [
            ((c * 24, c * 20, c * 16), "fp3_module", 2),
            ((c * 20, c * 16, c * 16), "fp2_module", 1),
            ((c * 17, c * 16, c * 16), "fp1_module", 0),
        ]
        for widths, name, lvl in fp_specs:
            interp = knn_interpolate_batched(
                y, poss[lvl + 1], poss[lvl], k=self.fp_k,
                source_mask=masks[lvl + 1], target_mask=masks[lvl],
                chunk_size=self.knn_chunk, method=self.knn_method,
                # fused-kernel dispatch bound (see knn_interpolate_batched):
                # training includes the backward, where the fused kernel
                # also wins at the FP2 source count
                fused_max_sources=fused_bound,
                # FP_i's search == SA_i's kNN transposed; the SA kernel
                # already folded it (None when the stage is fused or the
                # kernel shape-gated out, in which case FP searches)
                precomputed=transposes[lvl],
            )
            y = RefMLP(widths, name=name, dtype=self.dtype)(
                jnp.concatenate([interp.astype(self.dtype), xs[lvl]], axis=-1),
                mask=masks[lvl], use_running_average=ura,
            )

        # Head (model.py:220-222, 241-243): Conv1d -> BN -> ReLU -> Conv1d.
        y = nn.Dense(c * 16, name="conv1", dtype=self.dtype)(y)
        y = MaskedBatchNorm(c * 16, name="norm")(
            y, mask=mask, use_running_average=ura
        )
        y = nn.relu(y)
        y = nn.Dense(self.num_classes, name="conv2", dtype=self.dtype)(y)
        y = y.astype(jnp.float32)
        if self.num_classes == 1:
            y = y[..., 0]
        return y
