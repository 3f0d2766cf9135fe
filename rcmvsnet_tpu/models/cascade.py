"""CascadeMVSNet: 3-stage coarse-to-fine plane-sweep depth network.

Parity target: CascadeMVSNet / CascadeMVSNet_eval at
/root/reference/models/casmvsnet.py:45-417, with a TPU-first restructuring:

  * channels-last everywhere; the V feature extractions run as one batched
    [B·V] conv pass instead of a per-view Python loop;
  * cost volumes are built by the streamed warp+variance op (no per-view
    warped volume materialization — ops/warp.py);
  * the eval path skips the reference's dead `img_feat` image-warping
    bookkeeping entirely (computed but unused at
    /root/reference/models/casmvsnet.py:247-271), and the train path builds
    `volume_feature_no_ref` only for stage 1 — the only stage whose volume
    the rendering branch consumes (/root/reference/models/casmvsnet.py:231);
  * depth_min/max/interval are per-batch tensors rather than the
    batch-0 Python floats the reference uses (equal for the reference's
    batch-size-1-per-device configuration).

Stage schedule (defaults): ndepths 48/32/8, interval ratios 4/2/1, feature
scales 1/4, 1/2, 1/1, shared-weights DepthNet with per-stage CostRegNet.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import compose_projection
from ..nn.costreg import CostRegNet
from ..nn.featurenet import FeatureNet
from ..ops.sampling import resize_bilinear
from ..ops.warp import (homo_warp, plane_sweep_variance,
                        plane_sweep_variance_no_ref)

STAGE_SCALES = (4, 2, 1)


def depth_regression(prob_volume: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax over the depth axis: Σ p·d.

    prob_volume: [B, D, H, W]; depth_values: [B, D] or [B, D, H, W].
    Matches /root/reference/models/modules.py:519-525.
    """
    if depth_values.ndim == 2:
        depth_values = depth_values[:, :, None, None]
    return jnp.sum(prob_volume * depth_values, axis=1)


def photometric_confidence(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """Sum of the probability mass in a 4-window around the argmax depth.

    prob_volume: [B, D, H, W]. Matches
    /root/reference/models/casmvsnet.py:115-122: pad depth by (1, 2), sliding
    window-4 sum, gathered at floor(Σ p·i) clamped to [0, D−1].
    """
    prob_volume = jax.lax.stop_gradient(prob_volume)
    B, D, H, W = prob_volume.shape
    padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
    # sliding sum of 4 along depth via cumulative sum
    csum = jnp.cumsum(padded, axis=1)
    csum = jnp.pad(csum, ((0, 0), (1, 0), (0, 0), (0, 0)))
    sum4 = csum[:, 4:] - csum[:, :-4]  # [B, D, H, W]
    idx_f = jnp.sum(prob_volume * jnp.arange(D, dtype=prob_volume.dtype)
                    [None, :, None, None], axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)  # trunc == torch .long()
    return jnp.take_along_axis(sum4, idx[:, None], axis=1)[:, 0]


class _DepthStage(nn.Module):
    """One cascade stage: cost volume → regularize → soft-argmax."""
    base_channels: int = 8
    use_pallas_warp: bool = False
    pallas_band: int = 24
    pallas_warp_rows: int = 8
    pallas_warp_xband: int = 0   # 0 = dense x contraction
    costreg_impl: str = "xla"
    use_pallas_tail: bool = False
    remat: bool = False   # nn.remat the cost regularizer under train
    # TRAIN fast path: the same fused warp+variance kernel wrapped in a
    # custom VJP (ops/pallas_warp_train.py) — the XLA gather warp's
    # backward is an HBM-bound scatter; the kernel's is a transposed hat
    # matmul. Gated like the eval path; want_volume stages fall back.
    use_pallas_warp_train: bool = False
    # TRAIN fast path: CostRegNet through the differentiable lanes convs
    # (ops/pallas_costreg_train.py). When the fused train warp kernel ran,
    # its lanes-resident variance feeds the U-Net directly (no NDHWC
    # round trip); otherwise the NDHWC variance is converted on entry.
    costreg_train_impl: str = "xla"

    @nn.compact
    def __call__(self, features, projs, depth_planes, imgs_stage=None,
                 train: bool = False, want_volume: bool = False,
                 feat_warp=None):
        """
        features: [B, V, h, w, C] stage features; projs: [B, V, 4, 4]
        K-folded; depth_planes: (lo [B, h, w], step [B, h, w], D) — the
        per-pixel hypothesis schedule dv(d) = lo + d·step (the full
        [B, D, h, w] volume is only materialized on the non-fused
        paths); imgs_stage: [B, V, h, w, 3] (only needed when
        want_volume); feat_warp: optional (src2d, meta) warp-layout
        features from featurenet_fast.featurenet_packed
        (out_layout='warp') — the fully fused eval path then never
        materializes NHWC features.
        Returns dict with depth [B,h,w], photometric_confidence [B,h,w], and
        optionally volume_feature_no_ref [B, D, h, w, 3(V−1)+C].
        """
        lo, step, D = depth_planes
        if feat_warp is not None:
            src2d, meta = feat_warp
            B, (V, _, _, C, _) = 1, meta
            h, w = lo.shape[1:3]
        else:
            B, V, h, w, C = features.shape
            ref_feat = features[:, 0]
            src_feats = [features[:, i] for i in range(1, V)]
        ref_proj = projs[:, 0]
        src_projs = [projs[:, i] for i in range(1, V)]

        def depth_volume():
            idx = jnp.arange(D, dtype=lo.dtype).reshape(1, -1, 1, 1)
            return lo[:, None] + idx * step[:, None]
        # fully-fused fast path: one kernel builds the multi-view variance
        # straight into the cost regularizer's lane layout (no warped
        # volumes, no accumulation passes, no layout conversion)
        fused = (self.use_pallas_warp and self.costreg_impl == "lanes"
                 and not train and not want_volume and B == 1
                 and D % 8 == 0 and h % self.pallas_warp_rows == 0
                 and h % 8 == 0 and w % 8 == 0)
        assert fused or feat_warp is None, (
            "warp-layout features require the fully fused eval path")
        if fused:
            from ..ops.pallas_costreg import make_layout
            from ..ops.pallas_warp2 import plane_sweep_variance_lanes
            lay = make_layout(h, w)
            # x-banding: the kernel zero-pads source rows to a 128
            # multiple, so the only gates are 128-multiple band width
            # and the band actually being narrower than the stage
            xb = self.pallas_warp_xband or None
            if xb is not None and not (xb < w and xb % 128 == 0):
                xb = None
            var_lanes, wviol = plane_sweep_variance_lanes(
                None if feat_warp is not None else features[0],
                projs[0], None, lay,
                rows_per_step=self.pallas_warp_rows, band=self.pallas_band,
                x_band=xb, depth_planes=(lo[0], step[0], D),
                **({"src2d": src2d, "src_meta": meta}
                   if feat_warp is not None else {}))
            cost = CostRegNet(self.base_channels, conv_impl="lanes",
                              name="cost_reg")(
                var_lanes, train, lanes_dims=(D, h, w, C))
            # runtime band-coverage violation count ([B]=1): nonzero means
            # the probed (rows, band, xband) config does NOT cover this
            # geometry and the variance volume silently lost taps —
            # drivers check the first frame and fail loudly
            # (cli/eval_dtu.raise_on_warp_violations)
            return self._tail(cost, (lo, step, D), train,
                              {"warp_violations": wviol[None]})

        # differentiable fused warp+variance (train fast path): same
        # kernel + coverage precondition as eval, custom-VJP backward
        # (transposed hat matmuls), variance handed to the XLA cost
        # regularizer in NDHWC. want_volume (train stage 1 of the clean
        # pass) routes through the volume variant below, which emits the
        # no-ref variance and the warped source images in the same pass.
        fused_common = (self.use_pallas_warp_train and train
                        and feat_warp is None and B == 1 and D % 8 == 0
                        and h % self.pallas_warp_rows == 0
                        and h % 8 == 0 and w % 8 == 0)
        fused_train = fused_common and not want_volume
        # the volume kernel is dense-x only (stage 1 is the narrowest
        # stage; its ladder config runs a dense x contraction anyway)
        fused_volume = (fused_common and want_volume
                        and not self.pallas_warp_xband)
        # the differentiable lanes U-Net accepts the fused kernels'
        # lanes-resident variance directly; var_lanes short-circuits the
        # NDHWC conversion when both fast paths are on
        lanes_train = (train and self.costreg_train_impl == "lanes"
                       and B == 1 and D % 8 == 0
                       and h % 8 == 0 and w % 8 == 0)
        var_lanes_train = None
        if fused_volume:
            from ..ops.pallas_costreg import make_layout
            from ..ops.pallas_warp_train import lanes_to_ndhwc
            from ..ops.pallas_warp_volume import (
                plane_sweep_volume_fused_train)
            lay = make_layout(h, w)
            vol_var, vol_nr, vol_img, wviol = plane_sweep_volume_fused_train(
                features[0], imgs_stage[0], projs[0], (lo[0], step[0], D),
                rows_per_step=self.pallas_warp_rows, band=self.pallas_band,
                compute_dtype=features.dtype, out_dtype=features.dtype)
            if lanes_train:
                var_lanes_train, variance = vol_var, None
            else:
                variance = lanes_to_ndhwc(vol_var, lay, C)[None]
            # reference channel order: warped source images (view-major),
            # then the no-ref variance (casmvsnet.py:231)
            extras = {
                "warp_violations": wviol[None],
                "volume_feature_no_ref": jnp.concatenate(
                    [lanes_to_ndhwc(vol_img, lay, 3 * (V - 1)),
                     lanes_to_ndhwc(vol_nr, lay, C)], axis=-1)[None],
            }
            depth_values = (lo, step, D)
            want_volume = False   # volume already built; skip the XLA path
        elif fused_train:
            from ..ops.pallas_costreg import make_layout
            from ..ops.pallas_warp_train import (
                lanes_to_ndhwc, plane_sweep_variance_fused_train)
            lay = make_layout(h, w)
            xb = self.pallas_warp_xband or None
            if xb is not None and not (xb < w and xb % 128 == 0):
                xb = None
            vol, wviol = plane_sweep_variance_fused_train(
                features[0], projs[0], (lo[0], step[0], D),
                rows_per_step=self.pallas_warp_rows,
                band=self.pallas_band, x_band=xb,
                compute_dtype=features.dtype, out_dtype=features.dtype)
            if lanes_train:
                var_lanes_train, variance = vol, None
            else:
                variance = lanes_to_ndhwc(vol, lay, C)[None]
            extras = {"warp_violations": wviol[None]}
            depth_values = (lo, step, D)
        else:
            depth_values = depth_volume()
            # non-fused fallback: always the XLA warp+variance. The
            # banded v1 kernel (ops/pallas_warp.py) silently zeros
            # out-of-band taps when its host-side coverage precondition
            # is unchecked, and this branch is exactly the one that runs
            # when the fused gate fails for a non-ladder geometry —
            # correctness over speed here (the drivers' default shapes
            # always take the fused path above).
            variance, _ = plane_sweep_variance(
                ref_feat, src_feats, src_projs, ref_proj, depth_values)
            extras = {}
        if want_volume:
            warped_imgs = [homo_warp(imgs_stage[:, i], src_projs[i - 1],
                                     ref_proj, depth_values)
                           for i in range(1, V)]
            warped_feats = [homo_warp(f, p, ref_proj, depth_values)
                            for f, p in zip(src_feats, src_projs)]
            var_no_ref = plane_sweep_variance_no_ref(warped_feats)
            extras["volume_feature_no_ref"] = jnp.concatenate(
                warped_imgs + [var_no_ref], axis=-1)

        # rematerializing the U-Net during backward keeps only its input
        # volume live across the rest of the pass (the C=8 NDHWC conv
        # temps pad 16x on TPU — see RunConfig.remat)
        if var_lanes_train is not None:
            # lanes-resident variance from the fused train warp kernel —
            # the differentiable lanes U-Net consumes it directly
            CR = (nn.remat(CostRegNet, static_argnums=(2, 3))
                  if self.remat else CostRegNet)
            cost = CR(self.base_channels, train_impl="lanes",
                      name="cost_reg")(var_lanes_train, train,
                                       (D, h, w, C))
            return self._tail(cost, depth_values, train, extras)
        impl = self.costreg_impl
        if impl == "lanes" and not all(
                d % 8 == 0 for d in variance.shape[1:4]):
            impl = "pallas3d"   # lanes layout needs D/h/w divisible by 8
        train_impl = ("lanes" if lanes_train
                      and all(d % 8 == 0 for d in variance.shape[1:4])
                      and variance.shape[0] == 1 else "xla")
        CR = (nn.remat(CostRegNet, static_argnums=(2,))
              if self.remat and train else CostRegNet)
        cost = CR(self.base_channels, conv_impl=impl, train_impl=train_impl,
                  name="cost_reg")(variance, train)
        return self._tail(cost, depth_values, train, extras)

    def _tail(self, cost, depth_values, train, extras):
        planes = isinstance(depth_values, tuple)
        if self.use_pallas_tail and not train:
            from ..ops.pallas_tail import fused_depth_tail
            dv = ((depth_values[0], depth_values[1]) if planes
                  else depth_values)
            depth, conf = fused_depth_tail(cost[..., 0], dv)
        else:
            if planes:
                lo, step, D = depth_values
                idx = jnp.arange(D, dtype=lo.dtype).reshape(1, -1, 1, 1)
                depth_values = lo[:, None] + idx * step[:, None]
            prob_volume = jax.nn.softmax(cost[..., 0].astype(jnp.float32),
                                         axis=1)
            depth = depth_regression(prob_volume, depth_values)
            conf = photometric_confidence(prob_volume)
        return {"depth": depth, "photometric_confidence": conf, **extras}


class CascadeMVSNet(nn.Module):
    ndepths: Sequence[int] = (48, 32, 8)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.0, 1.0)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    base_channels: int = 8
    grad_detach: bool = True  # grad_method='detach'
    # TPU eval fast path: the fully fused planes-mode warp+variance kernel
    # (ops/pallas_warp2.py, lanes layout straight into the cost
    # regularizer) for stages whose bf16 source feature map fits VMEM.
    # 0 disables. Stages that fail the fused gate fall back to the XLA
    # warp — never to a Pallas kernel with an unchecked precondition.
    pallas_warp_max_bytes: int = 0
    # y-band rows per row group; smaller = faster, must satisfy the
    # coverage precondition (check_band_coverage / check_group_coverage
    # picks per dataset). An int applies to every stage; a 3-sequence sets
    # it per stage — the MXU pass count of the hat matmul goes with
    # ceil(band·C/128), so only stages where the band crosses a 128-sublane
    # boundary (stage 1: C=32, band 4 vs 6) gain from a tighter band,
    # while the others only pay the extra grid steps of a smaller row
    # group.
    pallas_warp_band: int | Sequence[int] = 24
    # output rows per warp-kernel grid step (the row-group size the band
    # must cover); int or per-stage 3-sequence, paired with
    # pallas_warp_band
    pallas_warp_rows: int | Sequence[int] = 8
    # static x-band (source columns per 128-aligned window) for the warp's
    # hat contraction; 0 = dense over the full row; an int applies to every
    # stage, a 3-sequence sets it per stage (widths differ 4x across the
    # cascade, so so does the minimal covering band). Needs
    # check_group_coverage(x_band) per scan/stage
    pallas_warp_xband: int | Sequence[int] = 0
    # eval fast path: route CostRegNet's 3D convs through the channel-major
    # Pallas kernel (ops/pallas_conv3d.py). No precondition; eval only.
    pallas_costreg: bool = False
    # eval fast path: fused softmax+regression+confidence tail
    # (ops/pallas_tail.py). No precondition; eval only.
    pallas_tail: bool = False
    # eval compute dtype for the conv stacks ('bfloat16' halves conv time
    # and warp bytes; camera geometry, softmax and depth regression stay
    # f32). None keeps float32.
    eval_dtype: str | None = None
    # train compute dtype for the backbone conv stacks + warp gathers
    # (mixed precision: params/BN stats/variance accumulation/losses stay
    # f32 — plane_sweep_variance accumulates Σx/Σx² in f32 regardless of
    # feature dtype). None keeps float32.
    train_dtype: str | None = None
    # rematerialize FeatureNet + per-stage CostRegNet during the training
    # backward (RunConfig.remat); no effect on the eval path
    remat: bool = False
    # TRAIN fast path: route non-want_volume stages through the
    # custom-VJP fused warp+variance kernel (ops/pallas_warp_train.py).
    # Same (rows, band, xband) ladder + coverage precondition as eval —
    # drivers probe with cli/eval_dtu.pick_fast_path on a train sample.
    pallas_warp_train: bool = False
    # TRAIN fast path: per-stage CostRegNet through the differentiable
    # lanes convs (ops/pallas_costreg_train.py); per-stage XLA fallback
    # when the B=1 / 8-divisibility gate fails
    pallas_costreg_train: bool = False
    # residual depth refinement head (reference RefineNet — dead code there
    # with refine=False everywhere; functional here)
    refine: bool = False

    @nn.compact
    def __call__(self, imgs, proj_matrices, depth_values, train: bool = False,
                 return_volume: bool = False, features=None,
                 features_warp=None):
        """
        imgs: [B, V, H, W, 3]; proj_matrices: {stageK: [B, V, 2, 4, 4]};
        depth_values: [B, Dfull] full sweep hypotheses; features: optional
        precomputed {stageK: [B·V, h, w, C]} feature pyramid (the drivers'
        packed eval path — nn/featurenet_fast.py — computes it outside the
        module from the same 'feature' params; None runs FeatureNet here).

        Returns outputs dict {stage1..3: {depth, photometric_confidence},
        depth, photometric_confidence} and, when return_volume, the stage-1
        volume_feature_no_ref for the rendering branch.
        """
        B, V, H, W, _ = imgs.shape
        num_stage = len(self.ndepths)
        d_min = depth_values[:, 0]
        d_max = depth_values[:, -1]
        depth_interval = (d_max - d_min) / depth_values.shape[1]  # [B]

        if self.eval_dtype is not None and not train:
            imgs = imgs.astype(self.eval_dtype)
        if self.train_dtype is not None and train:
            imgs = imgs.astype(self.train_dtype)
        if features_warp is not None and not self.is_initializing():
            feats_flat = None   # warp-layout features skip NHWC entirely
        elif features is not None and not self.is_initializing():
            feats_flat = features
        else:
            FN = (nn.remat(FeatureNet, static_argnums=(2,))
                  if self.remat and train else FeatureNet)
            feats_flat = FN(self.base_channels, num_stage,
                            name="feature")(
                imgs.reshape(B * V, H, W, 3), train)

        outputs = {}
        depth = None
        volume_feature = None
        for stage_idx in range(num_stage):
            stage_key = f"stage{stage_idx + 1}"
            scale = STAGE_SCALES[stage_idx]
            h, w = H // scale, W // scale
            nd = self.ndepths[stage_idx]

            if feats_flat is None:
                feat_warp = features_warp[stage_key]
                features = None
                Cs = feat_warp[1][3]
            else:
                feat_warp = None
                feats_stage = feats_flat[stage_key]
                Cs = feats_stage.shape[-1]
                features = feats_stage.reshape(B, V, h, w, Cs)
            projs = compose_projection(proj_matrices[stage_key])  # [B,V,4,4]

            # The reference builds [B, nd, H, W] full-res sample volumes
            # and trilinear-downsizes them (modules.py:549-591 +
            # Align_Corners_Range interpolate). The window offsets are
            # linear and per-pixel constant along (h, w), and the depth
            # axis of that resize is the identity, so the schedule is
            # fully described by two [B, h, w] maps — dv(d) = lo + d·step
            # — computed from the downsized SCALAR depth map. The fused
            # kernels consume (lo, step) directly; the [B, nd, h, w]
            # volume only materializes on the non-fused paths.
            if depth is None:
                d_min = depth_values[:, 0]
                lin_step = (depth_values[:, -1] - d_min) / (nd - 1)
                lo = jnp.broadcast_to(d_min[:, None, None], (B, h, w))
                step = jnp.broadcast_to(lin_step[:, None, None], (B, h, w))
            else:
                cur = jax.lax.stop_gradient(depth) if self.grad_detach else depth
                cur = resize_bilinear(cur[..., None], H, W,
                                      align_corners=False)[..., 0]
                if (h, w) != (H, W):
                    cur = resize_bilinear(cur[..., None], h, w,
                                          align_corners=False)[..., 0]
                interval = (self.depth_intervals_ratio[stage_idx]
                            * depth_interval)[:, None, None]
                lo = cur - nd / 2.0 * interval
                hi = cur + nd / 2.0 * interval
                step = (hi - lo) / (nd - 1)
            depth_samples = (lo, step, nd)

            want_volume = return_volume and stage_idx == 0
            imgs_stage = None
            if want_volume:
                imgs_stage = resize_bilinear(
                    imgs.reshape(B * V, H, W, 3), h, w,
                    align_corners=False).reshape(B, V, h, w, 3)

            src_bytes = h * w * Cs * 2  # bf16 VMEM residency requirement
            use_pallas = (0 < src_bytes <= self.pallas_warp_max_bytes)
            if use_pallas and not train:
                # the eval kernel keeps ALL V source views resident — the
                # per-view budget alone passes geometries that exceed VMEM
                # at higher view counts (ops/pallas_warp2.eval_vmem_bytes)
                from ..ops.pallas_warp2 import EVAL_VMEM_GATE, eval_vmem_bytes
                use_pallas = (eval_vmem_bytes(V, h, w, Cs)
                              <= EVAL_VMEM_GATE)
            # the train kernel's backward keeps the full V-view src2d plus
            # an f32 dsrc accumulator resident (~3x the forward footprint)
            # — gate it on the backward's actual residency against the
            # kernel's own 127 MB VMEM clamp, not just the eval gate
            use_pallas_train = self.pallas_warp_train and use_pallas
            if use_pallas_train and train:
                from ..ops.pallas_warp_train import backward_vmem_bytes
                from ..ops.pallas_warp_volume import (
                    volume_backward_vmem_bytes)
                itemsize = 2 if self.train_dtype == "bfloat16" else 4
                # the volume kernel (want_volume stage) stacks 3 image
                # channels per view next to the features, so its backward
                # residency is strictly larger — gate on the right one
                vmem_est = (volume_backward_vmem_bytes(V, h, w, Cs, itemsize)
                            if return_volume and stage_idx == 0 else
                            backward_vmem_bytes(V, h, w, Cs, itemsize))
                use_pallas_train = vmem_est <= 127 * 1024 * 1024
            per_stage = lambda v: (v[stage_idx]
                                   if isinstance(v, (tuple, list)) else v)
            stage_out = _DepthStage(
                self.cr_base_chs[stage_idx], use_pallas_warp=use_pallas,
                pallas_band=per_stage(self.pallas_warp_band),
                pallas_warp_rows=per_stage(self.pallas_warp_rows),
                pallas_warp_xband=per_stage(self.pallas_warp_xband),
                costreg_impl="lanes" if self.pallas_costreg else "xla",
                use_pallas_tail=self.pallas_tail, remat=self.remat,
                use_pallas_warp_train=use_pallas_train,
                costreg_train_impl=("lanes" if self.pallas_costreg_train
                                    else "xla"),
                name=f"stage{stage_idx + 1}")(
                features, projs, depth_samples, imgs_stage, train,
                want_volume, feat_warp=feat_warp)

            depth = stage_out["depth"]
            if want_volume:
                volume_feature = stage_out.pop("volume_feature_no_ref")
            outputs[stage_key] = stage_out

        # aggregate the per-stage warp-kernel violation counters ([B]) into
        # one top-level count; absent when no stage took the fused path
        wv = [outputs[f"stage{i + 1}"].pop("warp_violations")
              for i in range(num_stage)
              if "warp_violations" in outputs[f"stage{i + 1}"]]
        if wv:
            outputs["warp_violations"] = sum(wv)
        outputs["depth"] = outputs[f"stage{num_stage}"]["depth"]
        outputs["photometric_confidence"] = (
            outputs[f"stage{num_stage}"]["photometric_confidence"])
        if self.refine:
            from ..nn.featurenet import RefineNet
            outputs["refined_depth"] = RefineNet(name="refine_network")(
                imgs[:, 0], outputs["depth"], train)
        if return_volume:
            return outputs, volume_feature
        return outputs
