"""The fused RC-MVSNet train step: ONE jitted function computing

    L = L_photometric(clean pass)
      + w_aug · L_aug(masked-aug pass vs detached pseudo-depth)
      + L_rgb(rendered rays) + L_depth(rendered rays vs pseudo-depth)

with a single gradient — semantically identical to the reference's three
sub-steps sharing one zero_grad/backward/step
(/root/reference/train_rcmvsnet.py:279-326,330-376,397-445: zero_grad only
in step A, backward+step only in step C). Gradients flow from the render
losses back into the backbone through the NON-detached stage-1 volume
feature, exactly as in the reference; the pseudo-depth targets ARE detached.

BN running stats update in forward order (clean pass → aug pass → render
pass), mirroring three model.train() forwards per iteration.

Data parallelism: jit over a Mesh with the batch axis sharded; XLA inserts
the grad all-reduce (ICI) and the BN batch-stat reductions are global
(== DDP + SyncBatchNorm).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses.aug import aug_loss_multi_stage, random_image_mask
from ..losses.rays import abs_error, acc_threshold, img2mse, mse2psnr, sl1_loss
from ..losses.supervised import abs_depth_error_metric, cas_mvsnet_loss, thres_metric
from ..losses.unsup import unsup_loss_multi_stage
from .state import TrainState, make_models, make_optimizer


def make_train_step(config: Config, steps_per_epoch: int,
                    with_images: bool = False):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    with_images adds metrics["images"] — the reference's TensorBoard image
    summaries (train_rcmvsnet.py:365-371,438-440,313-315: masked/unmasked
    depth estimates per pass, gt, ref image, mask, error map) as device
    arrays; drivers pop and host-transfer them only on summary steps.

    batch keys (host pytree, batch-major):
      imgs, imgs_aug, center_imgs: [B, V, H, W, 3]
      proj_matrices: {stageK: [B, V, 2, 4, 4]}
      depth_values: [B, Dfull]
      w_aug: scalar — the epoch's aug-loss weight (adjust_w_aug schedule)
      depth / mask: {stageK: [B, h, w]} (supervised MONITORING only)
      w2cs, c2ws: [B, V, 4, 4]; intrinsics: [B, V, 3, 3]; near_fars: [B, V, 2]
    """
    cascade, render = make_models(config)
    tx, schedule = make_optimizer(config, steps_per_epoch)
    dlossw = tuple(config.loss.dlossw)

    # Pass-level rematerialization (RunConfig.remat): each sub-pass keeps
    # only its inputs/outputs live across the fused gradient instead of
    # every conv residual of all three forwards. Composes with the
    # module-level nn.remat inside the models; together they bound the
    # backward's peak HBM to ~one U-Net fwd+bwd at a time, which is what
    # fits the reference 512×640 train shapes in a single chip's HBM.
    ckpt = jax.checkpoint if config.run.remat else (lambda f: f)

    @ckpt
    def clean_pass(params_c, stats_c, imgs, projs, dvals):
        return cascade.apply(
            {"params": params_c, "batch_stats": stats_c},
            imgs, projs, dvals,
            train=True, return_volume=True, mutable=["batch_stats"])

    @ckpt
    def aug_pass(params_c, stats_c, imgs_aug, projs, dvals):
        return cascade.apply(
            {"params": params_c, "batch_stats": stats_c},
            imgs_aug, projs, dvals, train=True, mutable=["batch_stats"])

    @ckpt
    def render_pass(params_r, stats_r, volume_feature, pseudo_depth, imgs,
                    w2cs, c2ws, intrinsics, near_fars, rng):
        # the render branch runs f32 even under a bf16 backbone
        # (train_dtype): the volume feature upcast is a no-op at f32 and
        # keeps ray losses / compositing full-precision otherwise
        return render.apply(
            {"params": params_r, "batch_stats": stats_r},
            volume_feature.astype(jnp.float32), pseudo_depth,
            imgs.astype(jnp.float32), w2cs, c2ws,
            intrinsics, near_fars, rng=rng, train=True,
            mutable=["batch_stats"])

    def loss_fn(params, batch_stats, batch, rng):
        k_mask, k_rays = jax.random.split(rng)
        imgs = batch["imgs"]
        B, V, H, W, _ = imgs.shape

        # ---- step A: clean pass + photometric self-supervision ----
        (outputs, volume_feature), cas_mut = clean_pass(
            params["cascade"], batch_stats["cascade"],
            imgs, batch["proj_matrices"], batch["depth_values"])
        loss_base, unsup_scalars = unsup_loss_multi_stage(
            outputs, batch["center_imgs"], batch["proj_matrices"], dlossw)
        pseudo_depth = jax.lax.stop_gradient(outputs["depth"])

        # ---- step B: aug pass vs pseudo-depth ----
        imgs_aug = batch["imgs_aug"]
        ref_masked, filter_mask = random_image_mask(
            k_mask, imgs_aug[:, 0], (H // 3, W // 3))
        imgs_aug = imgs_aug.at[:, 0].set(ref_masked)
        outputs_aug, cas_mut2 = aug_pass(
            params["cascade"], cas_mut["batch_stats"],
            imgs_aug, batch["proj_matrices"], batch["depth_values"])
        loss_aug, aug_scalars = aug_loss_multi_stage(
            outputs_aug, pseudo_depth, filter_mask, dlossw)

        # ---- step C: rendering consistency ----
        result, rnd_mut = render_pass(
            params["render"], batch_stats["render"],
            volume_feature, pseudo_depth, imgs, batch["w2cs"],
            batch["c2ws"], batch["intrinsics"], batch["near_fars"], k_rays)
        img_loss = img2mse(result.rgb, result.target_rgb)
        ray_mask = result.rays_depth > 0
        depth_loss = sl1_loss(result.depth, result.rays_depth, ray_mask)

        w_aug = batch["w_aug"]
        total = loss_base + w_aug * loss_aug + img_loss + depth_loss

        new_stats = {"cascade": cas_mut2["batch_stats"],
                     "render": rnd_mut["batch_stats"]}
        metrics = {
            "loss": total, "repr_loss": loss_base,
            "aug_loss": w_aug * loss_aug,
            "img_loss": img_loss, "ray_depth_loss": depth_loss,
            "psnr": mse2psnr(img_loss),
            "ray_abs_err": abs_error(result.depth, result.rays_depth, ray_mask),
            "ray_acc_2mm": acc_threshold(result.depth, result.rays_depth,
                                         ray_mask, 2.0),
            **unsup_scalars, **aug_scalars,
        }
        # runtime band-coverage breach counter from the fused train warp
        # kernel (both passes): nonzero means the probed (rows, band,
        # xband) config does NOT cover this batch's geometry and the
        # forward/backward silently lost taps — the driver fails loudly on
        # the first step and the counter is logged every summary step
        wv = [o.get("warp_violations") for o in (outputs, outputs_aug)
              if isinstance(o, dict) and "warp_violations" in o]
        if wv:
            metrics["warp_violations"] = sum(
                jnp.sum(v).astype(jnp.float32) for v in wv)
        # supervised monitoring (never in the gradient): matches the
        # reference's thres/abs metrics (train_rcmvsnet.py:351-360)
        if "depth" in batch and "mask" in batch:
            num_stage = len(dlossw)
            gt = batch["depth"][f"stage{num_stage}"]
            mask = batch["mask"][f"stage{num_stage}"] > 0.5
            est = jax.lax.stop_gradient(outputs["depth"])
            metrics.update({
                "abs_depth_error": abs_depth_error_metric(est, gt, mask),
                "thres2mm_error": thres_metric(est, gt, mask, 2.0),
                "thres4mm_error": thres_metric(est, gt, mask, 4.0),
                "thres8mm_error": thres_metric(est, gt, mask, 8.0),
            })
        if with_images:
            est = jax.lax.stop_gradient(outputs["depth"])
            est_aug = jax.lax.stop_gradient(outputs_aug["depth"])
            images = {"depth_est_nomask": est,
                      "aug_depth_est_nomask": est_aug,
                      "nerf_depth_est_nomask": pseudo_depth,
                      "ref_img": imgs[:, 0]}
            if "depth" in batch and "mask" in batch:
                num_stage = len(dlossw)
                gt = batch["depth"][f"stage{num_stage}"]
                fmask = batch["mask"][f"stage{num_stage}"]
                images.update({
                    "depth_est": est * fmask,
                    "aug_depth_est": est_aug * fmask,
                    "nerf_depth_est": pseudo_depth * fmask,
                    # reference logs the STAGE-1 gt/mask images even though
                    # metrics use stage{num} (train_rcmvsnet.py:367-369)
                    "depth_gt": batch["depth"]["stage1"],
                    "mask": batch["mask"]["stage1"],
                    "errormap": jnp.abs(est - gt) * fmask,
                })
            metrics["images"] = images
        return total, (new_stats, metrics)

    def train_step(state: TrainState, batch, rng):
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        metrics["lr"] = schedule(state.step)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), metrics

    return train_step


def make_val_step(config: Config):
    """Supervised validation step (eval-mode forward + cas_mvsnet_loss),
    matching test_sample_depth (/root/reference/train_rcmvsnet.py:449-499)."""
    cascade, _ = make_models(config)
    dlossw = tuple(config.loss.dlossw)

    def val_step(state: TrainState, batch):
        outputs = cascade.apply(
            {"params": state.params["cascade"],
             "batch_stats": state.batch_stats["cascade"]},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            train=False)
        loss, depth_loss = cas_mvsnet_loss(outputs, batch["depth"],
                                           batch["mask"], dlossw)
        num_stage = len(dlossw)
        gt = batch["depth"][f"stage{num_stage}"]
        mask = batch["mask"][f"stage{num_stage}"] > 0.5
        est = outputs["depth"]
        return {
            "loss": loss, "depth_loss": depth_loss,
            "abs_depth_error": abs_depth_error_metric(est, gt, mask),
            "thres2mm_error": thres_metric(est, gt, mask, 2.0),
            "thres4mm_error": thres_metric(est, gt, mask, 4.0),
            "thres8mm_error": thres_metric(est, gt, mask, 8.0),
        }

    return val_step
