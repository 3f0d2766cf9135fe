"""Data-augmentation consistency loss: a second, jittered/occluded pass of
the backbone regressed against the first pass's (detached) depth.

Parity targets:
  * random_image_mask — /root/reference/losses/aug_loss.py:7-25 (zero out a
    random (H/3, W/3) rectangle of the aug ref image)
  * AugLossMultiStage — /root/reference/losses/aug_loss.py:28-67 (per-stage
    smooth-L1 vs the pseudo-depth, inside the un-masked region, with
    torch-default NEAREST downscaling of pseudo-GT and filter mask)
  * w_aug doubling schedule — /root/reference/train_rcmvsnet.py:379-394
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.image import masked_mean, smooth_l1
from ..ops.sampling import resize_nearest
from .unsup import STAGE_DOWNSCALE


def random_image_mask(key: jax.Array, img: jnp.ndarray, filter_hw):
    """Zero a random (fh, fw) rectangle — an independent one per sample.

    img: [B, H, W, C].  The reference runs B=1 per DDP rank so every sample
    gets its own rectangle (/root/reference/losses/aug_loss.py:7-25 is called
    per rank); we keep that per-sample diversity at batch_size>1 by splitting
    the key over the batch axis and vmapping the rectangle draw.

    Returns (masked img, filter_mask [B, H, W, C] with 0 inside the hole).
    """
    fh, fw = filter_hw
    B, H, W, C = img.shape
    xs = jnp.arange(W)
    ys = jnp.arange(H)

    def one(k, im):
        kx, ky = jax.random.split(k)
        x0 = jax.random.randint(kx, (), 0, W - fw)
        y0 = jax.random.randint(ky, (), 0, H - fh)
        inside = ((ys[:, None] >= y0) & (ys[:, None] < y0 + fh)
                  & (xs[None, :] >= x0) & (xs[None, :] < x0 + fw))
        fm = jnp.where(inside[:, :, None], 0.0, 1.0).astype(im.dtype)
        fm = jnp.broadcast_to(fm, im.shape)
        return im * fm, fm

    return jax.vmap(one)(jax.random.split(key, B), img)


def aug_loss_multi_stage(outputs, pseudo_depth, filter_mask,
                         dlossw=(0.5, 1.0, 2.0)):
    """Σ_k dlossw[k] · smooth-L1(depth_k, pseudo-depth ↓k) on unmasked px.

    outputs: aug-pass cascade outputs; pseudo_depth: [B, H, W] (detached
    stage-3 depth of the clean pass); filter_mask: [B, H, W, C].
    """
    total = 0.0
    scalars = {}
    pseudo = pseudo_depth[..., None]  # [B, H, W, 1]
    B, H, W, _ = pseudo.shape
    for stage_idx in range(len(dlossw)):
        key = f"stage{stage_idx + 1}"
        depth_est = outputs[key]["depth"]
        s = STAGE_DOWNSCALE[stage_idx]
        pseudo_t = resize_nearest(pseudo, H // s, W // s)[..., 0]
        mask_t = resize_nearest(filter_mask, H // s, W // s)[..., 0]
        mask = mask_t > 0.5
        depth_loss = masked_mean(smooth_l1(depth_est, pseudo_t), mask)
        total = total + dlossw[stage_idx] * depth_loss
        scalars[f"aug_loss_{key}"] = depth_loss
    return total, scalars


def adjust_w_aug(epoch_idx: int, w_aug: float) -> float:
    """Double w_aug at epochs ≥1,3,5,7,9 (train_rcmvsnet.py:379-394)."""
    for threshold in (2, 4, 6, 8, 10):
        if epoch_idx >= threshold - 1:
            w_aug *= 2
    return w_aug
