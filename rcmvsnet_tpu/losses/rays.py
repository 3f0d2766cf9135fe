"""Ray-space losses/metrics for the rendering-consistency branch.

Parity targets:
  * SL1Loss (× 2^(1−2) = 0.5) — /root/reference/losses/sl1loss.py:4-13
  * img2mse / mse2psnr       — /root/reference/models/render_utils.py:12-13
  * abs_error / acc_threshold — /root/reference/models/render_utils.py:71-82
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.image import masked_mean, smooth_l1


def sl1_loss(depth_pred, depth_gt, mask=None):
    """Masked smooth-L1 × 0.5 on rays."""
    if mask is None:
        mask = depth_gt > 0
    return masked_mean(smooth_l1(depth_pred, depth_gt), mask) * 0.5


def img2mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def abs_error(depth_pred, depth_gt, mask):
    return masked_mean(jnp.abs(depth_pred - depth_gt), mask)


def acc_threshold(depth_pred, depth_gt, mask, threshold):
    """Fraction of masked rays with |err| < threshold."""
    err_ok = (jnp.abs(depth_pred - depth_gt) < threshold).astype(jnp.float32)
    return masked_mean(err_ok, mask)
