"""Supervised depth loss + threshold metrics (validation-only monitoring —
training itself is unsupervised).

Parity targets:
  * cas_mvsnet_loss — /root/reference/models/modules.py:527-546
  * Thres_metrics / AbsDepthError_metrics — /root/reference/utils.py:139-159
    (per-image means via compute_metrics_for_each_image)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.image import masked_mean, smooth_l1


def cas_mvsnet_loss(outputs, depth_gt_ms, mask_ms, dlossw=(0.5, 1.0, 2.0)):
    """Σ_k dlossw[k]·smooth-L1(est_k[mask], gt_k[mask]); also returns the
    last stage's unweighted loss (the reference's `depth_loss`)."""
    total = 0.0
    depth_loss = 0.0
    for stage_idx in range(len(dlossw)):
        key = f"stage{stage_idx + 1}"
        est = outputs[key]["depth"]
        gt = depth_gt_ms[key]
        mask = mask_ms[key] > 0.5
        depth_loss = masked_mean(smooth_l1(est, gt), mask)
        total = total + dlossw[stage_idx] * depth_loss
    return total, depth_loss


def _per_image(metric):
    def wrapped(depth_est, depth_gt, mask, *args):
        vals = jax.vmap(lambda e, g, m: metric(e, g, m, *args))(
            depth_est, depth_gt, mask)
        return jnp.mean(vals)
    return wrapped


def _masked_mean_or_nan(x, mask):
    """Mean over masked pixels; NaN when the mask is empty — matching the
    reference's torch.mean(x[mask]) (utils.py:139-159), which surfaces a
    degenerate all-masked image instead of scoring it as a perfect 0."""
    m = mask.astype(x.dtype)
    cnt = m.sum()
    return jnp.where(cnt > 0, (x * m).sum() / jnp.maximum(cnt, 1.0),
                     jnp.nan)


@_per_image
def thres_metric(depth_est, depth_gt, mask, thres):
    """Fraction of masked pixels with error > thres (per-image mean)."""
    err_over = (jnp.abs(depth_est - depth_gt) > thres).astype(jnp.float32)
    return _masked_mean_or_nan(err_over, mask)


@_per_image
def abs_depth_error_metric(depth_est, depth_gt, mask):
    """Mean |err| over masked pixels (per-image mean)."""
    return _masked_mean_or_nan(jnp.abs(depth_est - depth_gt), mask)
