"""Differentiable plane-sweep homography warping and fused variance
cost-volume construction.

TPU-first design: instead of materializing one warped feature volume per
source view ([B,D,H,W,C] × V) and summing afterwards like the reference
(/root/reference/models/casmvsnet.py:68-100), `plane_sweep_variance`
streams views through running Σx / Σx² accumulators so peak live memory is
2 volumes regardless of V, and XLA fuses the gather + accumulate chain.

Parity target: homo_warping at /root/reference/models/modules.py:304-339
(grid under stop_gradient, bilinear zeros-padded align_corners=True sample).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.geometry import project_to_grid, relative_projection
from .sampling import grid_sample_2d


def homo_warp(src_feat: jnp.ndarray, src_proj: jnp.ndarray,
              ref_proj: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Warp src features into the ref view at every depth hypothesis.

    src_feat: [B, H, W, C]; src_proj/ref_proj: [B, 4, 4] (K-folded);
    depth_values: [B, D] or [B, D, H, W].
    Returns [B, D, H, W, C].
    """
    B, H, W, C = src_feat.shape
    D = depth_values.shape[1]
    proj = jax.lax.stop_gradient(relative_projection(src_proj, ref_proj))
    x, y = project_to_grid(proj, jax.lax.stop_gradient(depth_values), H, W)
    warped = grid_sample_2d(src_feat, x, y, padding_mode="zeros")  # [B, D*H*W, C]
    return warped.reshape(B, D, H, W, C)


def plane_sweep_variance(ref_feat: jnp.ndarray, src_feats, src_projs,
                         ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                         return_warped_srcs: bool = False):
    """Variance cost volume over {ref} ∪ {warped srcs}, streamed per view.

    ref_feat: [B, H, W, C]; src_feats: [V-1] list (or [B,V-1,H,W,C] array) of
    source features; src_projs likewise [B,V-1,4,4]; depth_values: [B, D] or
    [B, D, H, W].

    Returns (variance [B, D, H, W, C], warped list or None). Variance is the
    biased E[x²] − E[x]² over the V views, with the ref features broadcast
    across depth — matching /root/reference/models/casmvsnet.py:68-100.
    """
    B, H, W, C = ref_feat.shape
    D = depth_values.shape[1]
    if isinstance(src_feats, (list, tuple)):
        src_list = list(src_feats)
        proj_list = list(src_projs)
    else:
        src_list = [src_feats[:, i] for i in range(src_feats.shape[1])]
        proj_list = [src_projs[:, i] for i in range(src_projs.shape[1])]
    num_views = len(src_list) + 1

    # Σx / Σx² accumulate in f32 even for bf16 features (mixed-precision
    # train path): E[x²] − E[x]² in bf16 cancels catastrophically. The
    # gathers themselves stay in the feature dtype (half the bytes); the
    # variance is cast back so downstream convs keep the compute dtype.
    ref_volume = jnp.broadcast_to(ref_feat[:, None],
                                  (B, D, H, W, C)).astype(jnp.float32)
    vol_sum = ref_volume
    vol_sq_sum = ref_volume * ref_volume

    warped_out = [] if return_warped_srcs else None
    for src_feat, src_proj in zip(src_list, proj_list):
        warped = homo_warp(src_feat, src_proj, ref_proj, depth_values)
        wf = warped.astype(jnp.float32)
        vol_sum = vol_sum + wf
        vol_sq_sum = vol_sq_sum + wf * wf
        if return_warped_srcs:
            warped_out.append(warped)

    mean = vol_sum / num_views
    variance = vol_sq_sum / num_views - mean * mean
    return variance.astype(ref_feat.dtype), warped_out


def plane_sweep_variance_no_ref(warped_srcs) -> jnp.ndarray:
    """Variance over warped source volumes only, but divided by the FULL view
    count V (not V-1) — reproducing the reference's `no_ref` bookkeeping
    where volume_sum_no_ref excludes the ref yet is divided by num_views
    (/root/reference/models/casmvsnet.py:95-100).

    warped_srcs: list of [B, D, H, W, C]. Returns [B, D, H, W, C].
    """
    num_views = len(warped_srcs) + 1
    vol_sum = 0.0
    vol_sq_sum = 0.0
    for w in warped_srcs:
        wf = w.astype(jnp.float32)   # f32 accumulation (see above)
        vol_sum = vol_sum + wf
        vol_sq_sum = vol_sq_sum + wf * wf
    mean = vol_sum / num_views
    var = vol_sq_sum / num_views - mean * mean
    return var.astype(warped_srcs[0].dtype)
