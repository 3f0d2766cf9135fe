"""Unsupervised multi-stage photometric loss.

Parity targets:
  * inverse_warping — /root/reference/losses/homography.py:6-114 (relative
    pose from (R, t) pairs, pixel→cam→src-pixel, the hand-rolled bilinear
    sampler with its validity mask)
  * UnSupLoss — /root/reference/losses/unsup_loss.py:9-94. Faithfully
    reproduced quirks:
      - compute_reconstr_loss reduces each view to a SCALAR (mean smooth-L1
        photo + gradient terms), which is then broadcast against the per-
        pixel 1e4·(1−mask) penalty; the per-pixel top-1 over views therefore
        selects, at every valid pixel, the best view's scalar loss;
      - SSIM accumulates only over the first ≤2 source views (view < 3);
      - stage images are downscaled with torch-default NEAREST interpolation.
  * UnsupLossMultiStage — /root/reference/losses/unsup_loss.py:423-451
    (per-stage weights dlossw, default 0.5/1.0/2.0).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.geometry import HIGHEST
from ..ops.image import depth_smoothness, gradient, smooth_l1, ssim
from ..ops.sampling import loss_bilinear_sample, resize_nearest

STAGE_DOWNSCALE = {0: 4, 1: 2, 2: 1}


def inverse_warping(img: jnp.ndarray, ref_cam: jnp.ndarray,
                    src_cam: jnp.ndarray, depth: jnp.ndarray):
    """Warp src image into the ref view via the ref depth map.

    img: [B, H, W, C] (source view, stage resolution);
    ref_cam/src_cam: [B, 2, 4, 4] ({extrinsic, intrinsic}) at stage scale;
    depth: [B, H, W]. Returns (warped [B, H, W, C], mask [B, H, W, 1]).
    """
    B, H, W, C = img.shape
    R_ref = ref_cam[:, 0, :3, :3]
    t_ref = ref_cam[:, 0, :3, 3:4]
    R_src = src_cam[:, 0, :3, :3]
    t_src = src_cam[:, 0, :3, 3:4]
    K_ref = ref_cam[:, 1, :3, :3]

    R_rel = jnp.matmul(R_src, jnp.swapaxes(R_ref, 1, 2), precision=HIGHEST)
    t_rel = t_src - jnp.matmul(R_rel, t_ref, precision=HIGHEST)

    # meshgrid_abs builds pixel coords through a [-1,1]→pixel round trip
    # (losses/homography.py:65-82); plain arange is numerically identical
    xs, ys = jnp.meshgrid(jnp.arange(W, dtype=img.dtype),
                          jnp.arange(H, dtype=img.dtype), indexing="xy")
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                      jnp.ones(H * W, img.dtype)])          # [3, HW]

    K_ref_inv = jnp.linalg.inv(K_ref)
    cam = (jnp.einsum("bij,jn->bin", K_ref_inv, grid, precision=HIGHEST)
           * depth.reshape(B, 1, H * W))                     # [B, 3, HW]
    cam_h = jnp.concatenate([cam, jnp.ones((B, 1, H * W), img.dtype)], axis=1)

    K_hom = jnp.zeros((B, 4, 4), img.dtype)
    K_hom = K_hom.at[:, :3, :3].set(K_ref)
    K_hom = K_hom.at[:, 3, 3].set(1.0)
    transform = jnp.concatenate(
        [jnp.concatenate([R_rel, t_rel], axis=2),
         jnp.broadcast_to(jnp.array([0, 0, 0, 1], img.dtype), (B, 1, 4))],
        axis=1)
    proj = jnp.matmul(K_hom, transform, precision=HIGHEST)   # [B, 4, 4]

    pc = jnp.einsum("bij,bjn->bin", proj, cam_h, precision=HIGHEST)
    x_src = pc[:, 0] / (pc[:, 2] + 1e-10)
    y_src = pc[:, 1] / (pc[:, 2] + 1e-10)
    px = (x_src / (W - 1) * 2.0 - 1.0).reshape(B, H, W)
    py = (y_src / (H - 1) * 2.0 - 1.0).reshape(B, H, W)
    return loss_bilinear_sample(img, px, py)


def _compute_reconstr_loss(warped, ref, mask):
    """0.5·photo smooth-L1 + 0.5·gradient smooth-L1, all mean-reduced to a
    scalar (matching compute_reconstr_loss(simple=False),
    /root/reference/losses/modules.py:72-82)."""
    alpha = 0.5
    ref_dx, ref_dy = gradient(ref * mask)
    warped_dx, warped_dy = gradient(warped * mask)
    photo = jnp.mean(smooth_l1(warped * mask, ref * mask))
    grad = (jnp.mean(smooth_l1(warped_dx, ref_dx))
            + jnp.mean(smooth_l1(warped_dy, ref_dy)))
    return (1 - alpha) * photo + alpha * grad


def unsup_stage_loss(imgs, cams, depth, stage_idx: int):
    """Single-stage UnSupLoss.

    imgs: [B, V, H, W, 3] per-image-normalized 'center' images (full res);
    cams: [B, V, 2, 4, 4] stage projection pairs; depth: [B, h, w] stage
    depth. Returns (loss, dict of components).
    """
    B, V, H, W, _ = imgs.shape
    scale = STAGE_DOWNSCALE[stage_idx]
    h, w = H // scale, W // scale

    ref_img = resize_nearest(imgs[:, 0], h, w)
    ref_cam = cams[:, 0]

    reproj_maps = []
    ssim_loss = 0.0
    for view in range(1, V):
        view_img = resize_nearest(imgs[:, view], h, w)
        warped, mask = inverse_warping(view_img, ref_cam, cams[:, view], depth)
        reconstr_scalar = _compute_reconstr_loss(warped, ref_img, mask)
        reproj_maps.append(reconstr_scalar + 1e4 * (1.0 - mask))  # [B,h,w,1]
        if view < 3:
            ssim_loss = ssim_loss + jnp.mean(ssim(ref_img, warped, mask))

    smooth_loss = depth_smoothness(depth[..., None], ref_img, 1.0)

    volume = jnp.stack(reproj_maps, axis=-1)          # [B, h, w, 1, V-1]
    top_vals = jnp.min(volume, axis=-1)               # top-1 smallest
    top_mask = (top_vals < 1e4).astype(top_vals.dtype)
    reconstr_loss = jnp.mean(top_vals * top_mask)

    loss = 12.0 * reconstr_loss + 6.0 * ssim_loss + 0.18 * smooth_loss
    return loss, {"reconstr_loss": reconstr_loss, "ssim_loss": ssim_loss,
                  "smooth_loss": smooth_loss}


def unsup_loss_multi_stage(outputs, imgs, proj_matrices, dlossw=(0.5, 1.0, 2.0)):
    """Σ_k dlossw[k] · UnSupLoss(stage k).

    outputs: cascade outputs dict; imgs: [B, V, H, W, 3] center images;
    proj_matrices: {stageK: [B, V, 2, 4, 4]}.
    """
    total = 0.0
    scalars = {}
    for stage_idx in range(len(dlossw)):
        key = f"stage{stage_idx + 1}"
        depth_est = outputs[key]["depth"]
        loss, comps = unsup_stage_loss(imgs, proj_matrices[key], depth_est,
                                       stage_idx)
        total = total + dlossw[stage_idx] * loss
        scalars[f"depth_loss_{key}"] = loss
        for name, v in comps.items():
            scalars[f"{name}_{key}"] = v
    return total, scalars
