"""Projective geometry for plane-sweep MVS, in JAX.

All functions are shape-explicit, jit-friendly (static shapes, no Python
branching on traced values) and operate in float32.

Parity targets in the reference:
  * projection composition  — /root/reference/models/casmvsnet.py:78-81
  * depth hypothesis ranges — /root/reference/models/modules.py:549-588
  * NDC transform           — /root/reference/models/render_utils.py:112-146
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Camera math must run in full f32: TPU matmuls default to bfloat16 passes,
# and a 0.1% error in a K-folded projection shifts sample coords by pixels.
HIGHEST = jax.lax.Precision.HIGHEST


def compose_projection(proj_pair: jnp.ndarray) -> jnp.ndarray:
    """Fold a {extrinsic, intrinsic} pair into one 4x4 projection.

    proj_pair: [..., 2, 4, 4] where [..., 0] is the 4x4 extrinsic E and
    [..., 1, :3, :3] the 3x3 intrinsic K. Returns [..., 4, 4] equal to E with
    its top 3 rows replaced by K @ E[:3, :4] — exactly the `src_proj_new`
    construction at /root/reference/models/casmvsnet.py:78-81.
    """
    extr = proj_pair[..., 0, :, :]
    intr = proj_pair[..., 1, :3, :3]
    top = jnp.einsum("...ij,...jk->...ik", intr, extr[..., :3, :4],
                     precision=HIGHEST)
    return jnp.concatenate([top, extr[..., 3:4, :]], axis=-2)


def relative_projection(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> jnp.ndarray:
    """proj = src @ inv(ref): maps ref-camera homogeneous pixels·depth to src.

    Matches /root/reference/models/modules.py:315.
    """
    return jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=HIGHEST)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinates [(x, y, 1)] of shape [3, H*W].

    Row-major over (y, x), matching torch.meshgrid(arange(H), arange(W)) at
    /root/reference/models/modules.py:319-323.
    """
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=dtype),
                          jnp.arange(width, dtype=dtype), indexing="ij")
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(height * width, dtype)])


def project_to_grid(proj: jnp.ndarray, depth_values: jnp.ndarray,
                    height: int, width: int):
    """Plane-sweep projection: where does each (ref pixel, depth) land in src?

    proj: [B, 4, 4] relative projection (src @ inv(ref)).
    depth_values: [B, D] or [B, D, H, W] depth hypotheses.
    Returns normalized sample coords (x, y) each [B, D, H*W] in [-1, 1]
    (align_corners=True convention: ±1 ≡ pixel centers 0 and size-1),
    matching /root/reference/models/modules.py:314-333.
    """
    B = proj.shape[0]
    D = depth_values.shape[1]
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]

    xyz = pixel_grid(height, width)                       # [3, H*W]
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz, precision=HIGHEST)  # [B,3,H*W]
    depth = depth_values.reshape(B, 1, D, -1)              # [B,1,D,1] or [B,1,D,H*W]
    proj_xyz = rot_xyz[:, :, None, :] * depth + trans[:, :, None, :]  # [B,3,D,H*W]
    # Guard the divide: torch produces inf/NaN here and relies on grid_sample
    # zero-padding; we clamp |z| away from 0 (the resulting coords land far
    # out of range and are masked by the sampler either way).
    z = proj_xyz[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    proj_xy = proj_xyz[:, :2] / z                          # [B,2,D,H*W]
    x_norm = proj_xy[:, 0] / ((width - 1) / 2.0) - 1.0
    y_norm = proj_xy[:, 1] / ((height - 1) / 2.0) - 1.0
    return x_norm, y_norm


def linspace_depth_samples(depth_hyps: jnp.ndarray, ndepth: int,
                           height: int, width: int) -> jnp.ndarray:
    """Stage-1 global hypothesis range, broadcast per pixel.

    depth_hyps: [B, Dfull] full sweep values (only first/last used).
    Returns [B, ndepth, H, W], matching the cur_depth.dim()==2 branch of
    /root/reference/models/modules.py:569-583.
    """
    dmin = depth_hyps[:, 0]
    dmax = depth_hyps[:, -1]
    # ndepth == 1 (e.g. the tail chunk of a chunked coverage probe when
    # D % chunk == 1) would divide by zero and poison every sample with
    # NaN; the single sample is dmin, so any finite step works.
    step = (dmax - dmin) / max(ndepth - 1, 1)
    samples = dmin[:, None] + jnp.arange(ndepth, dtype=depth_hyps.dtype)[None] * step[:, None]
    return jnp.broadcast_to(samples[:, :, None, None],
                            (depth_hyps.shape[0], ndepth, height, width))


def window_depth_samples(cur_depth: jnp.ndarray, ndepth: int,
                         depth_interval_pixel) -> jnp.ndarray:
    """Later-stage per-pixel window around the previous depth.

    cur_depth: [B, H, W]. Returns [B, ndepth, H, W] spanning
    cur ± ndepth/2·interval with (ndepth-1) equal steps — matching
    /root/reference/models/modules.py:549-566 (no clamping to [min,max],
    same as the reference's active code path).
    """
    lo = cur_depth - ndepth / 2.0 * depth_interval_pixel
    hi = cur_depth + ndepth / 2.0 * depth_interval_pixel
    step = (hi - lo) / (ndepth - 1)
    idx = jnp.arange(ndepth, dtype=cur_depth.dtype).reshape(1, -1, 1, 1)
    return lo[:, None] + idx * step[:, None]


def world_to_ndc(points: jnp.ndarray, w2c_ref: jnp.ndarray,
                 intrinsic_ref: jnp.ndarray, inv_scale: jnp.ndarray,
                 near, far, pad: int = 0) -> jnp.ndarray:
    """World points → reference-view NDC in [0,1]^3.

    points: [..., 3]; w2c_ref: [4,4]; intrinsic_ref: [3,3];
    inv_scale: [2] = (W-1, H-1). xy are projected pixels normalized by
    inv_scale; z is (z - near)/(far - near). With pad>0 the xy axes are
    squeezed into the padded feature grid. Matches
    /root/reference/models/render_utils.py:112-146 (lindisp=False path).
    """
    shape = points.shape
    pts = points.reshape(-1, 3)
    R = w2c_ref[:3, :3]
    T = w2c_ref[:3, 3]
    pts = jnp.matmul(pts, R.T, precision=HIGHEST) + T[None]
    pix = jnp.matmul(pts, intrinsic_ref.T, precision=HIGHEST)
    xy = (pix[:, :2] / pix[:, 2:3]) / inv_scale.reshape(1, 2)
    z = (pix[:, 2:3] - near) / (far - near)
    out = jnp.concatenate([xy, z], axis=-1)
    if pad > 0:
        wh_feat = (inv_scale + 1) / 4.0  # (W_feat, H_feat)
        scale = wh_feat / (wh_feat + pad * 2)
        offset = pad / (wh_feat + pad * 2)
        out = out.at[:, :2].set(out[:, :2] * scale[None] + offset[None])
    return out.reshape(shape)


def unproject_pixels(x: jnp.ndarray, y: jnp.ndarray, depth: jnp.ndarray,
                     intrinsics: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depth → world points. x/y/depth: [N]; returns [N, 3].

    Matches the fusion unprojection at /root/reference/eval_rcmvsnet_dtu.py:426-429.
    """
    ones = jnp.ones_like(x)
    pix = jnp.stack([x, y, ones])                       # [3, N]
    cam = jnp.matmul(jnp.linalg.inv(intrinsics), pix,
                     precision=HIGHEST) * depth[None]
    cam_h = jnp.concatenate([cam, ones[None]], axis=0)  # [4, N]
    world = jnp.matmul(jnp.linalg.inv(extrinsics), cam_h, precision=HIGHEST)
    return world[:3].T
