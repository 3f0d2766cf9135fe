"""Image-space ops used by the self-supervised losses: 3×3 average-pool
SSIM, edge-aware depth smoothness, finite-difference gradients.

Parity targets:
  * SSIM         — /root/reference/losses/modules.py:6-41
  * smoothness   — /root/reference/losses/modules.py:56-69
  * gradients    — /root/reference/losses/modules.py:44-53
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def avg_pool_2d(x: jnp.ndarray, window: int = 3, stride: int = 1) -> jnp.ndarray:
    """VALID average pool over H, W of an NHWC tensor."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID") / float(window * window)


def ssim(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked SSIM distance map: mask_pooled · clip((1−SSIM)/2, 0, 1).

    x, y: [B, H, W, C]; mask: [B, H, W, 1]. Output [B, H-2, W-2, C]
    (3×3 VALID pooling, matching nn.AvgPool2d(3, 1)).
    """
    mu_x = avg_pool_2d(x)
    mu_y = avg_pool_2d(y)
    sigma_x = avg_pool_2d(x * x) - mu_x * mu_x
    sigma_y = avg_pool_2d(y * y) - mu_y * mu_y
    sigma_xy = avg_pool_2d(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    mask_p = avg_pool_2d(mask)
    return mask_p * jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def gradient_x(img: jnp.ndarray) -> jnp.ndarray:
    """img[:, :, :-1] − img[:, :, 1:] over width of [B, H, W, C]."""
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def gradient_y(img: jnp.ndarray) -> jnp.ndarray:
    """img[:, :-1] − img[:, 1:] over height of [B, H, W, C]."""
    return img[:, :-1, :, :] - img[:, 1:, :, :]


def gradient(pred: jnp.ndarray):
    """(dx, dy) forward differences: dy = img[1:]−img[:-1], dx likewise.

    NOTE the sign is opposite to gradient_x/gradient_y — the reference keeps
    both conventions (losses/modules.py:44-53) and the reconstruction loss
    uses this one.
    """
    d_dy = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    d_dx = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    return d_dx, d_dy


def depth_smoothness(depth: jnp.ndarray, img: jnp.ndarray,
                     lambda_wt: float = 1.0) -> jnp.ndarray:
    """Edge-aware first-order smoothness: mean|∇d·exp(−λ·mean|∇I|)|.

    depth: [B, H, W, 1]; img: [B, H, W, C]. Scalar output.
    """
    depth_dx = gradient_x(depth)
    depth_dy = gradient_y(depth)
    image_dx = gradient_x(img)
    image_dy = gradient_y(img)
    weights_x = jnp.exp(-lambda_wt * jnp.mean(jnp.abs(image_dx), axis=3, keepdims=True))
    weights_y = jnp.exp(-lambda_wt * jnp.mean(jnp.abs(image_dy), axis=3, keepdims=True))
    return (jnp.mean(jnp.abs(depth_dx * weights_x))
            + jnp.mean(jnp.abs(depth_dy * weights_y)))


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (beta=1), matching F.smooth_l1_loss pre-reduce."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean(values[mask]) with traced-shape-safe arithmetic (Σv·m / Σm)."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1e-10)
