"""Volumetric compositing: σ → alpha → transmittance-weighted rgb/depth.

Parity targets:
  * depth2dist   — /root/reference/models/renderer.py:5-11
  * raw2alpha    — /root/reference/models/renderer.py:18-26
  * raw2outputs  — /root/reference/models/renderer.py:65-93
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def depth2dist(z_vals: jnp.ndarray, cos_angle: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample distances ·‖ray dir‖ with a 1e10 sentinel tail.

    z_vals: [N, S]; cos_angle: [N]. Returns [N, S].
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    return dists * cos_angle[..., None]


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray      # [N, 3]
    depth: jnp.ndarray    # [N]
    weights: jnp.ndarray  # [N, S]
    alpha: jnp.ndarray    # [N, S]
    acc: jnp.ndarray      # [N]


def volumetric_render(raw: jnp.ndarray, z_vals: jnp.ndarray,
                      dists: jnp.ndarray,
                      white_bkgd: bool = False) -> RenderOutput:
    """raw: [N, S, 4] = (rgb, σ) MLP output; z_vals/dists: [N, S].

    alpha = 1 − exp(−σ) (the reference ignores dists in raw2alpha — the
    sigma is already 'opacity-like'); T = ∏(1 − α + 1e−10) exclusive.
    """
    rgb = raw[..., :3]
    sigma = raw[..., 3]
    alpha = 1.0 - jnp.exp(-sigma)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutput(rgb_map, depth_map, weights, alpha, acc_map)
