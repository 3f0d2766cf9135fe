"""Rendering-consistency branch: neural volume + NeRF MLP supervised by ray
colors and backbone pseudo-depth.

Parity target: Rendering_Consistency_Net at
/root/reference/models/render_consist_net.py:11-77 with
create_nerf_mvs(use_mvs=True, dir_embedder=False, pts_embedder=True) —
i.e. positional encoding (multires 10) on the NDC point coordinates, raw
view directions (no dir encoding), feat_dim = 8 + 3·4 = 20.

TPU-first: the MLP runs fully batched over all N_rays × N_samples points
(the reference chunks through netchunk=1024 —
/root/reference/models/renderer.py:28-40); the whole branch is one jittable
function of (params, volume_feature, pseudo_depth, batch, rng).

Unlike the reference (render_utils.py:179 "assuming batch size equal to 1",
one sample per GPU process), this module is batched: the per-sample ray
sampling/rendering is vmapped over the batch axis, so a GSPMD-sharded
global batch renders each element on its own device — the exact analogue of
each DDP rank rendering its local sample.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import HIGHEST
from ..nn.mlp import AttentionNerfMLP, NerfMLP, positional_encoding
from ..nn.neural_volume import NeuralVolumeNet
from ..render.rays import (RayBatch, build_color_volume, index_point_feature,
                           index_point_feature_rays, sample_rays)
from ..render.volume_render import RenderOutput, depth2dist, volumetric_render

# numpy constants (from the numpy-only transforms module) on purpose:
# module-level jnp arrays would initialize the XLA backend at import time,
# which breaks jax.distributed.initialize (cli/train.py multi-host path)
from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def unpreprocess(imgs: jnp.ndarray) -> jnp.ndarray:
    """Invert ImageNet normalization ([..., 3] channels-last).

    Matches /root/reference/models/render_consist_net.py:44-51.
    """
    return imgs * IMAGENET_STD + IMAGENET_MEAN


class RenderResult(NamedTuple):
    rgb: jnp.ndarray          # [B, N_rays, 3]
    depth: jnp.ndarray        # [B, N_rays]
    target_rgb: jnp.ndarray   # [B, N_rays, 3]
    rays_depth: jnp.ndarray   # [B, N_rays] pseudo-depth supervision
    weights: jnp.ndarray      # [B, N_rays, S]
    alpha: jnp.ndarray        # [B, N_rays, S]


class RenderingConsistencyNet(nn.Module):
    n_rays: int = 1024
    n_samples: int = 128
    multires: int = 10
    net_depth: int = 6
    net_width: int = 128
    volume_channels: int = 8
    num_planes: int = 128
    net_type: str = "v0"  # 'v0' mult bias | 'v1' attention | 'v2' additive
    pad: int = 0
    remat: bool = False   # remat the neural-volume U-Net under train
    # TRAIN fast path for the neural-volume U-Net (see NeuralVolumeNet)
    costreg_train_impl: str = "xla"
    # compute dtype of the neural-volume U-Net ('bfloat16' under mixed
    # precision); everything downstream of it stays float32
    costreg_dtype: str | None = None
    # ray-major neural-volume lookup (render/rays.py
    # index_point_feature_rays): 4 row gathers/ray + MXU z-hat contraction
    # instead of the 8-tap-per-sample gather whose scatter VJP dominated
    # the round-5 train profile. Identical math for ref-camera rays.
    ray_major_lookup: bool = False

    @nn.compact
    def __call__(self, volume_feature, pseudo_depth, imgs, w2cs, c2ws,
                 intrinsics, near_fars, rng, train: bool = False) -> RenderResult:
        """
        volume_feature: [B, D0, h, w, 3(V−1)+C] stage-1 no-ref volume
        pseudo_depth:   [B, H, W] detached stage-3 backbone depth
        imgs:           [B, V, H, W, 3] ImageNet-normalized train images
        w2cs/c2ws:      [B, V, 4, 4]; intrinsics: [B, V, 3, 3] (full-res)
        near_fars:      [B, V, 2]; rng: PRNG key for ray/deph sampling
        """
        volume = NeuralVolumeNet(num_planes=self.num_planes,
                                 base_channels=self.volume_channels,
                                 remat=self.remat,
                                 costreg_train_impl=self.costreg_train_impl,
                                 costreg_dtype=self.costreg_dtype,
                                 name="neural_volume")(volume_feature, train)

        B, V, H, W, _ = imgs.shape
        imgs_un = unpreprocess(imgs)                  # [B, V, H, W, 3]
        keys = jax.random.split(rng, B)

        rays: RayBatch = jax.vmap(partial(
            sample_rays, n_rays=self.n_rays, n_samples=self.n_samples,
            pad=self.pad))(keys, imgs_un, pseudo_depth, w2cs, c2ws,
                           intrinsics, near_fars)

        cos_angle = jnp.linalg.norm(rays.dirs_world, axis=-1)        # [B,N]
        viewdirs = jnp.einsum("bnj,bkj->bnk",
                              rays.dirs_world / cos_angle[..., None],
                              w2cs[:, 0, :3, :3], precision=HIGHEST)

        lookup = (index_point_feature_rays if self.ray_major_lookup
                  else index_point_feature)
        ray_feats = jax.vmap(lookup)(volume, rays.ndc)    # [B,N,S,8]
        # the reference pairs src images (views 1..V-1) with the cams of
        # views 0..V-2 — reproduced here (see render/rays.py docstring)
        color_feats = jax.vmap(partial(build_color_volume, img_wh=(W, H)))(
            rays.pts_world, imgs_un[:, -3:], w2cs[:, :3],
            intrinsics[:, :3])                                       # [B,N,S,12]
        input_feat = jnp.concatenate([ray_feats, color_feats], axis=-1)

        pts_enc = positional_encoding(rays.ndc, self.multires)       # [B,N,S,63]
        views = jnp.broadcast_to(viewdirs[:, :, None],
                                 (*rays.ndc.shape[:3], 3))
        if self.net_type == "v1":
            # Renderer_attention (render_models.py:552-554); its extra
            # color-prior channels are ignored by the compositor, as in
            # the reference's raw2outputs
            mlp = AttentionNerfMLP(self.net_depth, self.net_width,
                                   in_ch_pts=pts_enc.shape[-1],
                                   name="nerf")
        else:
            mlp = NerfMLP(self.net_depth, self.net_width,
                          in_ch_pts=pts_enc.shape[-1],
                          bias_mode=("add" if self.net_type == "v2"
                                     else "multiply"),
                          name="nerf")
        raw = mlp(pts_enc, input_feat, views)                 # [B,N,S,4|10]

        dists = depth2dist(rays.z_vals, cos_angle)
        out: RenderOutput = volumetric_render(raw, rays.z_vals, dists)
        return RenderResult(out.rgb, out.depth, rays.target_rgb,
                            rays.pseudo_depth, out.weights, out.alpha)
