"""Train state: params + BN running stats + optimizer state for both models
under one Adam optimizer (matching the reference's single optimizer over
backbone ∪ NeRF params — /root/reference/train_rcmvsnet.py:537)."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.cascade import CascadeMVSNet
from ..models.render_net import RenderingConsistencyNet
from .schedule import warmup_multistep_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # {'cascade': ..., 'render': ...}
    batch_stats: Any     # {'cascade': ..., 'render': ...}
    opt_state: Any


def make_models(config: Config):
    cascade = CascadeMVSNet(
        ndepths=tuple(config.backbone.ndepths),
        depth_intervals_ratio=tuple(config.backbone.depth_intervals_ratio),
        cr_base_chs=tuple(config.backbone.cr_base_chs),
        base_channels=config.backbone.base_channels,
        grad_detach=config.backbone.grad_detach,
        pallas_warp_max_bytes=config.backbone.pallas_warp_max_bytes,
        pallas_warp_band=config.backbone.pallas_warp_band,
        pallas_warp_rows=config.backbone.pallas_warp_rows,
        pallas_warp_xband=config.backbone.pallas_warp_xband,
        pallas_costreg=config.backbone.pallas_costreg,
        pallas_tail=config.backbone.pallas_tail,
        eval_dtype=config.backbone.eval_dtype,
        train_dtype=config.backbone.train_dtype,
        pallas_warp_train=config.backbone.pallas_warp_train,
        pallas_costreg_train=config.backbone.pallas_costreg_train,
        remat=config.run.remat and config.run.remat_modules)
    render = RenderingConsistencyNet(
        n_rays=config.render.n_rays,
        n_samples=config.render.n_samples,
        multires=config.render.multires,
        net_depth=config.render.net_depth,
        net_width=config.render.net_width,
        volume_channels=config.render.volume_channels,
        num_planes=config.render.num_planes,
        net_type=config.render.net_type,
        pad=config.render.pad,
        remat=config.run.remat and config.run.remat_modules,
        costreg_train_impl=("lanes" if config.render.pallas_costreg_train
                           else "xla"),
        costreg_dtype=config.render.train_dtype,
        ray_major_lookup=config.render.ray_major_lookup)
    return cascade, render


def make_optimizer(config: Config, steps_per_epoch: int):
    schedule = warmup_multistep_schedule(
        config.run.lr,
        [m * steps_per_epoch for m in config.run.lr_milestone_epochs],
        gamma=config.run.lr_gamma,
        warmup_factor=config.run.warmup_factor,
        warmup_iters=config.run.warmup_iters)
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    if config.run.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(config.run.weight_decay), tx)
    return tx, schedule


def create_train_state(config: Config, sample_batch, steps_per_epoch: int,
                       rng: jax.Array) -> TrainState:
    """Initialize both models from a host sample batch (numpy pytree)."""
    cascade, render = make_models(config)
    k_cas, k_rnd, k_rays = jax.random.split(rng, 3)

    imgs = jnp.asarray(sample_batch["imgs"])
    projs = jax.tree_util.tree_map(jnp.asarray, sample_batch["proj_matrices"])
    depth_values = jnp.asarray(sample_batch["depth_values"])

    cas_vars = cascade.init(k_cas, imgs, projs, depth_values, train=False)
    B, V, H, W, _ = imgs.shape
    d0 = config.backbone.ndepths[0]
    vol_ch = 3 * (V - 1) + 4 * config.backbone.base_channels
    dummy_volume = jnp.zeros((B, d0, H // 4, W // 4, vol_ch), jnp.float32)
    dummy_depth = jnp.ones((B, H, W), jnp.float32)
    rnd_vars = render.init(
        k_rnd, dummy_volume, dummy_depth, imgs,
        jnp.asarray(sample_batch["w2cs"]), jnp.asarray(sample_batch["c2ws"]),
        jnp.asarray(sample_batch["intrinsics"]),
        jnp.asarray(sample_batch["near_fars"]), rng=k_rays, train=False)

    params = {"cascade": cas_vars["params"], "render": rnd_vars["params"]}
    batch_stats = {"cascade": cas_vars.get("batch_stats", {}),
                   "render": rnd_vars.get("batch_stats", {})}
    tx, _ = make_optimizer(config, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
