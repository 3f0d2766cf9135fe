"""Per-component timing of the TRAIN step at the reference train shapes.

Times, each as its own jitted callable on the current backend:
  - clean cascade forward (train=True, return_volume)
  - aug cascade forward
  - render pass forward
  - grad of the clean-pass unsup loss alone
  - grad of the aug-pass loss alone
  - grad of the render losses alone
  - the full fused train step (the production path, train/step.py)

Dev tool for deciding where train-time kernel work pays off; not part of
the bench contract. Run on the TPU:  python scripts/profile_train.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:  # persistent compile cache (see bench.py) — cold compiles are 20+ min
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

H = int(os.environ.get("PT_H", 512))
W = int(os.environ.get("PT_W", 640))
V = int(os.environ.get("PT_V", 4))


def _sync(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "reshape"):
            float(jnp.asarray(leaf).reshape(-1)[0])
            break


def timeit(label, fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:36s} {ms:9.2f} ms")
    return ms


def main():
    from rcmvsnet_tpu.config import BackboneConfig, Config
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
    from rcmvsnet_tpu.losses.aug import aug_loss_multi_stage, random_image_mask
    from rcmvsnet_tpu.losses.rays import img2mse, sl1_loss
    from rcmvsnet_tpu.losses.unsup import unsup_loss_multi_stage
    from rcmvsnet_tpu.train.state import create_train_state
    from rcmvsnet_tpu.train.step import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else None
    batch = make_synthetic_batch(B=1, V=V, H=H, W=W, ndepth=192, seed=0)
    wkw = {}
    if on_tpu and os.environ.get("PT_FUSED"):
        # probe + enable the custom-VJP fused warp (as bench.py does)
        import types

        from rcmvsnet_tpu.cli.eval_dtu import pick_fast_path
        sample = {k: batch[k][0] if k != "proj_matrices" else
                  {s: v[0] for s, v in batch[k].items()}
                  for k in ("imgs", "proj_matrices", "depth_values")}
        max_bytes, band, rows, xband = pick_fast_path(
            types.SimpleNamespace(no_pallas=False), sample)
        if max_bytes:
            wkw = dict(pallas_warp_max_bytes=max_bytes,
                       pallas_warp_band=band, pallas_warp_rows=rows,
                       pallas_warp_xband=xband, pallas_warp_train=True,
                       pallas_costreg_train=True)
        print("fused train warp:", wkw and "ON")
    from rcmvsnet_tpu.config import RenderConfig, RunConfig
    rkw = ({"pallas_costreg_train": True, "train_dtype": dtype,
            "ray_major_lookup": True}
           if (on_tpu and os.environ.get("PT_FUSED")) else {})
    # round-5 production train config: single-level remat (pass
    # checkpoint only) — see RunConfig.remat_modules
    config = Config(backbone=BackboneConfig(train_dtype=dtype, **wkw),
                    render=RenderConfig(**rkw),
                    run=RunConfig(remat_modules=not (
                        on_tpu and os.environ.get("PT_FUSED"))))
    state = create_train_state(config, batch, steps_per_epoch=1000,
                               rng=jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(7)

    from rcmvsnet_tpu.train.state import make_models
    cascade, render = make_models(config)
    params, stats = state.params, state.batch_stats
    dlossw = tuple(config.loss.dlossw)

    @jax.jit
    def fwd_clean(p, s):
        return cascade.apply({"params": p, "batch_stats": s},
                             batch["imgs"], batch["proj_matrices"],
                             batch["depth_values"], train=True,
                             return_volume=True, mutable=["batch_stats"])

    @jax.jit
    def fwd_aug(p, s):
        return cascade.apply({"params": p, "batch_stats": s},
                             batch["imgs_aug"], batch["proj_matrices"],
                             batch["depth_values"], train=True,
                             mutable=["batch_stats"])

    def clean_loss(p, s):
        (outputs, _), _ = fwd_clean.__wrapped__(p, s)
        loss, _ = unsup_loss_multi_stage(outputs, batch["center_imgs"],
                                         batch["proj_matrices"], dlossw)
        return loss

    def aug_loss(p, s, pseudo):
        imgs_aug = batch["imgs_aug"]
        ref_masked, fmask = random_image_mask(
            rng, imgs_aug[:, 0], (H // 3, W // 3))
        imgs_aug = imgs_aug.at[:, 0].set(ref_masked)
        outputs, _ = cascade.apply({"params": p, "batch_stats": s},
                                   imgs_aug, batch["proj_matrices"],
                                   batch["depth_values"], train=True,
                                   mutable=["batch_stats"])
        loss, _ = aug_loss_multi_stage(outputs, pseudo, fmask, dlossw)
        return loss

    def render_loss(pr, sr, vol, pseudo):
        result, _ = render.apply(
            {"params": pr, "batch_stats": sr}, vol.astype(jnp.float32),
            pseudo, batch["imgs"].astype(jnp.float32), batch["w2cs"],
            batch["c2ws"], batch["intrinsics"], batch["near_fars"],
            rng=rng, train=True, mutable=["batch_stats"])
        mask = result.rays_depth > 0
        return (img2mse(result.rgb, result.target_rgb)
                + sl1_loss(result.depth, result.rays_depth, mask))

    (outputs, vol), _ = jax.jit(fwd_clean.__wrapped__)(
        params["cascade"], stats["cascade"])
    pseudo = jax.lax.stop_gradient(outputs["depth"])
    vol = jax.lax.stop_gradient(vol)

    timeit("clean fwd (train)", fwd_clean, params["cascade"],
           stats["cascade"])
    timeit("aug fwd (train)", fwd_aug, params["cascade"], stats["cascade"])
    timeit("render fwd", jax.jit(
        lambda pr, sr: render_loss(pr, sr, vol, pseudo)),
        params["render"], stats["render"])
    timeit("grad clean (unsup)", jax.jit(jax.grad(clean_loss)),
           params["cascade"], stats["cascade"])
    timeit("grad aug", jax.jit(jax.grad(
        lambda p, s: aug_loss(p, s, pseudo))),
        params["cascade"], stats["cascade"])
    timeit("grad render", jax.jit(jax.grad(
        lambda pr, sr: render_loss(pr, sr, vol, pseudo))),
        params["render"], stats["render"])

    if os.environ.get("PT_EXTRA"):
        # ---- finer-grained decomposition of the full step ----
        # unsup loss alone: fwd + grad WRT depth maps only (isolates the
        # loss-side inverse-warp gathers + their scatter VJPs from the
        # cascade backward)
        outs_fixed = jax.lax.stop_gradient(
            {k: {"depth": outputs[k]["depth"]} for k in
             ("stage1", "stage2", "stage3")})

        def unsup_only(depths):
            o = {k: {"depth": depths[k]} for k in depths}
            loss, _ = unsup_loss_multi_stage(o, batch["center_imgs"],
                                             batch["proj_matrices"], dlossw)
            return loss
        depths0 = {k: outs_fixed[k]["depth"] for k in outs_fixed}
        timeit("unsup loss fwd", jax.jit(unsup_only), depths0)
        timeit("unsup loss grad (wrt depths)",
               jax.jit(jax.grad(unsup_only)), depths0)

        # aug loss alone (no warps — elementwise depth consistency)
        def aug_only(depths):
            o = {k: {"depth": depths[k]} for k in depths}
            _, fmask = random_image_mask(rng, batch["imgs_aug"][:, 0],
                                         (H // 3, W // 3))
            loss, _ = aug_loss_multi_stage(o, pseudo, fmask, dlossw)
            return loss
        timeit("aug loss grad (wrt depths)",
               jax.jit(jax.grad(aug_only)), depths0)

        # optimizer/update overhead alone
        from rcmvsnet_tpu.train.state import make_optimizer
        tx, schedule = make_optimizer(config, 1000)

        def opt_only(state):
            grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            updates, _ = tx.update(grads, state.opt_state, state.params)
            return jax.tree_util.tree_map(lambda p, u: p + u,
                                          state.params, updates)
        timeit("optimizer update alone", jax.jit(opt_only), state)

        # cascade-only grad WITHOUT the volume (want_volume=False):
        # isolates the want_volume warped-volume gathers + their VJPs
        def clean_loss_novol(p, s):
            outputs, _ = cascade.apply(
                {"params": p, "batch_stats": s}, batch["imgs"],
                batch["proj_matrices"], batch["depth_values"],
                train=True, mutable=["batch_stats"])
            loss, _ = unsup_loss_multi_stage(
                outputs, batch["center_imgs"], batch["proj_matrices"],
                dlossw)
            return loss
        timeit("grad clean (no volume)", jax.jit(jax.grad(clean_loss_novol)),
               params["cascade"], stats["cascade"])

    train_step = jax.jit(make_train_step(config, steps_per_epoch=1000))

    def full(state):
        s2, m = train_step(state, batch, rng)
        return m["loss"]
    timeit("FULL fused train step", full, state)

    if os.environ.get("PT_NOREMAT"):
        import dataclasses as _dc
        cfg2 = _dc.replace(config, run=_dc.replace(config.run, remat=False))
        ts2 = jax.jit(make_train_step(cfg2, steps_per_epoch=1000))

        def full2(state):
            s2, m = ts2(state, batch, rng)
            return m["loss"]
        timeit("FULL step (remat OFF)", full2, state)


if __name__ == "__main__":
    main()
