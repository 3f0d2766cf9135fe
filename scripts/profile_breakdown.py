"""Per-component timing breakdown of the eval cascade at bench shapes.

Times featurenet, per-stage warp+variance (pallas fast path), per-stage
costreg (pallas3d), and the softmax/regression/confidence tail separately
on the current default backend. Dev tool, not part of the bench contract.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, VIEWS, NDEPTH = 864, 1152, 5, 192


def _sync(r):
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), r)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    # async dispatch: launch all iters, sync once — amortizes the tunneled
    # host<->device RTT that would otherwise dominate each sample
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from rcmvsnet_tpu.config import BackboneConfig, Config
    from rcmvsnet_tpu.core.geometry import (compose_projection,
                                            linspace_depth_samples)
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
    from rcmvsnet_tpu.nn.costreg import CostRegNet
    from rcmvsnet_tpu.nn.featurenet import FeatureNet
    from rcmvsnet_tpu.models.cascade import (STAGE_SCALES, depth_regression,
                                             photometric_confidence)
    from rcmvsnet_tpu.ops.pallas_warp import plane_sweep_variance_fast
    from rcmvsnet_tpu.train.state import make_models

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    config = Config(backbone=BackboneConfig(
        pallas_warp_max_bytes=17 * 1024 * 1024 if on_tpu else 0,
        pallas_warp_band=16,
        pallas_costreg=on_tpu,
        eval_dtype="bfloat16" if on_tpu else None))
    cascade, _ = make_models(config)

    batch = make_synthetic_batch(B=1, V=VIEWS, H=H, W=W, ndepth=NDEPTH, seed=0)
    imgs = jnp.asarray(batch["imgs"]).astype(jnp.bfloat16)
    projs_all = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    depth_values = jnp.asarray(batch["depth_values"])

    variables = jax.jit(
        lambda rng: cascade.init(rng, imgs.astype(jnp.float32), projs_all,
                                 depth_values, train=False)
    )(jax.random.PRNGKey(0))

    # whole forward
    @jax.jit
    def forward(variables, imgs, projs, depth_values):
        out = cascade.apply(variables, imgs.astype(jnp.float32), projs,
                            depth_values, train=False)
        return out["depth"], out["photometric_confidence"]
    total = timeit(forward, variables, imgs, projs_all, depth_values)
    print(f"total forward: {total:.1f} ms  ({1000/total:.2f} maps/s)")

    # featurenet alone
    feat = FeatureNet(8, 3)
    fvars = {"params": variables["params"]["feature"],
             "batch_stats": variables["batch_stats"]["feature"]}
    B, V = 1, VIEWS

    @jax.jit
    def run_feat(fvars, imgs):
        return feat.apply(fvars, imgs.reshape(B * V, H, W, 3), False)
    print(f"featurenet (5 views): {timeit(run_feat, fvars, imgs):.1f} ms")
    feats = run_feat(fvars, imgs)

    ndepths = (48, 32, 8)
    dv = None
    for si in range(3):
        scale = STAGE_SCALES[si]
        h, w = H // scale, W // scale
        nd = ndepths[si]
        fs = feats[f"stage{si+1}"]
        C = fs.shape[-1]
        features = fs.reshape(B, V, h, w, C)
        projs = compose_projection(projs_all[f"stage{si+1}"])
        if si == 0:
            dv = linspace_depth_samples(depth_values, nd, h, w)
        else:
            # synthetic per-pixel window around a plausible mid depth
            mid = 0.5 * (depth_values[:, 0] + depth_values[:, -1])
            dv = (mid[:, None, None, None]
                  + jnp.linspace(-1.0, 1.0, nd)[None, :, None, None]
                  * 10.0 * jnp.ones((B, nd, h, w)))

        from rcmvsnet_tpu.ops.pallas_costreg import make_layout
        from rcmvsnet_tpu.ops.pallas_warp2 import plane_sweep_variance_lanes
        lay = make_layout(h, w)

        @jax.jit
        def run_warp2(features, projs, dv):
            return plane_sweep_variance_lanes(
                features[0], projs[0], dv[0], lay, rows_per_step=4,
                band=8)[0]
        t = timeit(run_warp2, features, projs, dv)
        print(f"stage{si+1} fused warp+var lanes [D={nd} {h}x{w} C={C}]: "
              f"{t:.1f} ms")

        @jax.jit
        def run_warp(features, projs, dv):
            return plane_sweep_variance_fast(
                features[:, 0], features[:, 1:], projs[:, 1:], projs[:, 0],
                dv, band=16)
        var = run_warp(features, projs, dv)

        reg = CostRegNet(8, conv_impl="lanes" if on_tpu else "xla")
        rkey = f"stage{si+1}"
        rvars = {"params": variables["params"][rkey]["cost_reg"],
                 "batch_stats": variables["batch_stats"][rkey]["cost_reg"]}

        @jax.jit
        def run_reg(rvars, var):
            return reg.apply(rvars, var, False)
        t = timeit(run_reg, rvars, var)
        print(f"stage{si+1} costreg: {t:.1f} ms")
        cost = run_reg(rvars, var)

        @jax.jit
        def run_tail(cost, dv):
            prob = jax.nn.softmax(cost[..., 0].astype(jnp.float32), axis=1)
            return depth_regression(prob, dv), photometric_confidence(prob)
        t = timeit(run_tail, cost, dv)
        print(f"stage{si+1} softmax/reg/conf tail: {t:.1f} ms")


if __name__ == "__main__":
    main()
