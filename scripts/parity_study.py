"""Fused-bf16 vs XLA-f32 parity, quantified END-TO-END through fusion.

VERDICT r2 weak #1 / next-step #1: the fused TPU eval path (Pallas warp +
lanes costreg + bf16 convs) was pinned at 5e-2 max relative depth error —
5× the fusion protocol's own 0.01 rel-depth gate — with no measurement of
what that does to fused clouds. This script measures it, on the chip, at
the DTU protocol resolutions, with the synthetic-trained backbone
(tests/golden/; no DTU data or reference ckpt blob exists here):

  for each resolution (1152×864, 1600×1184):
    1. forward all 5 views BOTH ways on identical inputs (full 48/32/8
       cascade, 192-hypothesis sweep);
    2. per-pixel depth/confidence delta distributions;
    3. geometric-consistency fusion both ways (protocol thresholds:
       prob 0.8, rel-depth 0.01, ≥3 views — eval_rcmvsnet_dtu.py:333,361)
       → final-mask flip rate;
    4. DTU metric (fusion/dtu_eval.py) against the exact plane GT cloud
       → acc/comp delta.

Writes PARITY_data.json; PARITY.md summarizes. Run on the TPU:
    python scripts/parity_study.py [--sizes 1152x864] [--ckpt path]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_CKPT = REPO / "tests" / "golden" / "backbone_synth.msgpack"
V, SEED, NDEPTH = 5, 5, 192


def build_inputs(W, H):
    """Synthetic scene + the [1, V, ...] device inputs at (W, H)."""
    import jax
    import jax.numpy as jnp
    from rcmvsnet_tpu.data.synthetic import make_synthetic_views
    from rcmvsnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    s = make_synthetic_views(H=H, W=W, V=V, depth0=600.0, seed=SEED,
                             baseline=8.0)
    samples = []
    for ref in range(V):
        order = [ref] + [v for v in range(V) if v != ref]
        imgs = ((s["images"][order] - IMAGENET_MEAN) / IMAGENET_STD
                ).astype(np.float32)
        proj = np.zeros((V, 2, 4, 4), np.float32)
        for j, v in enumerate(order):
            proj[j, 0] = s["extrinsics"][v]
            proj[j, 1, :3, :3] = s["intrinsics"]
        proj[:, 1, :2] /= 4.0
        stage2, stage3 = proj.copy(), proj.copy()
        stage2[:, 1, :2] *= 2
        stage3[:, 1, :2] *= 4
        dv = np.linspace(s["depth_min"], s["depth_max"], NDEPTH,
                         dtype=np.float32)
        samples.append({
            "imgs": imgs[None],
            "proj_matrices": {"stage1": proj[None], "stage2": stage2[None],
                              "stage3": stage3[None]},
            "depth_values": dv[None],
        })
    return s, samples


def build_fused_forward(H, W, sample):
    """The production fused TPU path, exactly as bench.py/eval_dtu build
    it (probed ladder config + packed FeatureNet + warp layout)."""
    import types

    import jax
    import jax.numpy as jnp
    from rcmvsnet_tpu.cli.eval_dtu import pick_fast_path
    from rcmvsnet_tpu.config import BackboneConfig, Config
    from rcmvsnet_tpu.nn.featurenet_fast import (featurenet_packed,
                                                 pack_featurenet,
                                                 packed_shapes_ok)
    from rcmvsnet_tpu.train.state import make_models

    flat = {"imgs": sample["imgs"][0],
            "proj_matrices": {k: v[0] for k, v in
                              sample["proj_matrices"].items()},
            "depth_values": sample["depth_values"][0]}
    max_bytes, band, rows, xband = pick_fast_path(
        types.SimpleNamespace(no_pallas=False), flat)
    config = Config(backbone=BackboneConfig(
        pallas_warp_max_bytes=max_bytes, pallas_warp_band=band,
        pallas_warp_rows=rows, pallas_warp_xband=xband,
        pallas_costreg=True, pallas_tail=True, eval_dtype="bfloat16"))
    cascade, _ = make_models(config)
    use_packed = packed_shapes_ok(H, W)
    rows_of = lambda i: rows[i] if isinstance(rows, tuple) else rows
    # mirrors cli/eval_dtu.py's gate incl. the per-stage VMEM bounds
    # (stage C = base·sc): warp-layout handoff needs EVERY stage fused
    from rcmvsnet_tpu.ops.pallas_warp2 import EVAL_VMEM_GATE, eval_vmem_bytes
    warp_layout = use_packed and all(
        (H // sc) % rows_of(i) == 0 and (H // sc) % 8 == 0
        and (W // sc) % 8 == 0
        and (H // sc) * (W // sc) * 8 * sc * 2 <= max_bytes
        and eval_vmem_bytes(V, H // sc, W // sc, 8 * sc) <= EVAL_VMEM_GATE
        for i, sc in enumerate((4, 2, 1)))

    @jax.jit
    def forward(variables, imgs, projs, dv):
        features = features_warp = None
        if use_packed:
            packed = pack_featurenet(variables["params"]["feature"],
                                     variables["batch_stats"]["feature"])
            feats = featurenet_packed(
                packed, imgs.astype(jnp.bfloat16).reshape(-1, H, W, 3),
                out_layout="warp" if warp_layout else "nhwc")
            if warp_layout:
                features_warp = feats
            else:
                features = feats
        return cascade.apply(variables, imgs, projs, dv, train=False,
                             features=features, features_warp=features_warp)

    return cascade, forward, (max_bytes, band, rows, xband)


def load_vars(cascade, ckpt, sample):
    import flax.serialization
    import jax
    import jax.numpy as jnp
    template = jax.eval_shape(
        lambda r: cascade.init(
            r, jnp.asarray(sample["imgs"]),
            jax.tree_util.tree_map(jnp.asarray, sample["proj_matrices"]),
            jnp.asarray(sample["depth_values"]), train=False),
        jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    blob = flax.serialization.msgpack_restore(Path(ckpt).read_bytes())
    return {
        "params": flax.serialization.from_state_dict(
            template["params"], blob["params"]),
        "batch_stats": flax.serialization.from_state_dict(
            template["batch_stats"], blob["batch_stats"]),
    }


def fuse_all(depths, confs, scene, prob=0.8, num_consistent=3):
    from rcmvsnet_tpu.fusion.fuse import filter_depth_views
    H, W = depths[0].shape
    K = scene["intrinsics"].copy()
    intrs = [K for _ in range(V)]
    extrs = [scene["extrinsics"][v] for v in range(V)]
    verts, masks = [], []
    for ref in range(V):
        srcs = [v for v in range(V) if v != ref]
        xyz, _, final_mask, _, _ = filter_depth_views(
            depths[ref], confs[ref], np.zeros((H, W, 3), np.float32),
            intrs[ref], extrs[ref],
            [depths[v] for v in srcs], [intrs[v] for v in srcs],
            [extrs[v] for v in srcs],
            prob_threshold=prob, num_consistent=num_consistent)
        verts.append(xyz)
        masks.append(final_mask)
    return np.concatenate(verts, axis=0), np.stack(masks)


def gt_cloud(scene, H, W):
    K = scene["intrinsics"]
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    pts = []
    for v in range(V):
        E = scene["extrinsics"][v]
        d = scene["depths"][v].reshape(-1).astype(np.float64)
        cam = (np.linalg.inv(K) @ pix.T) * d
        world = np.linalg.inv(E) @ np.vstack([cam, np.ones_like(d)[None]])
        pts.append(world[:3].T)
    return np.concatenate(pts, axis=0)


def study(W, H, ckpt, f32_cpu=False):
    import jax
    import jax.numpy as jnp
    from rcmvsnet_tpu.config import Config
    from rcmvsnet_tpu.fusion.dtu_eval import dtu_point_compare
    from rcmvsnet_tpu.train.state import make_models

    print(f"=== {W}x{H} ===", flush=True)
    scene, samples = build_inputs(W, H)

    cascade_x, _ = make_models(Config())     # pure-XLA f32 path
    fwd_x = jax.jit(lambda v, i, p, d: cascade_x.apply(
        v, i, p, d, train=False))
    cascade_f, fwd_f, cfg = build_fused_forward(H, W, samples[0])
    print("fused config (max_bytes, band, rows, xband):", cfg, flush=True)
    vars_x = load_vars(cascade_x, ckpt, samples[0])
    vars_f = load_vars(cascade_f, ckpt, samples[0])

    # the f32 gather path materializes per-view warped volumes; at
    # 1600×1184 that exceeds a single chip's HBM, so run the reference
    # arm on the CPU backend there (bit-identical math, no HBM limit)
    f32_dev = None
    if f32_cpu:
        f32_dev = jax.devices("cpu")[0]
        vars_x = jax.device_put(vars_x, f32_dev)
        print("f32 reference arm on CPU backend", flush=True)

    d_x, c_x, d_f, c_f = [], [], [], []
    rel_stats = []
    for s in samples:
        imgs = jnp.asarray(s["imgs"])
        projs = jax.tree_util.tree_map(jnp.asarray, s["proj_matrices"])
        dv = jnp.asarray(s["depth_values"])
        if f32_dev is not None:
            ox = fwd_x(jax.device_put(vars_x, f32_dev),
                       jax.device_put(imgs, f32_dev),
                       jax.device_put(projs, f32_dev),
                       jax.device_put(dv, f32_dev))
        else:
            ox = fwd_x(vars_x, imgs, projs, dv)
        of = fwd_f(vars_f, imgs, projs, dv)
        wv = of.get("warp_violations")
        if wv is not None:
            assert int(np.asarray(wv).sum()) == 0, "band violation!"
        dx = np.asarray(ox["depth"][0], np.float32)
        df = np.asarray(of["depth"][0], np.float32)
        d_x.append(dx); d_f.append(df)
        c_x.append(np.asarray(ox["photometric_confidence"][0], np.float32))
        c_f.append(np.asarray(of["photometric_confidence"][0], np.float32))
        rel = np.abs(df - dx) / np.abs(dx).clip(1e-6)
        rel_stats.append(rel)
    rel = np.stack(rel_stats)
    conf_delta = np.abs(np.stack(c_f) - np.stack(c_x))

    fused_x, masks_x = fuse_all(d_x, c_x, scene)
    fused_f, masks_f = fuse_all(d_f, c_f, scene)
    flip = float(np.mean(masks_x != masks_f))

    gt = gt_cloud(scene, H, W)
    m_x = dtu_point_compare(fused_x, gt, dst=0.2)
    m_f = dtu_point_compare(fused_f, gt, dst=0.2)

    out = {
        "resolution": f"{W}x{H}",
        "views": V,
        "fused_config": {"max_bytes": cfg[0], "band": list(np.ravel(cfg[1])),
                         "rows": list(np.ravel(cfg[2])),
                         "xband": list(np.ravel(cfg[3]))},
        "depth_rel_delta": {
            "max": float(rel.max()), "mean": float(rel.mean()),
            "p99": float(np.percentile(rel, 99)),
            "p999": float(np.percentile(rel, 99.9)),
            "frac_above_fusion_gate_0.01": float((rel > 0.01).mean()),
        },
        "conf_abs_delta": {"max": float(conf_delta.max()),
                           "mean": float(conf_delta.mean())},
        "fusion_mask_flip_rate": flip,
        "n_points": {"xla_f32": int(len(fused_x)),
                     "fused_bf16": int(len(fused_f))},
        "metrics_xla_f32": m_x,
        "metrics_fused_bf16": m_f,
        "acc_delta": m_f["acc_mean"] - m_x["acc_mean"],
        "comp_delta": m_f["comp_mean"] - m_x["comp_mean"],
        "overall_delta": ((m_f["acc_mean"] + m_f["comp_mean"])
                          - (m_x["acc_mean"] + m_x["comp_mean"])) / 2,
        "overall_rel_delta": float(
            ((m_f["acc_mean"] + m_f["comp_mean"])
             / (m_x["acc_mean"] + m_x["comp_mean"])) - 1.0),
    }
    print(json.dumps(out, indent=2, default=_np_default), flush=True)
    return out


def _np_default(o):
    """json encoder default for numpy scalars (np.int64 etc.)."""
    if hasattr(o, "item"):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=str(DEFAULT_CKPT))
    ap.add_argument("--sizes", default="1152x864,1600x1184")
    ap.add_argument("--views", type=int, default=5,
                    help="views per sample (DTU protocol 5; Tanks&Temples "
                         "geometry: --views 7 --sizes 1920x1056 — "
                         "eval_rcmvsnet_tanks.py:54-56,387)")
    ap.add_argument("--out", default=str(REPO / "PARITY_data.json"))
    ap.add_argument("--f32_cpu", action="store_true",
                    help="run the f32 reference arm on the CPU backend "
                         "(fallback if the XLA-f32 path exceeds HBM)")
    args = ap.parse_args()
    import jax
    if args.f32_cpu:
        # Expose the CPU backend next to the accelerator for the big-size
        # f32 arm. Only needed when JAX_PLATFORMS pins a single platform
        # (unpinned jax initializes every platform, so jax.devices("cpu")
        # already works); extend the pin instead of hardcoding a plugin
        # name so the script stays environment-portable. Must run before
        # backend initialization.
        pinned = os.environ.get("JAX_PLATFORMS", "")
        if pinned and "cpu" not in [p.strip() for p in pinned.split(",")]:
            jax.config.update("jax_platforms", f"{pinned},cpu")
    global V
    V = args.views
    out_path = Path(args.out)
    results = (json.loads(out_path.read_text())
               if out_path.exists() else [])
    done = {(r["resolution"], r.get("views", 5)) for r in results}
    for size in args.sizes.split(","):
        w, h = (int(t) for t in size.split("x"))
        if (f"{w}x{h}", V) in done:
            print(f"skip {w}x{h} (already in {out_path.name})", flush=True)
            continue
        results.append(study(w, h, args.ckpt, f32_cpu=args.f32_cpu))
        # incremental write: a crash at a later size keeps earlier results
        out_path.write_text(
            json.dumps(results, indent=2, default=_np_default))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
