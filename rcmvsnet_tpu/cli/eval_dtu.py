"""DTU inference + fusion driver.

Phase 1 (save_depth): run the backbone per reference view, write
depth_est/confidence PFMs, cams, images — matching the output tree of
/root/reference/eval_rcmvsnet_dtu.py:157-277.
Phase 2 (fusion): photometric+geometric filtering into
mvsnet{scan:03d}_l3.ply with the reference's per-scan pixel thresholds,
parallelized over scans with a process pool (:457-512).
Optional phase 3: the ported DTU acc/comp benchmark if GT is available.

Usage:
  python -m rcmvsnet_tpu.cli.eval_dtu --testpath /data/dtu_test \
      --loadckpt ckpt.msgpack --outdir ./dtu_exp [--testlist lists/dtu/test.txt]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig, Config
from ..core.io import save_pfm, write_cam_file
from ..data.dtu_test import DTUTestDataset
from ..data.loader import DataLoader
from ..fusion.fuse import DTU_IMG_DIST_THRESHOLDS, fuse_scan
from ..train.checkpoint import load_backbone
from ..train.state import make_models


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DTU eval: depth + fusion")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", default="lists/dtu/test.txt")
    p.add_argument("--loadckpt", required=True,
                   help="backbone .msgpack (export_backbone) or reference "
                        "*_cas.ckpt (torch) to convert on the fly")
    p.add_argument("--outdir", default="./dtu_exp")
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--max_h", type=int, default=1200)
    p.add_argument("--max_w", type=int, default=1600)
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--prob_thres", type=float, default=0.8)
    p.add_argument("--num_consistency", type=int, default=3)
    p.add_argument("--depth_thres", type=float, default=0.01)
    p.add_argument("--num_worker", type=int, default=4)
    p.add_argument("--no_test", action="store_true", help="fusion only")
    p.add_argument("--no_filter", action="store_true", help="depth only")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable the Pallas warp fast path")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard inference over this many devices (data "
                        "parallel over reference views via shard_map; "
                        "default: all local devices)")
    p.add_argument("--gt_dir", default=None,
                   help="DTU SampleSet/MVS Data dir (Points/stl + ObsMask); "
                        "when given, phase 3 runs the ported acc/comp "
                        "benchmark on the fused clouds and writes "
                        "dtu_metrics.json")
    return p.parse_args(argv)


def _save_rainbow(path, arr, vmin, vmax):
    """JET-colormapped visualization jpg (rainbow-equivalent)."""
    import cv2
    norm = np.clip((arr - vmin) / max(vmax - vmin, 1e-8), 0, 1)
    img = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
    cv2.imwrite(str(path), img)


def build_model(args, pallas_warp_max_bytes: int = 0, pallas_band=24,
                pallas_rows=8, pallas_xband=0):
    csv = lambda s, t: tuple(t(x) for x in s.split(",") if x)
    pallas_costreg = (not getattr(args, "no_pallas", False)
                      and jax.default_backend() == "tpu")
    config = Config(backbone=BackboneConfig(
        ndepths=csv(args.ndepths, int),
        depth_intervals_ratio=csv(args.depth_inter_r, float),
        cr_base_chs=csv(args.cr_base_chs, int),
        pallas_warp_max_bytes=pallas_warp_max_bytes,
        pallas_warp_band=pallas_band,
        pallas_warp_rows=pallas_rows,
        pallas_warp_xband=pallas_xband,
        pallas_costreg=pallas_costreg,
        pallas_tail=pallas_costreg))
    cascade, _ = make_models(config)
    return cascade


# (rows-per-step, band) candidate ladder, cheapest first: the hat
# matmul's cost scales with the actual band (measured — a 64-sublane M
# does NOT pay for a full 128 MXU tile), so smaller bands win outright;
# among equal bands, larger row groups mean fewer grid steps but a wider
# y-spread to cover, so both orderings appear and per-scan coverage
# (check_group_coverage) picks the first satisfied config per stage.
WARP_LADDER = [(2, 4), (2, 5), (4, 6), (2, 6), (4, 8), (2, 8), (8, 12),
               (8, 16), (8, 24), (8, 32)]


PROBE_EXACT_LIMIT = 64  # ≤ this many views: full-depth exact probing


def pick_fast_path(args, cams, hw=None):
    """Enable the fused Pallas warp when on TPU, not disabled, and EVERY
    probed reference view's geometry satisfies the kernel's band-coverage
    precondition — the kernel silently zeros out-of-band taps, so a single
    uncovered view would corrupt its depth map with no error raised.

    cams: list of camera-only samples ({"proj_matrices", "depth_values"},
    the datasets' sample_cams(i)) covering every view the chosen config
    will run on; a single full sample also works. hw: input (H, W)
    (defaults to cams[0]["hw"] or the sample's image shape).

    ≤ PROBE_EXACT_LIMIT views probe all depth planes exactly. More (T&T's
    hundreds of views) use a 2-plane endpoint probe with a +1-row / wider
    x-band safety margin: per-pixel source coordinates are linear in
    1/depth, so each row group's spread is maximal at the endpoint planes
    (convexity), and the margin absorbs the sub-row floor() jitter of
    interior planes that the endpoint check can't see.

    Stage-2/3 probes extend the depth hull by the cascade's re-centering
    window slack: windows around the (unclamped) soft-argmax depth reach
    up to Σ nd_k/2·ratio_k·interval past [d_min, d_max]
    (models/cascade.py:300-311, matching the reference's no-clamp window).

    Returns (pallas_warp_max_bytes, band, rows, xband) with per-stage
    tuples picked cheapest-first from WARP_LADDER; max_bytes 0 disables
    the fast path entirely (the cascade then runs the XLA warp).
    """
    if getattr(args, "no_pallas", False) or jax.default_backend() != "tpu":
        return 0, 24, 8, (0, 0, 0)
    from ..ops.pallas_warp2 import check_group_coverage
    if isinstance(cams, dict):
        cams = [cams]
    if hw is None:
        hw = (cams[0]["hw"] if "hw" in cams[0]
              else cams[0]["imgs"].shape[1:3])
    H, W = hw
    exact = len(cams) <= PROBE_EXACT_LIMIT

    csv = lambda s, t: tuple(t(x) for x in s.split(",") if x)
    ndepths = csv(getattr(args, "ndepths", "48,32,8"), int)
    ratios = csv(getattr(args, "depth_inter_r", "4,2,1"), float)

    def stage_hull(dv, stage_idx):
        lo, hi = float(dv[0]), float(dv[-1])
        interval = (hi - lo) / len(dv)  # cascade divisor: full D
        ext = sum(ndepths[j] / 2.0 * ratios[j] * interval
                  for j in range(1, stage_idx + 1))
        return lo - ext, hi + ext

    stages = [("stage1", 4), ("stage2", 2), ("stage3", 1)]
    rows, band, xband = [], [], []
    for s_idx, (stage, sc) in enumerate(stages):
        h, w = H // sc, W // sc

        def covered(r, b, xb=None):
            b_probe = b if exact else b - 1
            xb_probe = xb if (xb is None or exact) else xb - 128
            if b_probe < 1 or (xb_probe is not None and xb_probe < 128):
                return False
            for cam in cams:
                dvals = np.asarray(cam["depth_values"])
                lo, hi = stage_hull(dvals, s_idx)
                n = len(dvals) if exact else 2
                dv = np.linspace(lo, hi, n, dtype=np.float32)[None]
                if not check_group_coverage(
                        np.asarray(cam["proj_matrices"][stage])[None], dv,
                        h, w, r, b_probe, x_band=xb_probe):
                    return False
            return True

        for r_try, b_try in WARP_LADDER:
            if h % r_try == 0 and covered(r_try, b_try):
                break
        else:
            print(f"pallas fast path: off ({stage} band coverage over "
                  f"{len(cams)} views)")
            return 0, 24, 8, (0, 0, 0)
        rows.append(r_try)
        band.append(b_try)
        # smallest 128-multiple x-band whose coverage holds (stage
        # widths differ 4x, so so does the band)
        xband.append(next(
            (xb for xb in (128, 256, 384, 512, 640)
             if xb < w and covered(r_try, b_try, xb)), 0))
    rows, band, xband = tuple(rows), tuple(band), tuple(xband)
    print(f"pallas fast path: ON (rows {rows}, band {band}, "
          f"xband {xband}; probed {len(cams)} views, "
          f"{'exact' if exact else 'endpoint+margin'})")
    return 17 * 1024 * 1024, band, rows, xband


def build_forward(cascade, args, sample, n_shards: int = 1):
    """jitted eval forward with the packed-FeatureNet fast path.

    On TPU (and unless --no_pallas) the FeatureNet runs through the
    Pallas channel-major chain (nn/featurenet_fast.py); when every stage
    additionally takes the fully fused warp+costreg path, the feature
    heads hand the warp kernel its source layout directly
    (out_layout='warp')."""
    from ..nn.featurenet_fast import (featurenet_packed, pack_featurenet,
                                      packed_shapes_ok)
    Hs, Ws = sample["imgs"].shape[1:3]
    use_packed = (jax.default_backend() == "tpu"
                  and not getattr(args, "no_pallas", False)
                  and packed_shapes_ok(Hs, Ws))
    # warp-layout handoff requires the fully fused path at every stage
    # (mirrors the _DepthStage fused gate)
    ndepths = tuple(int(x) for x in args.ndepths.split(",") if x)
    rows = cascade.pallas_warp_rows
    rows_of = lambda i: rows[i] if isinstance(rows, (tuple, list)) else rows
    from ..ops.pallas_warp2 import EVAL_VMEM_GATE, eval_vmem_bytes
    Vs = sample["imgs"].shape[0]
    warp_layout = (use_packed and cascade.pallas_costreg
                   and cascade.pallas_warp_max_bytes > 0
                   and all(d % 8 == 0 for d in ndepths)
                   and all((Hs // sc) % rows_of(i) == 0
                           and (Hs // sc) % 8 == 0
                           and (Ws // sc) % 8 == 0
                           and (Hs // sc) * (Ws // sc)
                           * cascade.base_channels * sc * 2
                           <= cascade.pallas_warp_max_bytes
                           and eval_vmem_bytes(
                               Vs, Hs // sc, Ws // sc,
                               cascade.base_channels * sc)
                           <= EVAL_VMEM_GATE
                           for i, sc in enumerate((4, 2, 1))))

    def _fwd(v, imgs, projs, dv):
        features = features_warp = None
        if use_packed:
            packed = pack_featurenet(v["params"]["feature"],
                                     v["batch_stats"]["feature"])
            feats = featurenet_packed(
                packed, imgs.astype(jnp.bfloat16).reshape(-1, Hs, Ws, 3),
                out_layout="warp" if warp_layout else "nhwc")
            if warp_layout:
                features_warp = feats
            else:
                features = feats
        return cascade.apply(v, imgs, projs, dv, train=False,
                             features=features,
                             features_warp=features_warp)

    if n_shards <= 1:
        return jax.jit(_fwd)
    # data-parallel serving: one reference view per device via shard_map —
    # each device runs the SAME fully fused B=1 Pallas path it runs
    # single-chip (the per-device body sees the local batch element), so
    # multi-chip eval is a pure throughput multiplier with no collectives.
    # Replaces the reference's nn.DataParallel inference
    # (/root/reference/eval_rcmvsnet_dtu.py:189).
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("batch",))
    sharded = shard_map(_fwd, mesh=mesh,
                        in_specs=(P(), P("batch"), P("batch"), P("batch")),
                        out_specs=P("batch"))
    return jax.jit(sharded)


def load_variables(cascade, ckpt_path, sample):
    """Load our msgpack export or convert a reference torch checkpoint."""
    imgs = jnp.asarray(sample["imgs"])[None]
    projs = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                   sample["proj_matrices"])
    dv = jnp.asarray(sample["depth_values"])[None]
    template = jax.eval_shape(
        lambda r: cascade.init(r, imgs, projs, dv, train=False),
        jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        template)
    if str(ckpt_path).endswith(".msgpack"):
        return load_backbone(ckpt_path, template)
    from ..train.convert import convert_cascade_checkpoint
    params, stats, _ = convert_cascade_checkpoint(ckpt_path)
    import flax.serialization
    return {
        "params": flax.serialization.from_state_dict(template["params"], params),
        "batch_stats": flax.serialization.from_state_dict(
            template["batch_stats"], stats),
    }


def raise_on_warp_violations(outputs, context: str):
    """Fail loudly if the fused warp kernel reported band-coverage
    violations (out-of-band taps zeroed → corrupt cost volume). Called on
    the FIRST chunk of each (scan, config): the probed ladder config is
    geometry-dependent, not frame-dependent, so one check per scan
    suffices and later chunks skip the device→host sync."""
    wv = outputs.get("warp_violations")
    if wv is None:
        return
    n = int(np.asarray(wv).sum())
    if n:
        raise RuntimeError(
            f"warp kernel band-coverage violation on {context}: {n} "
            f"(view, row-group[, x-tile]) windows truncated in-image "
            f"taps — the probed (rows, band, xband) config does not "
            f"cover this geometry. Rerun with --no_pallas, or report "
            f"the scan so the probe ladder can be extended.")


def _cams_key(cam_samples):
    import hashlib
    h = hashlib.sha1()
    for c in cam_samples:
        h.update(np.ascontiguousarray(
            c["proj_matrices"]["stage1"]).tobytes())
        h.update(np.ascontiguousarray(c["depth_values"]).tobytes())
    return h.hexdigest()


def save_depth(args, testlist):
    outdir = Path(args.outdir)
    cascade = None
    variables = None
    forward = None
    cfg_prev = probe_key = None
    S = args.n_devices or jax.local_device_count()

    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    for scan in testlist:
        ds = DTUTestDataset(args.testpath, [scan], nviews=args.num_view,
                            ndepths=args.numdepth,
                            interval_scale=args.interval_scale,
                            max_h=args.max_h, max_w=args.max_w)
        # probe the warp-kernel coverage over EVERY reference view of the
        # scan (cams-only, no image decode); scans sharing the same rig +
        # depth ranges (all of DTU) hash identically and skip the re-probe
        probe_all = (jax.default_backend() == "tpu"
                     and not getattr(args, "no_pallas", False))
        cam_samples = ([ds.sample_cams(i) for i in range(len(ds))]
                       if probe_all else [ds.sample_cams(0)])
        key = _cams_key(cam_samples)
        if key != probe_key:
            probe_key = key
            cfg = pick_fast_path(args, cam_samples)
            if cfg != cfg_prev:
                cfg_prev = cfg
                cascade = build_model(args, *cfg)
                forward = build_forward(cascade, args, ds[0], n_shards=S)
                variables = load_variables(cascade, args.loadckpt, ds[0])
        # pipeline host-side JPEG decode/resize against device compute:
        # chunk k+1 loads on worker threads while the device runs chunk
        # k, with one thread PER VIEW so an S-shard chunk's decodes run
        # concurrently instead of serializing behind a single worker
        from concurrent.futures import ThreadPoolExecutor

        def submit_chunk(pool, i0):
            # one reference view per device; the tail chunk repeats its
            # last view to fill the mesh (padded outputs are discarded)
            return [pool.submit(ds.__getitem__, min(i0 + j, len(ds) - 1))
                    for j in range(S)]

        pool = ThreadPoolExecutor(max_workers=max(1, S))
        pending = submit_chunk(pool, 0)
        for i0 in range(0, len(ds), S):
            samples = [f.result() for f in pending]
            if i0 + S < len(ds):
                pending = submit_chunk(pool, i0 + S)
            t0 = time.time()
            stack = lambda key: jnp.asarray(
                np.stack([np.asarray(s[key]) for s in samples]))
            outputs = forward(
                variables, stack("imgs"),
                {k: jnp.asarray(
                    np.stack([np.asarray(s["proj_matrices"][k])
                              for s in samples]))
                 for k in samples[0]["proj_matrices"]},
                stack("depth_values"))
            if i0 == 0:
                raise_on_warp_violations(outputs, f"{scan} chunk 0")
            depths = np.asarray(outputs["depth"])
            confs = np.asarray(outputs["photometric_confidence"])
            dt = time.time() - t0
            n_real = min(S, len(ds) - i0)
            print(f"{scan} view {i0}+{n_real}/{len(ds)} {dt:.3f}s "
                  f"res {depths.shape[1:]}"
                  + (f" ({S} shards)" if S > 1 else ""))
            for j in range(n_real):
                _write_view(args, outdir, samples[j], depths[j], confs[j],
                            IMAGENET_MEAN, IMAGENET_STD)
        pool.shutdown(wait=False)


def _write_view(args, outdir, sample, depth, conf, IMAGENET_MEAN,
                IMAGENET_STD):
    """Write one reference view's outputs (pfm/cams/images/rainbow
    visualizations), matching /root/reference/eval_rcmvsnet_dtu.py:214-253's
    output tree."""
    fn = sample["filename"]
    for sub in ["depth_est", "confidence", "cams", "images",
                "depth_map", "confidence_map"]:
        (outdir / fn.format(sub, "")).parent.mkdir(
            parents=True, exist_ok=True)
    save_pfm(outdir / fn.format("depth_est", ".pfm"), depth)
    save_pfm(outdir / fn.format("confidence", ".pfm"), conf)
    # rainbow visualizations (reference: plt.imsave cmap='rainbow',
    # eval_rcmvsnet_dtu.py:242-248)
    import cv2
    dvals = sample["depth_values"]
    _save_rainbow(outdir / fn.format("depth_map", ".jpg"), depth,
                  dvals[0], dvals[-1])
    _save_rainbow(outdir / fn.format("confidence_map", ".jpg"),
                  conf, conf.min(), conf.max())
    cam = sample["proj_matrices"]["stage3"][0]  # ref view, full-res K
    dvals = sample["depth_values"]
    write_cam_file(outdir / fn.format("cams", "_cam.txt"),
                   cam[0], cam[1, :3, :3],
                   [dvals[0], dvals[1] - dvals[0], len(dvals),
                    dvals[-1]])
    import cv2
    img = sample["imgs"][0] * IMAGENET_STD + IMAGENET_MEAN
    cv2.imwrite(str(outdir / fn.format("images", ".jpg")),
                cv2.cvtColor((img.clip(0, 1) * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))


def fuse_one(args_tuple):
    scan, args = args_tuple
    scan_id = int(scan[4:])
    ply = Path(args.outdir) / f"mvsnet{scan_id:03d}_l3.ply"
    n = fuse_scan(Path(args.outdir) / scan,
                  Path(args.testpath) / scan / "pair.txt", ply,
                  prob_threshold=args.prob_thres,
                  num_consistent=args.num_consistency,
                  img_dist_thresh=DTU_IMG_DIST_THRESHOLDS.get(scan_id, 0.5),
                  depth_thresh=args.depth_thres)
    print(f"fused {scan}: {n} points -> {ply}")
    return scan, n


def main(argv=None):
    args = parse_args(argv)
    if isinstance(args.testlist, str) and Path(args.testlist).exists():
        testlist = [l.strip() for l in open(args.testlist) if l.strip()]
    else:
        testlist = [s for s in args.testlist.split(",") if s]

    if not args.no_test:
        save_depth(args, testlist)
    if not args.no_filter:
        from multiprocessing import Pool
        work = [(scan, args) for scan in testlist]
        if args.num_worker > 1:
            with Pool(args.num_worker) as pool:
                results = pool.map(fuse_one, work)
        else:
            results = [fuse_one(w) for w in work]
        print(json.dumps({s: n for s, n in results}))

    if args.gt_dir:
        # phase 3: ported DTU acc/comp benchmark (matlab_eval replacement;
        # protocol per BASELINE.md — acc/comp/overall over the fused plys)
        from ..fusion.dtu_eval import dtu_eval_scans
        sets = sorted(int(s[4:]) for s in testlist)
        metrics = dtu_eval_scans(args.outdir, args.gt_dir, sets=sets)
        out = Path(args.outdir) / "dtu_metrics.json"
        out.write_text(json.dumps(metrics, indent=2, default=str))
        print(json.dumps({"acc": metrics["acc"], "comp": metrics["comp"],
                          "overall": metrics["overall"]}))


if __name__ == "__main__":
    main()
