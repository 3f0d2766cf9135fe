"""Tanks & Temples inference + fusion driver.

Parity target: /root/reference/eval_rcmvsnet_tanks.py — 1920×1056 inputs,
7 views, per-scene fusion hyperparameters (:408-440,466-491), one .ply per
scan for the benchmark-website submission.

Usage:
  python -m rcmvsnet_tpu.cli.eval_tanks --testpath /data/tanks \
      --loadckpt ckpt.msgpack --outdir ./tanks_exp --split intermediate
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import save_pfm, write_cam_file
from ..data.tanks import ADVANCED_SCANS, INTERMEDIATE_SCANS, TanksDataset
from ..fusion.fuse import fuse_scan
from .eval_dtu import (build_forward, build_model, load_variables,
                       pick_fast_path, raise_on_warp_violations)

# per-scene fusion hyperparameters, transcribed 1:1 from
# eval_rcmvsnet_tanks.py:400-440 (intermediate) and :460-491 (advanced);
# equality against the reference asserted by tests/test_tanks_tables.py
PHOTO_THRESHOLD = {
    "Family": 0.9, "Francis": 0.8, "Horse": 0.8, "Lighthouse": 0.8,
    "M60": 0.9, "Panther": 0.9, "Playground": 0.85, "Train": 0.9,
    "Auditorium": 0.7, "Ballroom": 0.8, "Courtroom": 0.8, "Museum": 0.8,
    "Palace": 0.9, "Temple": 0.8,
}
GEO_MASK_THRESHOLD = {
    "Family": 6, "Francis": 8, "Horse": 4, "Lighthouse": 7, "M60": 6,
    "Panther": 7, "Playground": 7, "Train": 6,
    "Auditorium": 3, "Ballroom": 4, "Courtroom": 3, "Museum": 4,
    "Palace": 5, "Temple": 3,
}
GEO_PIXEL_THRESHOLD = {
    "Family": 0.75, "Francis": 1.0, "Horse": 1.25, "Lighthouse": 1.0,
    "M60": 0.75, "Panther": 1.0, "Playground": 1.0, "Train": 1.5,
    "Auditorium": 4.0, "Ballroom": 4.0, "Courtroom": 3.0, "Museum": 4.0,
    "Palace": 4.0, "Temple": 4.0,
}
GEO_DEPTH_THRESHOLD = {
    "Family": 0.01, "Francis": 0.01, "Horse": 0.01, "Lighthouse": 0.01,
    "M60": 0.005, "Panther": 0.01, "Playground": 0.01, "Train": 0.01,
    "Auditorium": 0.005, "Ballroom": 0.005, "Courtroom": 0.005,
    "Museum": 0.01, "Palace": 0.005, "Temple": 0.01,
}
# native capture resolutions per scene, kept ONLY as parity documentation
# (equality-tested vs the reference tables): the reference's own
# image_sizes lookup is dead — tanks.py:135 assigns img_w/img_h and never
# reads them; scale_mvs_input (:106-121) rescales intrinsics from the
# ACTUAL on-disk image dimensions to img_wh, which is exactly what
# data/tanks.py does. Nothing at runtime consumes this table.
IMAGE_SIZES = {
    "Family": (1920, 1080), "Francis": (1920, 1080), "Horse": (1920, 1080),
    "Lighthouse": (2048, 1080), "M60": (2048, 1080), "Panther": (2048, 1080),
    "Playground": (1920, 1080), "Train": (1920, 1080),
    "Auditorium": (1920, 1080), "Ballroom": (1920, 1080),
    "Courtroom": (1920, 1080), "Museum": (1920, 1080),
    "Palace": (1920, 1080), "Temple": (1920, 1080),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Tanks&Temples eval")
    p.add_argument("--testpath", required=True)
    p.add_argument("--split", default="intermediate",
                   choices=["intermediate", "advanced"])
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--outdir", default="./tanks_exp")
    p.add_argument("--num_view", type=int, default=7)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--img_wh", default="1920,1056")
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--no_test", action="store_true")
    p.add_argument("--no_filter", action="store_true")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable the Pallas warp fast path")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard inference over this many devices (data "
                        "parallel over reference views via shard_map; "
                        "default: all local devices)")
    return p.parse_args(argv)


def _write_tanks_view(outdir, sample, depth, conf, IMAGENET_MEAN,
                      IMAGENET_STD, cv2):
    """Write one reference view's outputs (pfm/cams/images), matching
    /root/reference/eval_rcmvsnet_tanks.py's per-view output tree."""
    fn = sample["filename"]
    for sub in ["depth_est", "confidence", "cams", "images"]:
        (outdir / fn.format(sub, "")).parent.mkdir(
            parents=True, exist_ok=True)
    save_pfm(outdir / fn.format("depth_est", ".pfm"), depth)
    save_pfm(outdir / fn.format("confidence", ".pfm"), conf)
    cam = sample["proj_matrices"]["stage3"][0]
    dvals = sample["depth_values"]
    write_cam_file(outdir / fn.format("cams", "_cam.txt"),
                   cam[0], cam[1, :3, :3],
                   [dvals[0], dvals[1] - dvals[0], len(dvals),
                    dvals[-1]])
    img = sample["imgs"][0] * IMAGENET_STD + IMAGENET_MEAN
    cv2.imwrite(str(outdir / fn.format("images", ".jpg")),
                cv2.cvtColor((img.clip(0, 1) * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))


def main(argv=None):
    args = parse_args(argv)
    outdir = Path(args.outdir)
    img_wh = tuple(int(x) for x in args.img_wh.split(","))
    scans = (INTERMEDIATE_SCANS if args.split == "intermediate"
             else ADVANCED_SCANS)

    if not args.no_test:
        ds = TanksDataset(args.testpath, args.split, nviews=args.num_view,
                          img_wh=img_wh, ndepths=args.numdepth)
        S = args.n_devices or jax.local_device_count()
        # probe the warp-kernel band coverage over EVERY view of EVERY
        # scene (cams only, no image decode) — per-scene cameras and depth
        # ranges differ, and an unprobed view that violates the band would
        # get silently zeroed warp taps
        probe_all = (jax.default_backend() == "tpu"
                     and not getattr(args, "no_pallas", False))
        cams = ([ds.sample_cams(i) for i in range(len(ds))]
                if probe_all else [ds.sample_cams(0)])
        cascade = build_model(args, *pick_fast_path(args, cams))
        forward = build_forward(cascade, args, ds[0], n_shards=S)
        variables = load_variables(cascade, args.loadckpt, ds[0])
        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
        import cv2
        # pipeline host-side decode/resize against device compute (the
        # synchronous 1920x1056 loads would otherwise serialize with it),
        # one thread per view so an S-shard chunk decodes concurrently
        from concurrent.futures import ThreadPoolExecutor

        def submit_chunk(pool, i0):
            # one reference view per device (tail repeats the last view)
            return [pool.submit(ds.__getitem__, min(i0 + j, len(ds) - 1))
                    for j in range(S)]

        pool = ThreadPoolExecutor(max_workers=max(1, S))
        pending = submit_chunk(pool, 0)
        for i0 in range(0, len(ds), S):
            samples = [f.result() for f in pending]
            if i0 + S < len(ds):
                pending = submit_chunk(pool, i0 + S)
            t0 = time.time()
            outputs = forward(
                variables,
                jnp.asarray(np.stack([s["imgs"] for s in samples])),
                {k: jnp.asarray(np.stack([s["proj_matrices"][k]
                                          for s in samples]))
                 for k in samples[0]["proj_matrices"]},
                jnp.asarray(np.stack([s["depth_values"]
                                      for s in samples])))
            if i0 == 0:
                raise_on_warp_violations(
                    outputs, f"{samples[0]['filename']} chunk 0")
            depths = np.asarray(outputs["depth"])
            confs = np.asarray(outputs["photometric_confidence"])
            dt = time.time() - t0
            n_real = min(S, len(ds) - i0)
            print(f"{samples[0]['filename']} +{n_real} {dt:.3f}s"
                  + (f" ({S} shards)" if S > 1 else ""))
            for j, sample in enumerate(samples[:n_real]):
                _write_tanks_view(outdir, sample, depths[j], confs[j],
                                  IMAGENET_MEAN, IMAGENET_STD, cv2)
        pool.shutdown(wait=False)

    if not args.no_filter:
        for scan in scans:
            ply = outdir / f"{scan}.ply"
            n = fuse_scan(outdir / scan,
                          Path(args.testpath) / args.split / scan / "pair.txt",
                          ply,
                          prob_threshold=PHOTO_THRESHOLD[scan],
                          num_consistent=GEO_MASK_THRESHOLD[scan],
                          img_dist_thresh=GEO_PIXEL_THRESHOLD[scan],
                          depth_thresh=GEO_DEPTH_THRESHOLD[scan])
            print(f"fused {scan}: {n} points -> {ply}")


if __name__ == "__main__":
    main()
