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
from .eval_dtu import build_model, load_variables, pick_fast_path

# per-scene fusion hyperparameters (eval_rcmvsnet_tanks.py:408-440,466-491)
PHOTO_THRESHOLD = {
    "Family": 0.8, "Francis": 0.8, "Horse": 0.8, "Lighthouse": 0.8,
    "M60": 0.8, "Panther": 0.8, "Playground": 0.8, "Train": 0.8,
    "Auditorium": 0.7, "Ballroom": 0.7, "Courtroom": 0.7, "Museum": 0.7,
    "Palace": 0.7, "Temple": 0.7,
}
GEO_MASK_THRESHOLD = {
    "Family": 5, "Francis": 6, "Horse": 5, "Lighthouse": 6, "M60": 5,
    "Panther": 5, "Playground": 5, "Train": 5,
    "Auditorium": 3, "Ballroom": 3, "Courtroom": 3, "Museum": 3,
    "Palace": 4, "Temple": 3,
}
GEO_PIXEL_THRESHOLD = {
    "Family": 1.0, "Francis": 1.0, "Horse": 0.75, "Lighthouse": 1.0,
    "M60": 1.0, "Panther": 1.0, "Playground": 1.0, "Train": 1.0,
    "Auditorium": 2.0, "Ballroom": 2.0, "Courtroom": 2.0, "Museum": 2.0,
    "Palace": 2.0, "Temple": 2.0,
}
GEO_DEPTH_THRESHOLD = {
    "Family": 0.01, "Francis": 0.01, "Horse": 0.01, "Lighthouse": 0.01,
    "M60": 0.01, "Panther": 0.01, "Playground": 0.01, "Train": 0.01,
    "Auditorium": 0.01, "Ballroom": 0.01, "Courtroom": 0.01, "Museum": 0.01,
    "Palace": 0.01, "Temple": 0.01,
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
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    outdir = Path(args.outdir)
    img_wh = tuple(int(x) for x in args.img_wh.split(","))
    scans = (INTERMEDIATE_SCANS if args.split == "intermediate"
             else ADVANCED_SCANS)

    if not args.no_test:
        ds = TanksDataset(args.testpath, args.split, nviews=args.num_view,
                          img_wh=img_wh, ndepths=args.numdepth)
        cascade = build_model(args, *pick_fast_path(args, ds[0]))
        forward = jax.jit(lambda v, imgs, projs, dv: cascade.apply(
            v, imgs, projs, dv, train=False))
        variables = load_variables(cascade, args.loadckpt, ds[0])
        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
        import cv2
        for i in range(len(ds)):
            sample = ds[i]
            t0 = time.time()
            outputs = forward(
                variables, jnp.asarray(sample["imgs"])[None],
                jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                       sample["proj_matrices"]),
                jnp.asarray(sample["depth_values"])[None])
            depth = np.asarray(outputs["depth"][0])
            conf = np.asarray(outputs["photometric_confidence"][0])
            print(f"{sample['filename']} {time.time()-t0:.3f}s")
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
