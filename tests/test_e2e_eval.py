"""End-to-end: synthetic scan on disk in DTU-test layout → eval CLI
(depth inference + fusion) → point cloud near the known plane."""
import os

import numpy as np
import pytest

from rcmvsnet_tpu.core.io import load_ply, save_ply, write_cam_file, write_pair_file
from rcmvsnet_tpu.data.synthetic import make_synthetic_views


@pytest.fixture(scope="module")
def synthetic_scan(tmp_path_factory):
    """Write a 4-view synthetic scene as scan1/{images,cams,pair.txt}."""
    import cv2
    root = tmp_path_factory.mktemp("dtu_test_data")
    scan_dir = root / "scan1"
    (scan_dir / "images").mkdir(parents=True)
    (scan_dir / "cams").mkdir()

    V = 4
    s = make_synthetic_views(H=128, W=160, V=V, depth0=600.0, seed=5,
                             baseline=8.0)
    for v in range(V):
        img = (s["images"][v].clip(0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(scan_dir / "images" / f"{v:08d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        write_cam_file(scan_dir / "cams" / f"{v:08d}_cam.txt",
                       s["extrinsics"][v], s["intrinsics"],
                       [s["depth_min"], (s["depth_max"] - s["depth_min"]) / 192,
                        192.0, s["depth_max"]])
    pairs = [(v, [u for u in range(V) if u != v]) for v in range(V)]
    write_pair_file(scan_dir / "pair.txt", pairs)
    return root, s


def test_eval_dtu_cli_end_to_end(tmp_path, synthetic_scan):
    testpath, scene = synthetic_scan

    # export a random-init backbone checkpoint the CLI can load
    import jax
    from rcmvsnet_tpu.config import Config
    from rcmvsnet_tpu.train.state import make_models
    from rcmvsnet_tpu.train.checkpoint import export_backbone
    from rcmvsnet_tpu.data.dtu_test import DTUTestDataset
    import jax.numpy as jnp
    import flax.struct

    cascade, _ = make_models(Config())
    ds = DTUTestDataset(testpath, ["scan1"], nviews=4, ndepths=64,
                        max_h=128, max_w=160)
    sample = ds[0]
    variables = cascade.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["imgs"])[None],
        jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                               sample["proj_matrices"]),
        jnp.asarray(sample["depth_values"])[None], train=False)

    class FakeState(flax.struct.PyTreeNode):
        step: int
        params: dict
        batch_stats: dict
        opt_state: tuple

    state = FakeState(0, {"cascade": variables["params"], "render": {}},
                      {"cascade": variables["batch_stats"], "render": {}}, ())
    ckpt = export_backbone(str(tmp_path), state, "backbone.msgpack")

    from rcmvsnet_tpu.cli import eval_dtu
    outdir = tmp_path / "out"
    eval_dtu.main([
        "--testpath", str(testpath), "--testlist", "scan1",
        "--loadckpt", ckpt, "--outdir", str(outdir),
        "--num_view", "4", "--numdepth", "64",
        "--max_h", "128", "--max_w", "160",
        "--prob_thres", "0.0",        # random weights → flat confidence
        "--num_consistency", "1", "--num_worker", "1",
    ])

    # outputs exist
    assert (outdir / "scan1" / "depth_est" / "00000000.pfm").exists()
    assert (outdir / "scan1" / "confidence" / "00000000.pfm").exists()
    assert (outdir / "scan1" / "cams" / "00000000_cam.txt").exists()
    ply = outdir / "mvsnet001_l3.ply"
    assert ply.exists()
    xyz, rgb = load_ply(ply)
    # random weights won't give good depth, but the pipeline must produce
    # a finite cloud inside the sweep range
    assert np.isfinite(xyz).all()


def test_eval_dtu_cli_gt_benchmark_phase(tmp_path):
    """Phase 3 wiring: --gt_dir runs the ported DTU acc/comp benchmark on
    the fused cloud and writes dtu_metrics.json (reference workflow ends in
    matlab_eval — README.md:141-147). Synthetic GT: the fused 'cloud' is
    the GT shifted by 0.3mm, so acc ≈ comp ≈ 0.3 and the metric is exact."""
    import json
    from scipy.io import savemat

    rs = np.random.RandomState(0)
    stl = (rs.rand(4000, 3) * 100).astype(np.float64)
    data = stl + 0.3 / np.sqrt(3.0)

    outdir = tmp_path / "out"
    outdir.mkdir()
    save_ply(outdir / "mvsnet001_l3.ply", data.astype(np.float32))

    gt = tmp_path / "gt"
    (gt / "Points" / "stl").mkdir(parents=True)
    (gt / "ObsMask").mkdir()
    save_ply(gt / "Points" / "stl" / "stl001_total.ply",
             stl.astype(np.float32))
    # ObsMask covering all of space; plane below everything
    savemat(gt / "ObsMask" / "ObsMask1_10.mat",
            {"ObsMask": np.ones((12, 12, 12), np.uint8),
             "BB": np.array([[-5.0, -5.0, -5.0], [105.0, 105.0, 105.0]]),
             "Res": np.array([[10.0]])})
    savemat(gt / "ObsMask" / "Plane1.mat",
            {"P": np.array([[0.0], [0.0], [1.0], [5.0]])})

    from rcmvsnet_tpu.cli import eval_dtu
    eval_dtu.main([
        "--testpath", str(tmp_path), "--testlist", "scan1",
        "--loadckpt", "unused.msgpack", "--outdir", str(outdir),
        "--no_test", "--no_filter", "--gt_dir", str(gt),
    ])
    metrics = json.loads((outdir / "dtu_metrics.json").read_text())
    assert abs(metrics["acc"] - 0.3) < 0.02
    assert abs(metrics["comp"] - 0.3) < 0.02
    assert abs(metrics["overall"] - 0.3) < 0.02


def test_reduce_points_deterministic():
    """Default seed=0 makes published acc/comp numbers reproducible."""
    from rcmvsnet_tpu.fusion.dtu_eval import reduce_points
    pts = np.random.RandomState(3).rand(2000, 3) * 10
    a = reduce_points(pts)
    b = reduce_points(pts)
    np.testing.assert_array_equal(a, b)


def test_rm_color_cli(tmp_path):
    from rcmvsnet_tpu.cli import rm_color
    xyz = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    rgb = (np.random.RandomState(1).rand(50, 3) * 255).astype(np.uint8)
    save_ply(tmp_path / "cloud.ply", xyz, rgb)
    rm_color.main(["--input_dir", str(tmp_path)])
    xyz2, rgb2 = load_ply(tmp_path / "no_color" / "cloud.ply")
    np.testing.assert_array_equal(xyz2, xyz)
    assert rgb2 is None


def test_sample_cams_matches_getitem(synthetic_scan):
    """sample_cams (the image-decode-free probe path) must reproduce
    __getitem__'s proj_matrices/depth_values exactly — the kernel
    band-coverage probe runs on these cams for every view."""
    import numpy as np
    from rcmvsnet_tpu.data.dtu_test import DTUTestDataset

    testpath, _ = synthetic_scan
    ds = DTUTestDataset(testpath, ["scan1"], nviews=4, ndepths=64,
                        max_h=128, max_w=160)
    for i in range(len(ds)):
        full, cams = ds[i], ds.sample_cams(i)
        for k in ("stage1", "stage2", "stage3"):
            np.testing.assert_allclose(cams["proj_matrices"][k],
                                       full["proj_matrices"][k], rtol=1e-6)
        np.testing.assert_allclose(cams["depth_values"],
                                   full["depth_values"])
        assert tuple(cams["hw"]) == full["imgs"].shape[1:3]
