"""End-to-end: synthetic scene in Tanks&Temples layout → eval_tanks CLI
depth phase (sharded loop) → per-view outputs on disk.

Covers the tanks driver's batched save loop and the cams_1/line-11
depth-range convention (/root/reference/eval_rcmvsnet_tanks.py:158-202,
datasets/tanks.py:160-165). Fusion itself is covered by the DTU e2e test
(same fuse_scan); the tanks per-scene thresholds are table-equality
tested in test_tanks_tables.py.
"""
import numpy as np
import pytest

from rcmvsnet_tpu.core.io import write_cam_file, write_pair_file
from rcmvsnet_tpu.data.synthetic import make_synthetic_views


@pytest.fixture(scope="module")
def tanks_scene(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("tanks_data")
    scan_dir = root / "intermediate" / "Family"
    (scan_dir / "images").mkdir(parents=True)
    (scan_dir / "cams_1").mkdir()

    V = 4
    s = make_synthetic_views(H=128, W=160, V=V, depth0=600.0, seed=7,
                             baseline=8.0)
    for v in range(V):
        img = (s["images"][v].clip(0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(scan_dir / "images" / f"{v:08d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        # tanks cams_1 line 11: "depth_min depth_max" — field 2 is the
        # MAX (not an interval), datasets/tanks.py:160-165
        write_cam_file(scan_dir / "cams_1" / f"{v:08d}_cam.txt",
                       s["extrinsics"][v], s["intrinsics"],
                       [s["depth_min"], s["depth_max"]])
    pairs = [(v, [u for u in range(V) if u != v]) for v in range(V)]
    write_pair_file(scan_dir / "pair.txt", pairs)
    return root, s


def test_eval_tanks_cli_depth_phase(tmp_path, tanks_scene, monkeypatch):
    testpath, scene = tanks_scene

    import jax
    import jax.numpy as jnp
    import flax.struct
    from rcmvsnet_tpu.cli import eval_tanks
    from rcmvsnet_tpu.config import Config
    from rcmvsnet_tpu.data import tanks as tanks_data
    from rcmvsnet_tpu.train.checkpoint import export_backbone
    from rcmvsnet_tpu.train.state import make_models

    monkeypatch.setattr(tanks_data, "INTERMEDIATE_SCANS", ["Family"])
    monkeypatch.setattr(eval_tanks, "INTERMEDIATE_SCANS", ["Family"])

    # random-init backbone checkpoint the CLI can load
    cascade, _ = make_models(Config())
    ds = tanks_data.TanksDataset(testpath, "intermediate", nviews=4,
                                 img_wh=(160, 128), ndepths=32)
    assert len(ds) == 4
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

    ckpt = export_backbone(
        str(tmp_path),
        FakeState(step=0,
                  params={"cascade": variables["params"], "render": {}},
                  batch_stats={"cascade": variables["batch_stats"],
                               "render": {}}),
        "backbone.msgpack")

    outdir = tmp_path / "tanks_out"
    eval_tanks.main([
        "--testpath", str(testpath), "--loadckpt", str(ckpt),
        "--outdir", str(outdir), "--split", "intermediate",
        "--num_view", "4", "--numdepth", "32", "--img_wh", "160,128",
        "--no_filter", "--n_devices", "2",
    ])

    from rcmvsnet_tpu.core.io import read_pfm
    for v in range(4):
        depth, _ = read_pfm(outdir / "Family" / "depth_est"
                            / f"{v:08d}.pfm")
        assert depth.shape == (128, 160)
        assert np.isfinite(depth).all()
        lo, hi = scene["depth_min"], scene["depth_max"]
        assert depth.min() >= lo - 1e-3 and depth.max() <= hi + 1e-3
        assert (outdir / "Family" / "confidence" / f"{v:08d}.pfm").exists()
        assert (outdir / "Family" / "cams" / f"{v:08d}_cam.txt").exists()
        assert (outdir / "Family" / "images" / f"{v:08d}.jpg").exists()


def test_tanks_sample_cams_matches_getitem(tanks_scene, monkeypatch):
    """Image-decode-free cams for the per-view kernel coverage probe must
    equal __getitem__'s cameras and depth range."""
    import numpy as np
    from rcmvsnet_tpu.data import tanks as tanks_data
    from rcmvsnet_tpu.data.tanks import TanksDataset

    monkeypatch.setattr(tanks_data, "INTERMEDIATE_SCANS", ["Family"])
    root, _ = tanks_scene
    ds = TanksDataset(root, "intermediate", nviews=4, img_wh=(160, 128),
                      ndepths=48)
    for i in range(len(ds)):
        full, cams = ds[i], ds.sample_cams(i)
        for k in ("stage1", "stage2", "stage3"):
            np.testing.assert_allclose(cams["proj_matrices"][k],
                                       full["proj_matrices"][k], rtol=1e-6)
        np.testing.assert_allclose(cams["depth_values"],
                                   full["depth_values"])
        assert tuple(cams["hw"]) == full["imgs"].shape[1:3]
