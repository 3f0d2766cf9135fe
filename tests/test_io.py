import numpy as np

from rcmvsnet_tpu.core import io


def test_pfm_roundtrip(tmp_path):
    depth = np.random.RandomState(0).rand(37, 53).astype(np.float32) * 900 + 400
    path = tmp_path / "d.pfm"
    io.save_pfm(path, depth)
    loaded, scale = io.read_pfm(path)
    np.testing.assert_array_equal(loaded, depth)
    assert scale == 1.0


def test_pfm_color_roundtrip(tmp_path):
    img = np.random.RandomState(1).rand(16, 24, 3).astype(np.float32)
    path = tmp_path / "c.pfm"
    io.save_pfm(path, img)
    loaded, _ = io.read_pfm(path)
    np.testing.assert_array_equal(loaded, img)


def test_cam_file_roundtrip(tmp_path):
    rs = np.random.RandomState(2)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, :4] = rs.rand(3, 4).astype(np.float32)
    intr = np.array([[1446.16, 0, 326.8], [0, 1443.86, 243.2], [0, 0, 1]],
                    dtype=np.float32)
    path = tmp_path / "cam.txt"
    io.write_cam_file(path, extr, intr, [425.0, 2.5, 192.0, 905.0])
    cam = io.read_cam_file(path)
    np.testing.assert_allclose(cam.extrinsics, extr, rtol=1e-6)
    np.testing.assert_allclose(cam.intrinsics, intr, rtol=1e-6)
    assert cam.depth_min == 425.0
    assert cam.depth_interval == 2.5
    assert cam.num_depth == 192.0
    assert cam.depth_max == 905.0


def test_pair_file_roundtrip(tmp_path):
    pairs = [(0, [10, 2, 9]), (1, [0, 3]), (48, [47])]
    path = tmp_path / "pair.txt"
    io.write_pair_file(path, pairs)
    assert io.read_pair_file(path) == pairs


def test_ply_roundtrip(tmp_path):
    rs = np.random.RandomState(3)
    xyz = rs.randn(100, 3).astype(np.float32)
    rgb = (rs.rand(100, 3) * 255).astype(np.uint8)
    path = tmp_path / "pc.ply"
    io.save_ply(path, xyz, rgb)
    xyz2, rgb2 = io.load_ply(path)
    np.testing.assert_array_equal(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_ply_no_color(tmp_path):
    xyz = np.random.RandomState(4).randn(10, 3).astype(np.float32)
    path = tmp_path / "pc.ply"
    io.save_ply(path, xyz)
    xyz2, rgb2 = io.load_ply(path)
    np.testing.assert_array_equal(xyz2, xyz)
    assert rgb2 is None
