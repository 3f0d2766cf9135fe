"""Native C++ kernels vs scipy/numpy oracles."""
import numpy as np
import pytest

from rcmvsnet_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library failed to build")
    return lib


def test_nn_distances_matches_scipy(lib):
    rs = np.random.RandomState(0)
    ref = rs.rand(3000, 3) * 50
    query = rs.rand(1000, 3) * 60  # some points beyond the cap
    got = native.nn_distances(query, ref, max_dist=5.0)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(ref).query(query, k=1, distance_upper_bound=5.0)
    d[~np.isfinite(d)] = 5.0
    np.testing.assert_allclose(got, d, atol=1e-9)


def test_reduce_points_matches_python(lib):
    rs = np.random.RandomState(1)
    pts = rs.rand(3000, 3) * 10
    got = native.reduce_points(pts, dst=0.8, seed=7)
    from rcmvsnet_tpu.fusion.dtu_eval import reduce_points as py_reduce
    expected = py_reduce(pts, dst=0.8, seed=7)
    np.testing.assert_array_equal(got, expected)


def test_mesh_supersample_matches_numpy(lib):
    rs = np.random.RandomState(2)
    verts = rs.rand(30, 3) * 10
    tris = rs.randint(0, 30, (20, 3)).astype(np.int32)
    got = native.mesh_supersample(verts, tris, thresh=0.5)
    expected = native._mesh_supersample_numpy(
        np.asarray(verts, np.float64), tris, 0.5)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-9)
    # original vertices are included first
    np.testing.assert_allclose(got[:30], verts, atol=1e-12)
    assert len(got) > 30  # interior points were generated
