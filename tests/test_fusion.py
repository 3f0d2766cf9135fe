"""Fusion + DTU-metric integration on exact synthetic geometry."""
import numpy as np

from rcmvsnet_tpu.data.synthetic import make_synthetic_views
from rcmvsnet_tpu.fusion.fuse import filter_depth_views, check_geometric_consistency
from rcmvsnet_tpu.fusion.dtu_eval import dtu_point_compare, reduce_points, nn_distances


def test_geometric_consistency_perfect_depths():
    s = make_synthetic_views(H=48, W=64, V=3, depth0=600.0, seed=0)
    K, E, D = s["intrinsics"], s["extrinsics"], s["depths"]
    mask, depth_reproj, _, _ = check_geometric_consistency(
        D[0], K, E[0], D[1], K, E[1], img_dist_thresh=0.5, depth_thresh=0.01)
    # exact geometry: nearly all pixels consistent (borders may miss)
    assert mask.mean() > 0.9
    valid = mask
    np.testing.assert_allclose(depth_reproj[valid], D[0][valid], rtol=2e-3)


def test_fuse_rejects_inconsistent_depth():
    s = make_synthetic_views(H=48, W=64, V=3, depth0=600.0, seed=1)
    K, E, D = s["intrinsics"], s["extrinsics"], s["depths"]
    conf = np.full_like(D[0], 0.95)
    img = s["images"][0]

    # consistent sources → most pixels survive
    xyz, col, final_mask, _, _ = filter_depth_views(
        D[0], conf, img, K, E[0], [D[1], D[2]], [K, K], [E[1], E[2]],
        prob_threshold=0.8, num_consistent=2)
    assert final_mask.mean() > 0.8
    # fused points lie on the plane z = 600 + tilt·x (n·X = d)
    n = np.array([-0.08, 0.0, 1.0]); n /= np.linalg.norm(n)
    d = 600.0 * n[2]
    plane_err = np.abs(xyz @ n - d)
    assert np.percentile(plane_err, 95) < 1.0

    # corrupted sources → nothing survives
    xyz2, _, final_mask2, _, _ = filter_depth_views(
        D[0], conf, img, K, E[0], [D[1] * 1.5, D[2] * 0.6], [K, K],
        [E[1], E[2]], prob_threshold=0.8, num_consistent=2)
    assert final_mask2.mean() < 0.05


def test_reduce_points_enforces_min_distance():
    rs = np.random.RandomState(0)
    pts = rs.rand(2000, 3) * 10
    out = reduce_points(pts, dst=1.0, seed=0)
    assert len(out) < len(pts)
    d = nn_distances(out, out, max_dist=60.0)
    # self-distance is 0; check pairwise: second-nearest ≥ dst
    from scipy.spatial import cKDTree
    dd, _ = cKDTree(out).query(out, k=2)
    assert dd[:, 1].min() >= 1.0 - 1e-9


def test_dtu_point_compare_synthetic():
    rs = np.random.RandomState(3)
    gt = rs.rand(5000, 3) * 100
    # perfect reconstruction → acc ≈ comp ≈ small
    noisy = gt + rs.randn(5000, 3) * 0.05
    stats = dtu_point_compare(noisy, gt, dst=0.2, seed=0)
    assert stats["acc_mean"] < 0.2
    assert stats["comp_mean"] < 0.5  # thinning removes some points

    # half-missing reconstruction → comp degrades, acc stays small
    half = noisy[gt[:, 0] < 50]
    stats2 = dtu_point_compare(half, gt, dst=0.2, seed=0)
    assert stats2["acc_mean"] < 0.2
    assert stats2["comp_mean"] > 2.0
