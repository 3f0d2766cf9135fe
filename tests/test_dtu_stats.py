"""matlab_eval tail ports: per-scan variance stats, cross-scan var/median
summary tables (compute_var_median.m), and the BaseEval2Obj .obj exporter.

Parity targets:
  * ComputeStat_web_pt.m:44-61 — per-scan Var/Med over the masked,
    outlier-cut distances (MATLAB var == ddof=1 sample variance)
  * compute_var_median.m:1-9 — varacc/varcomp/varoverall and
    medacc/medcomp/medoverall as means of the per-scan stats
  * BaseEval2Obj_web.m:1-43 — colored `v x y z r g b` obj lines, red→white
    ramp inside mask/above plane, green→blue outside, alpha = min(d,10)/10
"""
import numpy as np
import pytest

from rcmvsnet_tpu.fusion.dtu_eval import (base_eval_to_obj,
                                          dtu_point_compare,
                                          summarize_scan_stats)


def test_point_compare_variance_and_median_hand_computed():
    # colinear clouds with known distances: data = stl shifted per-point
    stl = np.stack([np.arange(6, dtype=np.float64),
                    np.zeros(6), np.zeros(6)], axis=1) * 100.0
    shifts = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 30.0])  # 30 → outlier cut
    data = stl + np.stack([np.zeros(6), shifts, np.zeros(6)], axis=1)
    r = dtu_point_compare(data, stl, dst=0.01)  # dst tiny: no thinning
    kept = shifts[shifts < 20.0]
    # MATLAB var is the ddof=1 sample variance (ComputeStat_web_pt.m:57-58)
    np.testing.assert_allclose(r["acc_mean"], kept.mean(), rtol=1e-12)
    np.testing.assert_allclose(r["acc_var"], kept.var(ddof=1), rtol=1e-12)
    np.testing.assert_allclose(r["acc_median"], np.median(kept), rtol=1e-12)
    np.testing.assert_allclose(r["comp_var"], kept.var(ddof=1), rtol=1e-12)
    assert r["n_data"] == len(kept)


def test_single_point_variance_is_nan_free_guard():
    stl = np.zeros((1, 3))
    data = np.array([[0.0, 1.0, 0.0]])
    r = dtu_point_compare(data, stl, dst=0.01)
    # one sample: MATLAB var([x]) == 0
    assert r["acc_var"] == 0.0 and r["comp_var"] == 0.0


def test_summarize_scan_stats_matches_compute_var_median():
    per_scan = {
        1: {"acc_mean": 0.4, "comp_mean": 0.3, "acc_var": 0.10,
            "comp_var": 0.20, "acc_median": 0.25, "comp_median": 0.15},
        4: {"acc_mean": 0.6, "comp_mean": 0.5, "acc_var": 0.30,
            "comp_var": 0.40, "acc_median": 0.45, "comp_median": 0.35},
    }
    s = summarize_scan_stats(per_scan)
    np.testing.assert_allclose(s["acc"], 0.5)
    np.testing.assert_allclose(s["comp"], 0.4)
    np.testing.assert_allclose(s["overall"], 0.45)
    # compute_var_median.m: varacc = mean(VarData), varoverall = mean of the two
    np.testing.assert_allclose(s["var_acc"], 0.20)
    np.testing.assert_allclose(s["var_comp"], 0.30)
    np.testing.assert_allclose(s["var_overall"], 0.25)
    np.testing.assert_allclose(s["med_acc"], 0.35)
    np.testing.assert_allclose(s["med_comp"], 0.25)
    np.testing.assert_allclose(s["med_overall"], 0.30)


def test_base_eval_to_obj(tmp_path):
    detail = {
        "data_pts": np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
        "d_data": np.array([5.0, 30.0]),       # alpha 0.5, clamped to 1.0
        "data_in_mask": np.array([True, False]),
        "stl_pts": np.array([[7.0, 8.0, 9.0]]),
        "d_stl": np.array([0.0]),              # alpha 0
        "stl_above": np.array([True]),
    }
    data_obj, stl_obj = base_eval_to_obj(detail, "mvsnet", 9, tmp_path)
    lines = data_obj.read_text().strip().splitlines()
    assert len(lines) == 2
    # in-mask, alpha=0.5: red→white ramp → (1, 0.5, 0.5)
    v = lines[0].split()
    assert v[0] == "v"
    np.testing.assert_allclose([float(x) for x in v[1:4]], [1.0, 2.0, 3.0])
    np.testing.assert_allclose([float(x) for x in v[4:7]], [1.0, 0.5, 0.5])
    # outside mask, alpha=1: green→blue ramp → pure green
    v = lines[1].split()
    np.testing.assert_allclose([float(x) for x in v[4:7]], [0.0, 1.0, 0.0])
    # stl side: above plane, alpha=0 → white
    lines = stl_obj.read_text().strip().splitlines()
    assert len(lines) == 1
    v = lines[0].split()
    np.testing.assert_allclose([float(x) for x in v[1:4]], [7.0, 8.0, 9.0])
    np.testing.assert_allclose([float(x) for x in v[4:7]], [1.0, 1.0, 1.0])
    # filenames follow BaseEval2Obj_web.m (sans its stray space)
    assert data_obj.name == "mvsnet2Stl_9.obj"
    assert stl_obj.name == "Stl2mvsnet_9.obj"


def test_point_compare_detail_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    stl = rs.rand(50, 3) * 10
    data = stl + rs.randn(50, 3) * 0.01
    r = dtu_point_compare(data, stl, dst=0.0001, return_detail=True)
    d = r["detail"]
    assert d["data_pts"].shape[0] == d["d_data"].shape[0] == \
        d["data_in_mask"].shape[0]
    assert d["stl_pts"].shape[0] == d["d_stl"].shape[0] == \
        d["stl_above"].shape[0]
    base_eval_to_obj(d, "m", 1, tmp_path)
