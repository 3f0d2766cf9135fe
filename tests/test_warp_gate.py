"""Fused-warp VMEM admission gate (ops/pallas_warp2.eval_vmem_bytes).

The eval kernel keeps ALL V source views resident; the per-view
`pallas_warp_max_bytes` budget alone admitted the T&T geometry
(1920×1056, V=7), whose stage-2 sources are 6 × 16.2 MB — a real compile
OOM observed in round 5 (155.8 MB scoped VMEM vs the 128 MB v5e budget).
These pins hold the calibrated gate to the known-good / known-bad
protocol geometries; if the kernel's residency model changes, update
EVAL_VMEM_GATE's calibration comment alongside.
"""
from rcmvsnet_tpu.ops.pallas_warp2 import EVAL_VMEM_GATE, eval_vmem_bytes


def stage_gates(W, H, V, base=8):
    return [eval_vmem_bytes(V, H // sc, W // sc, base * sc) <= EVAL_VMEM_GATE
            for sc in (4, 2, 1)]


def test_dtu_north_star_fully_fused():
    assert stage_gates(1152, 864, 5) == [True, True, True]


def test_train_config_fully_fused():
    assert stage_gates(640, 512, 4) == [True, True, True]


def test_tanks_geometry_mixed_path():
    # stage 1 fused; stages 2/3 must fall back (observed OOM at stage 2)
    assert stage_gates(1920, 1056, 7) == [True, False, False]


def test_dtu_full_res_conservative():
    # 1600×1184 stage 2 estimates just above the calibrated threshold and
    # has never been proven on-chip — conservatively excluded
    assert stage_gates(1600, 1184, 5) == [True, False, False]


def test_monotone_in_views():
    for sc in (4, 2, 1):
        a = eval_vmem_bytes(5, 1056 // sc, 1920 // sc, 8 * sc)
        b = eval_vmem_bytes(7, 1056 // sc, 1920 // sc, 8 * sc)
        assert b > a
