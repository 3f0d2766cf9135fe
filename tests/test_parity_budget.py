"""Split-tolerance quality budgets (VERDICT r4 next-step #7).

The e2e quality canaries (test_e2e_quality*.py) allow 15% rtol — sized for
CPU/XLA version drift of an absolute metric, far looser than what the
fused-bf16 TPU path is allowed to cost. The fused-path budget is enforced
here against the committed on-chip measurement (PARITY_data.json, written
by scripts/parity_study.py): every recorded resolution/view config must
keep its fused-vs-XLA-f32 deltas inside the north-star budgets, so a
kernel regression re-measured on the chip cannot hide inside the canary's
drift allowance.

Budgets: DTU-overall relative delta < 1% (BASELINE.json north star);
per-pixel rel-depth deltas above the fusion protocol's own 0.01 gate
< 0.1% of pixels; fusion mask flip rate < 0.1%.
"""
import json
from pathlib import Path

import pytest

DATA = Path(__file__).resolve().parent.parent / "PARITY_data.json"


@pytest.mark.skipif(not DATA.exists(), reason="no committed parity study")
def test_fused_path_budgets():
    entries = json.loads(DATA.read_text())
    assert entries, "PARITY_data.json is empty"
    for e in entries:
        tag = f"{e['resolution']}@V{e.get('views', 5)}"
        assert abs(e["overall_rel_delta"]) < 0.01, (tag, e["overall_rel_delta"])
        assert e["depth_rel_delta"]["frac_above_fusion_gate_0.01"] < 1e-3, tag
        assert e["fusion_mask_flip_rate"] < 1e-3, tag
        # the fused run must have kept its kernel preconditions (the study
        # asserts zero band violations before recording)
        assert e["fused_config"]["max_bytes"] > 0, tag


@pytest.mark.skipif(not DATA.exists(), reason="no committed parity study")
def test_protocol_coverage():
    """Both protocol geometries must stay measured: the DTU north-star
    resolution and the Tanks&Temples 1920×1056 7-view config."""
    entries = json.loads(DATA.read_text())
    seen = {(e["resolution"], e.get("views", 5)) for e in entries}
    assert ("1152x864", 5) in seen, seen
    assert ("1920x1056", 7) in seen, seen
