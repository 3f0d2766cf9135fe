"""Assert the T&T per-scene fusion hyperparameter tables equal the
reference's, by mechanically extracting the dict literals from
/root/reference/eval_rcmvsnet_tanks.py (":400-440 intermediate,
:460-491 advanced) with ast — no hand transcription in the oracle.

Round-1 shipped mis-transcribed tables (VERDICT.md weak #3); this test
makes that class of error impossible to reintroduce.
"""
from __future__ import annotations

import ast
from pathlib import Path

import pytest

from rcmvsnet_tpu.cli.eval_tanks import (GEO_DEPTH_THRESHOLD,
                                         GEO_MASK_THRESHOLD,
                                         GEO_PIXEL_THRESHOLD, IMAGE_SIZES,
                                         PHOTO_THRESHOLD)

REF = Path("/root/reference/eval_rcmvsnet_tanks.py")


def _extract_reference_tables():
    """Collect every {'Family': ...}-style dict assignment in the reference
    eval script, merging the intermediate and advanced splits per name."""
    tree = ast.parse(REF.read_text())
    tables: dict[str, dict] = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and isinstance(node.value, ast.Dict)):
            continue
        name = node.targets[0].id
        if name not in ("photo_thres", "geo_mask_thres", "geo_pixel_thres",
                        "geo_depth_thres", "image_sizes"):
            continue
        d = ast.literal_eval(node.value)
        tables.setdefault(name, {}).update(d)
    return tables


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_tanks_tables_match_reference():
    ref = _extract_reference_tables()
    assert PHOTO_THRESHOLD == ref["photo_thres"]
    assert GEO_MASK_THRESHOLD == ref["geo_mask_thres"]
    assert GEO_PIXEL_THRESHOLD == ref["geo_pixel_thres"]
    assert GEO_DEPTH_THRESHOLD == ref["geo_depth_thres"]
    assert IMAGE_SIZES == ref["image_sizes"]
    # both splits present: 8 intermediate + 6 advanced scenes
    assert len(PHOTO_THRESHOLD) == 14
