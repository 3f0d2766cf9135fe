"""Whole-cascade value parity vs the REFERENCE torch model.

Round-1 parity tests were per-layer (tests/test_layers.py) or vs literal
ports (tests/test_warp.py); this runs the reference's own
CascadeMVSNet_eval (/root/reference/models/casmvsnet.py:313-417) end to
end with randomized weights+BN stats, converts its checkpoint with
train/convert.py, and asserts OUR cascade forward reproduces the final
depth and photometric-confidence maps value-for-value — covering the
composition (FPN → warp → variance → 3D U-Net → softmax → soft-argmax →
window-4 confidence → inter-stage windowing) and the converter in one go.

The torch oracle runs in a subprocess: torch CPU kernels on this host can
SIGBUS under some allocation patterns (flaky host paging); a dead oracle
skips the test instead of killing pytest.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HELPER = Path(__file__).with_name("_ref_cascade_oracle.py")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cascade_oracle")
    ckpt = tmp / "ref_cas.ckpt"
    proc = subprocess.run(
        [sys.executable, str(HELPER), str(tmp), str(ckpt)],
        capture_output=True, text=True, timeout=900)
    if proc.returncode != 0 or not (tmp / "depth.npy").exists():
        pytest.skip("torch reference oracle subprocess failed "
                    f"(rc={proc.returncode}; flaky-host SIGBUS?): "
                    f"{proc.stderr[-300:]}")
    arrays = {name: np.load(tmp / f"{name}.npy")
              for name in ("depth", "conf", "s1_depth", "s2_depth",
                           "train_depth", "train_volume")}
    return arrays, ckpt


def _our_forward(ckpt, return_volume=False, train=False):
    from rcmvsnet_tpu.cli.eval_dtu import load_variables
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
    from rcmvsnet_tpu.models.cascade import CascadeMVSNet
    from tests._ref_cascade_oracle import (BATCH_SEED, H, NDEPTH, NDEPTHS,
                                           RATIOS, W)

    batch = make_synthetic_batch(B=1, V=3, H=H, W=W, ndepth=NDEPTH,
                                 seed=BATCH_SEED)
    cascade = CascadeMVSNet(ndepths=tuple(NDEPTHS),
                            depth_intervals_ratio=tuple(RATIOS))
    sample = {"imgs": batch["imgs"][0],
              "proj_matrices": {k: v[0]
                                for k, v in batch["proj_matrices"].items()},
              "depth_values": batch["depth_values"][0]}
    variables = load_variables(cascade, str(ckpt), sample)
    imgs = jnp.asarray(batch["imgs"])
    projs = jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"])
    dv = jnp.asarray(batch["depth_values"])
    if train:
        out, _ = cascade.apply(variables, imgs, projs, dv, train=True,
                               return_volume=return_volume,
                               mutable=["batch_stats"])
        return out
    return cascade.apply(variables, imgs, projs, dv, train=False,
                         return_volume=return_volume)


def test_cascade_matches_reference(oracle):
    ref, ckpt = oracle
    ours = jax.tree_util.tree_map(np.asarray, _our_forward(ckpt))

    # Stage-1 first: errors compound through the cascade, so a stage-1
    # mismatch localizes the bug to features/warp/costreg rather than
    # the inter-stage windowing.
    np.testing.assert_allclose(ours["stage1"]["depth"], ref["s1_depth"],
                               rtol=0, atol=0.2)
    np.testing.assert_allclose(ours["stage2"]["depth"], ref["s2_depth"],
                               rtol=0, atol=0.2)
    # Final depth: scene depth spans ~[480, 750] mm-scale units; 0.2 is
    # ~0.07% of the range and far below the stage-3 hypothesis spacing.
    np.testing.assert_allclose(ours["depth"], ref["depth"], rtol=0, atol=0.2)
    assert float(np.abs(ours["depth"] - ref["depth"]).mean()) < 0.02
    np.testing.assert_allclose(ours["photometric_confidence"], ref["conf"],
                               rtol=0, atol=5e-3)


def test_train_graph_matches_reference(oracle):
    """The reference TRAIN cascade in .train() mode (clean no-ref
    accumulators; BN pinned to running stats — see the helper) vs ours
    with return_volume: covers the raw-image warps and the stage-1
    volume_feature_no_ref layout [B, 3(V-1)+C, D, h, w] → ours
    [B, D, h, w, 3(V-1)+C] that the rendering branch consumes
    (casmvsnet.py:58-102,231), including the divide-by-V (not V-1)
    no-ref variance quirk."""
    ref, ckpt = oracle
    outputs, volume = _our_forward(ckpt, return_volume=True)
    depth = np.asarray(outputs["depth"])
    volume = np.asarray(volume)

    np.testing.assert_allclose(depth, ref["train_depth"], rtol=0, atol=0.2)
    ref_vol = np.transpose(ref["train_volume"], (0, 2, 3, 4, 1))
    assert volume.shape == ref_vol.shape
    np.testing.assert_allclose(volume, ref_vol, rtol=0, atol=2e-3)
