"""Cascade eval fast-path flags (Pallas warp + bf16) vs the default path —
interpret mode on CPU, guarding the TPU-only configuration."""
from unittest import mock

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

from rcmvsnet_tpu.models.cascade import CascadeMVSNet
from rcmvsnet_tpu.ops import (pallas_conv3d, pallas_costreg,
                              pallas_costreg_train, pallas_resample,
                              pallas_tail, pallas_warp, pallas_warp2,
                              pallas_warp_train, pallas_warp_volume)
from tests.test_models import _dtu_like_inputs


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    for mod in (pallas_warp, pallas_warp2, pallas_conv3d, pallas_costreg,
                pallas_resample, pallas_tail, pallas_warp_train,
                pallas_warp_volume, pallas_costreg_train):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)


def test_fused_fast_path_matches_default_path():
    """The production TPU eval configuration — fully fused planes-mode
    warp2 + lanes costreg + planes tail, exactly the gate models/cascade.py
    takes on the drivers' shapes — vs the XLA base path, in interpret mode.
    (The v1 banded warp in ops/pallas_warp.py is no longer reachable from
    the cascade; it stays covered op-level in tests/test_pallas_warp.py.)"""
    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))

    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=False)
    ref = base.apply(variables, *args, train=False)

    # coverage precondition holds for the translation-dominant test rig
    for stage, sc in [("stage1", 4), ("stage2", 2), ("stage3", 1)]:
        assert pallas_warp2.check_group_coverage(
            projs[stage], depth_values, 64 // sc, 64 // sc, 4, 8), stage

    fast = CascadeMVSNet(ndepths=(8, 8, 8),
                         pallas_warp_max_bytes=32 * 1024 * 1024,
                         pallas_warp_rows=4, pallas_warp_band=8,
                         pallas_costreg=True, pallas_tail=True)
    out = fast.apply(variables, *args, train=False)

    # bf16 kernel compute ⇒ loose-ish but meaningful depth agreement
    for key in ("stage1", "stage2", "stage3"):
        d_ref = np.asarray(ref[key]["depth"])
        d_out = np.asarray(out[key]["depth"])
        rel = np.abs(d_ref - d_out) / np.abs(d_ref).clip(1e-6)
        assert rel.max() < 5e-2, (key, rel.max())
        assert rel.mean() < 5e-3, (key, rel.mean())
    c_ref = np.asarray(ref["photometric_confidence"])
    c_out = np.asarray(out["photometric_confidence"])
    assert np.abs(c_ref - c_out).mean() < 2e-2


def test_pallas_costreg_matches_xla_costreg():
    """pallas_costreg routes every CostRegNet conv through the channel-major
    kernel with the SAME params; f32 inputs keep HIGHEST precision, so the
    whole cascade must agree tightly with the XLA-conv path."""
    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))

    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=False)
    ref = base.apply(variables, *args, train=False)

    fast = CascadeMVSNet(ndepths=(8, 8, 8), pallas_costreg=True)
    out = fast.apply(variables, *args, train=False)

    for key in ("stage1", "stage2", "stage3"):
        d_ref = np.asarray(ref[key]["depth"])
        d_out = np.asarray(out[key]["depth"])
        np.testing.assert_allclose(d_out, d_ref, rtol=1e-4, atol=1e-3,
                                   err_msg=key)
        c_ref = np.asarray(ref[key]["photometric_confidence"])
        c_out = np.asarray(out[key]["photometric_confidence"])
        np.testing.assert_allclose(c_out, c_ref, rtol=1e-3, atol=1e-3,
                                   err_msg=key)


def test_eval_dtype_bf16_close_to_f32():
    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))
    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=False)
    ref = base.apply(variables, *args, train=False)
    bf16 = CascadeMVSNet(ndepths=(8, 8, 8), eval_dtype="bfloat16")
    out = bf16.apply(variables, *args, train=False)
    d_ref = np.asarray(ref["depth"])
    d_out = np.asarray(out["depth"])
    rel = np.abs(d_ref - d_out) / np.abs(d_ref).clip(1e-6)
    # bf16 features through softmax-weighted regression: small depth shift
    assert rel.mean() < 1e-2


def test_fused_train_volume_path_matches_xla():
    """The production TRAIN configuration with return_volume=True — the
    custom-VJP fused warp kernels on every stage, including the volume
    variant (ops/pallas_warp_volume.py) on stage 1 — must reproduce the
    XLA train path's outputs, volume feature, AND parameter gradients
    (f32 kernel compute ⇒ tight tolerances)."""
    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))

    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=True,
                          return_volume=True)
    fast = CascadeMVSNet(ndepths=(8, 8, 8),
                         pallas_warp_max_bytes=32 * 1024 * 1024,
                         pallas_warp_rows=4, pallas_warp_band=8,
                         pallas_warp_train=True)

    def run(model):
        (out, vol), _ = model.apply(variables, *args, train=True,
                                    return_volume=True,
                                    mutable=["batch_stats"])
        return out, vol

    ref_out, ref_vol = run(base)
    out, vol = run(fast)
    assert "warp_violations" in out, "fused train path not taken"
    assert int(np.asarray(out["warp_violations"]).sum()) == 0
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               rtol=1e-4, atol=1e-4)
    for key in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(np.asarray(out[key]["depth"]),
                                   np.asarray(ref_out[key]["depth"]),
                                   rtol=1e-4, atol=1e-3, err_msg=key)

    def loss(params, model):
        (out, vol), _ = model.apply(
            {**variables, "params": params}, *args, train=True,
            return_volume=True, mutable=["batch_stats"])
        return (sum(jnp.mean(out[k]["depth"]) for k in
                    ("stage1", "stage2", "stage3"))
                + 1e-3 * jnp.mean(vol * vol))

    g_ref = jax.grad(loss)(variables["params"], base)
    g_fast = jax.grad(loss)(variables["params"], fast)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fast)
    scale = np.abs(np.asarray(flat_r)).max()
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               rtol=2e-3, atol=2e-4 * max(scale, 1.0))


def test_lanes_costreg_train_path_matches_xla():
    """The FULL production train fast path — fused custom-VJP warp kernels
    feeding the per-stage CostRegNets through the differentiable lanes
    U-Net (pallas_costreg_train=True), the lanes-resident variance never
    converted to NDHWC — must reproduce the XLA train path's outputs,
    parameter gradients, and BN running-stat updates."""
    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))

    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=True,
                          return_volume=True)
    fast = CascadeMVSNet(ndepths=(8, 8, 8),
                         pallas_warp_max_bytes=32 * 1024 * 1024,
                         pallas_warp_rows=4, pallas_warp_band=8,
                         pallas_warp_train=True,
                         pallas_costreg_train=True)

    def run(model):
        (out, vol), mut = model.apply(variables, *args, train=True,
                                      return_volume=True,
                                      mutable=["batch_stats"])
        return out, vol, mut["batch_stats"]

    ref_out, ref_vol, ref_bs = run(base)
    out, vol, bs = run(fast)
    assert "warp_violations" in out, "fused train path not taken"
    assert int(np.asarray(out["warp_violations"]).sum()) == 0
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               rtol=1e-4, atol=1e-4)
    for key in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(np.asarray(out[key]["depth"]),
                                   np.asarray(ref_out[key]["depth"]),
                                   rtol=1e-4, atol=1e-3, err_msg=key)
    flat_bs_r, _ = jax.flatten_util.ravel_pytree(ref_bs)
    flat_bs_f, _ = jax.flatten_util.ravel_pytree(bs)
    np.testing.assert_allclose(np.asarray(flat_bs_f), np.asarray(flat_bs_r),
                               rtol=1e-4, atol=1e-5)

    def loss(params, model):
        (out, vol), _ = model.apply(
            {**variables, "params": params}, *args, train=True,
            return_volume=True, mutable=["batch_stats"])
        return (sum(jnp.mean(out[k]["depth"]) for k in
                    ("stage1", "stage2", "stage3"))
                + 1e-3 * jnp.mean(vol * vol))

    g_ref = jax.grad(loss)(variables["params"], base)
    g_fast = jax.grad(loss)(variables["params"], fast)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fast)
    scale = np.abs(np.asarray(flat_r)).max()
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               rtol=2e-3, atol=2e-4 * max(scale, 1.0))


def test_fused_cascade_surfaces_runtime_violations():
    """End-to-end runtime detection: a cascade configured with a band that
    does NOT cover the geometry (the failure mode the >64-view probe
    heuristic could in principle miss) must surface a nonzero
    outputs['warp_violations'], and the driver check must fail loudly —
    never the silent zero-tap corruption of rounds 1-2."""
    from rcmvsnet_tpu.cli.eval_dtu import raise_on_warp_violations

    imgs, projs, depth_values = _dtu_like_inputs(B=1, V=3, H=64, W=64,
                                                 ndepth=32)
    args = (jnp.asarray(imgs),
            jax.tree_util.tree_map(jnp.asarray, projs),
            jnp.asarray(depth_values))
    base = CascadeMVSNet(ndepths=(8, 8, 8))
    variables = base.init(jax.random.PRNGKey(0), *args, train=False)

    # the good config reports zero and the driver check passes
    good = CascadeMVSNet(ndepths=(8, 8, 8),
                         pallas_warp_max_bytes=32 * 1024 * 1024,
                         pallas_warp_rows=4, pallas_warp_band=8,
                         pallas_costreg=True, pallas_tail=True)
    out = good.apply(variables, *args, train=False)
    assert int(np.asarray(out["warp_violations"]).sum()) == 0
    raise_on_warp_violations(out, "good")         # no raise

    # band=2 violates coverage for this rig (asserted op-level in
    # tests/test_pallas_warp2.py) → counted and raised
    bad = CascadeMVSNet(ndepths=(8, 8, 8),
                        pallas_warp_max_bytes=32 * 1024 * 1024,
                        pallas_warp_rows=4, pallas_warp_band=2,
                        pallas_costreg=True, pallas_tail=True)
    out = bad.apply(variables, *args, train=False)
    assert int(np.asarray(out["warp_violations"]).sum()) > 0
    with pytest.raises(RuntimeError, match="band-coverage violation"):
        raise_on_warp_violations(out, "bad")

    # absent key (XLA path) is a no-op
    raise_on_warp_violations({"depth": None}, "xla")
