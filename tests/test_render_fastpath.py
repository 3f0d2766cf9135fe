"""Ray-major neural-volume lookup vs the per-sample trilinear gather.

index_point_feature_rays (render/rays.py) exploits that reference-camera
rays project to a fixed ref pixel, replacing the per-(ray, sample) 8-tap
gather (whose scatter VJP dominated the round-5 train profile) with 4
per-ray row gathers + an MXU z-hat contraction. These tests pin:

  * exactness when the per-sample (x, y) NDC coordinates are exactly
    constant along each ray (the mathematical case);
  * agreement on REAL sample_rays geometry (where (x, y) wobbles by ~1 ulp
    of the projection arithmetic) for values and volume gradients;
  * zeros-padding semantics for out-of-range x/y/z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
from rcmvsnet_tpu.render.rays import (index_point_feature,
                                      index_point_feature_rays, sample_rays)

D, H, W, C = 16, 24, 20, 8


def _volume(seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(D, H, W, C).astype(np.float32))


def test_exact_when_xy_constant():
    rs = np.random.RandomState(1)
    N, S = 64, 32
    ndc = np.empty((N, S, 3), np.float32)
    ndc[..., 0] = rs.uniform(-0.1, 1.1, (N, 1))  # constant per ray, some OOB
    ndc[..., 1] = rs.uniform(-0.1, 1.1, (N, 1))
    ndc[..., 2] = np.sort(rs.uniform(-0.1, 1.1, (N, S)), axis=-1)
    vol = _volume()
    ref = index_point_feature(vol, jnp.asarray(ndc))
    fast = index_point_feature_rays(vol, jnp.asarray(ndc))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_real_ray_geometry_values_and_grads():
    batch = make_synthetic_batch(B=1, V=3, H=64, W=64, ndepth=8, seed=3)
    rays = sample_rays(
        jax.random.PRNGKey(7),
        jnp.asarray(batch["imgs"][0]),
        jnp.asarray(batch["depths_h"][0, 0]),
        jnp.asarray(batch["w2cs"][0]), jnp.asarray(batch["c2ws"][0]),
        jnp.asarray(batch["intrinsics"][0]),
        jnp.asarray(batch["near_fars"][0]),
        n_rays=128, n_samples=24)
    vol = _volume(2)
    ref = np.asarray(index_point_feature(vol, rays.ndc))
    fast = np.asarray(index_point_feature_rays(vol, rays.ndc))
    # (x, y) per sample agree to ~1 ulp of the projection; a tap can only
    # flip where its weight crosses 0, so values agree tightly
    np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)

    cot = jnp.asarray(np.random.RandomState(5).randn(*ref.shape)
                      .astype(np.float32))
    g_ref = jax.grad(lambda v: jnp.vdot(index_point_feature(v, rays.ndc),
                                        cot))(vol)
    g_fast = jax.grad(
        lambda v: jnp.vdot(index_point_feature_rays(v, rays.ndc), cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_out_of_range_zeroed():
    vol = _volume(4)
    ndc = np.zeros((4, 6, 3), np.float32)
    ndc[0, :, :] = [-0.5, 0.5, 0.5]   # x fully out (grid < -1)
    ndc[1, :, :] = [0.5, 1.5, 0.5]    # y fully out
    ndc[2, :, :] = [0.5, 0.5, 2.0]    # z fully out
    ndc[3, :, :] = [0.5, 0.5, 0.5]    # in range
    out = np.asarray(index_point_feature_rays(vol, jnp.asarray(ndc)))
    assert np.all(out[:3] == 0.0)
    assert np.abs(out[3]).max() > 0
    ref = np.asarray(index_point_feature(vol, jnp.asarray(ndc)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
