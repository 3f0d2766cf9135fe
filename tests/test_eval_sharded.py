"""Sharded (multi-device) eval forward: shard_map over an 8-device CPU
mesh must reproduce the single-device per-view results exactly.

TPU-native replacement for the reference's nn.DataParallel inference
(/root/reference/eval_rcmvsnet_dtu.py:189): one reference view per device,
no collectives, identical per-device math.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.cli.eval_dtu import build_forward, build_model
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch


def _args(**kw):
    ns = argparse.Namespace(
        ndepths="8,8,8", depth_inter_r="4,2,1", cr_base_chs="8,8,8",
        no_pallas=True, n_devices=8)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_sharded_forward_matches_per_view():
    S = 8
    assert jax.device_count() >= S
    args = _args()
    H, W, V, D = 64, 128, 3, 24

    # S distinct single-view samples (vary the seed → different images)
    batches = [make_synthetic_batch(B=1, V=V, H=H, W=W, ndepth=D, seed=s)
               for s in range(S)]
    sample0 = {
        "imgs": batches[0]["imgs"][0],
        "proj_matrices": {k: v[0]
                          for k, v in batches[0]["proj_matrices"].items()},
        "depth_values": batches[0]["depth_values"][0],
    }
    cascade = build_model(args)
    variables = cascade.init(
        jax.random.PRNGKey(0), jnp.asarray(batches[0]["imgs"]),
        jax.tree_util.tree_map(jnp.asarray, batches[0]["proj_matrices"]),
        jnp.asarray(batches[0]["depth_values"]), train=False)

    imgs = jnp.asarray(np.concatenate([b["imgs"] for b in batches]))
    projs = {k: jnp.asarray(
        np.concatenate([b["proj_matrices"][k] for b in batches]))
        for k in batches[0]["proj_matrices"]}
    dv = jnp.asarray(np.concatenate([b["depth_values"] for b in batches]))

    fwd_sharded = build_forward(cascade, args, sample0, n_shards=S)
    out_s = fwd_sharded(variables, imgs, projs, dv)

    fwd_single = build_forward(cascade, args, sample0, n_shards=1)
    for s in range(S):
        ref = fwd_single(
            variables, imgs[s:s + 1],
            {k: v[s:s + 1] for k, v in projs.items()}, dv[s:s + 1])
        np.testing.assert_allclose(
            np.asarray(out_s["depth"][s]), np.asarray(ref["depth"][0]),
            rtol=2e-5, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out_s["photometric_confidence"][s]),
            np.asarray(ref["photometric_confidence"][0]),
            rtol=2e-5, atol=2e-3)
