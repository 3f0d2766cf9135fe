"""Fast (Pallas conv + BN-fold) FeatureNet vs the Flax module — exact
math, different schedule; interpret mode on CPU. Oracle:
FeatureNet.apply(train=False), itself torch-parity-tested in
tests/test_layers.py / test_models.py."""
import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.nn.featurenet import FeatureNet
from rcmvsnet_tpu.nn.featurenet_fast import (featurenet_packed,
                                             pack_featurenet,
                                             packed_shapes_ok)


def _random_variables(rng, module, x):
    variables = module.init(jax.random.PRNGKey(0), x, False)
    # randomize BN running stats so the eval fold is actually exercised
    def jitter(path, leaf):
        name = "/".join(str(p) for p in path)
        r = rng.standard_normal(leaf.shape).astype(np.float32)
        if name.endswith("var"):
            return jnp.asarray(np.abs(r) + 0.5)
        return jnp.asarray(r * 0.3)
    stats = jax.tree_util.tree_map_with_path(
        lambda p, l: jitter([getattr(k, "key", k) for k in p], l),
        variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


def test_packed_matches_flax():
    rng = np.random.default_rng(7)
    H, W = 32, 48
    assert packed_shapes_ok(H, W)
    x = jnp.asarray(rng.standard_normal((2, H, W, 3)).astype(np.float32))
    fnet = FeatureNet(8, 3)
    variables = _random_variables(rng, fnet, x)
    want = fnet.apply(variables, x, False)
    packed = pack_featurenet(variables["params"], variables["batch_stats"],
                             dtype=jnp.float32)
    got = featurenet_packed(packed, x, interpret=True)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_packed_shapes_gate():
    assert packed_shapes_ok(864, 1152)
    assert packed_shapes_ok(128, 160)
    assert not packed_shapes_ok(126, 160)
    assert not packed_shapes_ok(128, 150)


def test_warp_layout_matches_nhwc():
    """out_layout='warp' must hold exactly the NHWC features rearranged
    to the warp kernel's row-major source layout."""
    rng = np.random.default_rng(11)
    H, W = 32, 48
    x = jnp.asarray(rng.standard_normal((2, H, W, 3)).astype(np.float32))
    fnet = FeatureNet(8, 3)
    variables = _random_variables(rng, fnet, x)
    packed = pack_featurenet(variables["params"], variables["batch_stats"],
                             dtype=jnp.float32)
    nhwc = featurenet_packed(packed, x, interpret=True)
    warp = featurenet_packed(packed, x, out_layout="warp", interpret=True)
    for stage in ("stage1", "stage2", "stage3"):
        src2d, (V, hm, row0, C, w_pad) = warp[stage]
        ref = np.asarray(nhwc[stage])          # [N, h, w, C]
        N, h, w, _ = ref.shape
        got = np.asarray(src2d)
        assert got.shape[1] == w_pad and w_pad >= w
        for v in range(V):
            block = got[(v * hm + row0) * C:(v * hm + row0 + h) * C]
            block = block.reshape(h, C, w_pad)
            np.testing.assert_allclose(
                np.transpose(block[:, :, :w], (0, 2, 1)), ref[v],
                rtol=1e-4, atol=1e-4, err_msg=f"{stage} v{v}")
            assert np.all(block[:, :, w:] == 0)
