"""grid-sample / resize parity vs torch (CPU, test-only oracle)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from rcmvsnet_tpu.ops import sampling


RS = np.random.RandomState(0)


def _rand(*shape):
    return RS.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(padding):
    B, H, W, C = 2, 13, 17, 5
    img = _rand(B, H, W, C)
    # coords straddling in/out of range
    grid = (RS.rand(B, 9, 11, 2).astype(np.float32) * 3.0 - 1.5)

    ours = sampling.grid_sample_2d(
        jnp.asarray(img), jnp.asarray(grid[..., 0]), jnp.asarray(grid[..., 1]),
        padding_mode=padding)

    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(padding):
    B, D, H, W, C = 2, 6, 9, 11, 4
    vol = _rand(B, D, H, W, C)
    grid = (RS.rand(B, 5, 7, 3, 3).astype(np.float32) * 2.6 - 1.3)

    ours = sampling.grid_sample_3d(
        jnp.asarray(vol), jnp.asarray(grid[..., 0]), jnp.asarray(grid[..., 1]),
        jnp.asarray(grid[..., 2]), padding_mode=padding)

    ref = F.grid_sample(
        torch.from_numpy(vol).permute(0, 4, 1, 2, 3), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=True)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_loss_bilinear_sample_matches_reference_formula():
    """Check against a literal numpy port of losses/homography.py:117-200."""
    B, H, W, C = 2, 10, 12, 3
    img = _rand(B, H, W, C)
    px = (RS.rand(B, 8, 9).astype(np.float32) * 2.8 - 1.4)
    py = (RS.rand(B, 8, 9).astype(np.float32) * 2.8 - 1.4)

    out, mask = sampling.loss_bilinear_sample(
        jnp.asarray(img), jnp.asarray(px), jnp.asarray(py))

    x = (px.reshape(B, -1) + 1.0) * (W - 1.0) / 2.0
    y = (py.reshape(B, -1) + 1.0) * (H - 1.0) / 2.0
    x0 = np.floor(x).astype(int); x1 = x0 + 1
    y0 = np.floor(y).astype(int); y1 = y0 + 1
    m = ((x0 >= 0) & (x1 <= W - 1) & (y0 >= 0) & (y0 <= H - 1)).astype(np.float32)
    x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x1, 0, W - 1)
    y0c, y1c = np.clip(y0, 0, H - 1), np.clip(y1, 0, H - 1)
    exp = np.zeros((B, x.shape[1], C), np.float32)
    for b in range(B):
        pa = img[b][y0c[b], x0c[b]]
        pb = img[b][y1c[b], x0c[b]]
        pc = img[b][y0c[b], x1c[b]]
        pd = img[b][y1c[b], x1c[b]]
        wa = ((x1[b] - x[b]) * (y1[b] - y[b]))[:, None]
        wb = ((x1[b] - x[b]) * (1 - (y1[b] - y[b])))[:, None]
        wc = ((1 - (x1[b] - x[b])) * (y1[b] - y[b]))[:, None]
        wd = ((1 - (x1[b] - x[b])) * (1 - (y1[b] - y[b])))[:, None]
        exp[b] = wa * pa + wb * pb + wc * pc + wd * pd
    np.testing.assert_allclose(np.asarray(out).reshape(B, -1, C), exp, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask).reshape(B, -1), m)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(7, 9), (26, 34), (13, 34)])
def test_resize_bilinear_matches_torch(align, size):
    B, H, W, C = 2, 13, 17, 3
    img = _rand(B, H, W, C)
    ours = sampling.resize_bilinear(jnp.asarray(img), *size, align_corners=align)
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
                        mode="bilinear", align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("size", [(3, 4), (26, 34), (13, 5)])
def test_resize_nearest_matches_torch(size):
    B, H, W, C = 2, 13, 17, 3
    img = _rand(B, H, W, C)
    ours = sampling.resize_nearest(jnp.asarray(img), *size)
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
                        mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy())


@pytest.mark.parametrize("align", [False, True])
def test_resize_trilinear_matches_torch(align):
    B, D, H, W, C = 1, 5, 9, 11, 2
    vol = _rand(B, D, H, W, C)
    size = (11, 5, 16)
    ours = sampling.resize_trilinear(jnp.asarray(vol), *size, align_corners=align)
    ref = F.interpolate(torch.from_numpy(vol).permute(0, 4, 1, 2, 3), size=size,
                        mode="trilinear", align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 4, 1).numpy(),
                               atol=1e-5)
