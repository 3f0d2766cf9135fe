"""Homography warp parity vs a literal torch port of the reference, plus
geometric invariants (identity warp when src == ref)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rcmvsnet_tpu.core import geometry
from rcmvsnet_tpu.ops import warp


RS = np.random.RandomState(7)


def _torch_homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """Literal port of /root/reference/models/modules.py:304-339 (NCHW)."""
    batch, channels = src_fea.shape[0], src_fea.shape[1]
    num_depth = depth_values.shape[1]
    height, width = src_fea.shape[2], src_fea.shape[3]
    with torch.no_grad():
        proj = torch.matmul(src_proj, torch.inverse(ref_proj))
        rot = proj[:, :3, :3]
        trans = proj[:, :3, 3:4]
        y, x = torch.meshgrid(torch.arange(0, height, dtype=torch.float32),
                              torch.arange(0, width, dtype=torch.float32),
                              indexing="ij")
        y, x = y.reshape(height * width), x.reshape(height * width)
        xyz = torch.stack((x, y, torch.ones_like(x)))
        xyz = xyz.unsqueeze(0).repeat(batch, 1, 1)
        rot_xyz = torch.matmul(rot, xyz)
        rot_depth_xyz = rot_xyz.unsqueeze(2).repeat(1, 1, num_depth, 1) * \
            depth_values.view(batch, 1, num_depth, -1)
        proj_xyz = rot_depth_xyz + trans.view(batch, 3, 1, 1)
        proj_xy = proj_xyz[:, :2] / proj_xyz[:, 2:3]
        proj_x = proj_xy[:, 0] / ((width - 1) / 2) - 1
        proj_y = proj_xy[:, 1] / ((height - 1) / 2) - 1
        grid = torch.stack((proj_x, proj_y), dim=3)
    warped = F.grid_sample(src_fea, grid.view(batch, num_depth * height, width, 2),
                           mode="bilinear", padding_mode="zeros", align_corners=True)
    return warped.view(batch, channels, num_depth, height, width)


def _random_proj(rs, batch):
    """Realistic K-folded projection matrices (small rotation, offset)."""
    projs = []
    for _ in range(batch):
        angle = rs.uniform(-0.1, 0.1, 3)
        cx, cy, cz = np.cos(angle)
        sx, sy, sz = np.sin(angle)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = rx @ ry @ rz
        t = rs.uniform(-20, 20, 3)
        K = np.array([[120.0, 0, 16.0], [0, 118.0, 12.0], [0, 0, 1.0]])
        E = np.eye(4)
        E[:3, :3], E[:3, 3] = R, t
        P = E.copy()
        P[:3, :4] = K @ E[:3, :4]
        projs.append(P)
    return np.stack(projs).astype(np.float32)


def _relative(src_proj, ref_proj):
    """Pre-compose src @ inv(ref) in float64 so the torch-vs-XLA f32 matrix
    inverse discrepancy (which shifts sample coords by ~a pixel) doesn't
    dominate the comparison; the in-op inverse is exercised by
    test_identity_warp_returns_source."""
    rel = (src_proj.astype(np.float64) @
           np.linalg.inv(ref_proj.astype(np.float64))).astype(np.float32)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), ref_proj.shape).copy()
    return rel, eye


def test_homo_warp_matches_torch_reference():
    B, H, W, C, D = 2, 12, 16, 8, 5
    src = RS.randn(B, H, W, C).astype(np.float32)
    src_proj, ref_proj = _relative(_random_proj(RS, B), _random_proj(RS, B))
    depths = np.linspace(400, 900, D, dtype=np.float32)[None].repeat(B, 0)

    ours = warp.homo_warp(jnp.asarray(src), jnp.asarray(src_proj),
                          jnp.asarray(ref_proj), jnp.asarray(depths))
    ref = _torch_homo_warping(
        torch.from_numpy(src).permute(0, 3, 1, 2), torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj), torch.from_numpy(depths))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()  # BCDHW -> BDHWC
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_homo_warp_per_pixel_depths_matches_torch():
    B, H, W, C, D = 1, 10, 14, 4, 3
    src = RS.randn(B, H, W, C).astype(np.float32)
    src_proj, ref_proj = _relative(_random_proj(RS, B), _random_proj(RS, B))
    depths = (RS.rand(B, D, H, W).astype(np.float32) * 500 + 400)

    ours = warp.homo_warp(jnp.asarray(src), jnp.asarray(src_proj),
                          jnp.asarray(ref_proj), jnp.asarray(depths))
    ref = _torch_homo_warping(
        torch.from_numpy(src).permute(0, 3, 1, 2), torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj),
        torch.from_numpy(depths.reshape(B, D, H * W)))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_identity_warp_returns_source():
    B, H, W, C, D = 1, 8, 8, 2, 4
    src = RS.randn(B, H, W, C).astype(np.float32)
    proj = _random_proj(RS, B)
    depths = np.linspace(400, 900, D, dtype=np.float32)[None]
    out = warp.homo_warp(jnp.asarray(src), jnp.asarray(proj), jnp.asarray(proj),
                         jnp.asarray(depths))
    expected = np.broadcast_to(src[:, None], (B, D, H, W, C))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_plane_sweep_variance_matches_explicit():
    B, H, W, C, D, V = 1, 8, 10, 6, 4, 3
    ref_feat = RS.randn(B, H, W, C).astype(np.float32)
    srcs = [RS.randn(B, H, W, C).astype(np.float32) for _ in range(V - 1)]
    ref_proj = _random_proj(RS, B)
    src_projs = [_random_proj(RS, B) for _ in range(V - 1)]
    depths = np.linspace(420, 880, D, dtype=np.float32)[None]

    var, warped = warp.plane_sweep_variance(
        jnp.asarray(ref_feat), [jnp.asarray(s) for s in srcs],
        [jnp.asarray(p) for p in src_projs], jnp.asarray(ref_proj),
        jnp.asarray(depths), return_warped_srcs=True)

    vols = [np.broadcast_to(ref_feat[:, None], (B, D, H, W, C))]
    vols += [np.asarray(w) for w in warped]
    stack = np.stack(vols)
    expected = (stack ** 2).mean(0) - stack.mean(0) ** 2
    np.testing.assert_allclose(np.asarray(var), expected, atol=1e-4)

    # no-ref variant divides by full V despite excluding the ref volume
    var_nr = warp.plane_sweep_variance_no_ref(warped)
    stack_nr = np.stack([np.asarray(w) for w in warped])
    s1, s2 = stack_nr.sum(0), (stack_nr ** 2).sum(0)
    expected_nr = s2 / V - (s1 / V) ** 2
    np.testing.assert_allclose(np.asarray(var_nr), expected_nr, atol=1e-4)


def test_depth_sample_generators_match_torch_semantics():
    # linspace variant (stage 1)
    B, D_full, nd, H, W = 2, 192, 48, 6, 7
    hyps = np.linspace(425, 905, D_full, dtype=np.float32)[None].repeat(B, 0)
    out = geometry.linspace_depth_samples(jnp.asarray(hyps), nd, H, W)
    assert out.shape == (B, nd, H, W)
    np.testing.assert_allclose(out[:, 0, 0, 0], hyps[:, 0], rtol=1e-6)
    np.testing.assert_allclose(out[:, -1, 0, 0], hyps[:, -1], rtol=1e-6)
    step = np.diff(np.asarray(out[0, :, 0, 0]))
    np.testing.assert_allclose(step, step[0] * np.ones_like(step), rtol=1e-4)

    # per-pixel window variant (stages 2-3)
    cur = (RS.rand(B, H, W).astype(np.float32) * 400 + 450)
    interval = 2.5
    nd2 = 32
    win = geometry.window_depth_samples(jnp.asarray(cur), nd2, interval)
    assert win.shape == (B, nd2, H, W)
    np.testing.assert_allclose(np.asarray(win[:, 0]), cur - nd2 / 2 * interval,
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(win[:, -1]),
        (cur - nd2 / 2 * interval) + (nd2 - 1) * (nd2 * interval / (nd2 - 1)),
        rtol=1e-5)
