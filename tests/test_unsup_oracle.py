"""Value-level oracle for the unsupervised loss: a literal torch-CPU port
of the reference UnSupLoss (/root/reference/losses/unsup_loss.py:9-94 with
losses/modules.py + losses/homography.py, .cuda() calls dropped) compared
against rcmvsnet_tpu.losses.unsup.unsup_stage_loss on shared inputs.

This is the same literal-port treatment test_warp.py gives homo_warping:
any divergence in the scalar-broadcast reconstr quirk, the ≤2-view SSIM
accumulation, the top-1 view selection, or the y1-unchecked sampler mask
fails here at 1e-5.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rcmvsnet_tpu.data.synthetic import make_synthetic_views  # noqa: E402
from rcmvsnet_tpu.losses.unsup import unsup_stage_loss  # noqa: E402


# ---------------------------------------------------------------- torch port
def _meshgrid_abs(height, width):
    x_t = torch.matmul(torch.ones([height, 1]),
                       torch.linspace(-1.0, 1.0, width).unsqueeze(1).permute(1, 0))
    y_t = torch.matmul(torch.linspace(-1.0, 1.0, height).unsqueeze(1),
                       torch.ones([1, width]))
    x_t = (x_t + 1.0) * 0.5 * (width - 1)
    y_t = (y_t + 1.0) * 0.5 * (height - 1)
    ones = torch.ones_like(x_t.reshape(1, -1))
    return torch.cat([x_t.reshape(1, -1), y_t.reshape(1, -1), ones], dim=0)


def _bilinear_sample(im, x, y):
    x = x.reshape(-1).float()
    y = y.reshape(-1).float()
    batch_size, height, width, channels = im.shape
    max_y, max_x = int(height - 1), int(width - 1)
    x = (x + 1.0) * (width - 1.0) / 2.0
    y = (y + 1.0) * (height - 1.0) / 2.0
    x0 = torch.floor(x).int()
    x1 = x0 + 1
    y0 = torch.floor(y).int()
    y1 = y0 + 1
    # NOTE: y1 is unchecked in the reference — quirk preserved
    mask = ((x0 >= 0) & (x1 <= max_x) & (y0 >= 0) & (y0 <= max_y)).float()
    x0 = torch.clamp(x0, 0, max_x)
    x1 = torch.clamp(x1, 0, max_x)
    y0 = torch.clamp(y0, 0, max_y)
    y1 = torch.clamp(y1, 0, max_y)
    dim2, dim1 = width, width * height
    base = (torch.arange(batch_size) * dim1).reshape(-1, 1)
    base = base.repeat(1, height * width).reshape(-1).long()
    base_y0 = base + y0.long() * dim2
    base_y1 = base + y1.long() * dim2
    im_flat = im.reshape(-1, channels).float()
    pixel_a = im_flat[base_y0 + x0.long()]
    pixel_b = im_flat[base_y1 + x0.long()]
    pixel_c = im_flat[base_y0 + x1.long()]
    pixel_d = im_flat[base_y1 + x1.long()]
    wa = ((x1.float() - x) * (y1.float() - y)).unsqueeze(1)
    wb = ((x1.float() - x) * (1.0 - (y1.float() - y))).unsqueeze(1)
    wc = ((1.0 - (x1.float() - x)) * (y1.float() - y)).unsqueeze(1)
    wd = ((1.0 - (x1.float() - x)) * (1.0 - (y1.float() - y))).unsqueeze(1)
    output = wa * pixel_a + wb * pixel_b + wc * pixel_c + wd * pixel_d
    return (output.reshape(batch_size, height, width, channels),
            mask.reshape(batch_size, height, width, 1))


def _inverse_warping(img, left_cam, right_cam, depth):
    R_left = left_cam[:, 0:1, 0:3, 0:3].squeeze(1)
    R_right = right_cam[:, 0:1, 0:3, 0:3].squeeze(1)
    t_left = left_cam[:, 0:1, 0:3, 3:4].squeeze(1)
    t_right = right_cam[:, 0:1, 0:3, 3:4].squeeze(1)
    K_left = left_cam[:, 1:2, 0:3, 0:3].squeeze(1)
    K_left_inv = torch.inverse(K_left)
    R_rel = torch.matmul(R_right, R_left.permute(0, 2, 1))
    t_rel = t_right - torch.matmul(R_rel, t_left)
    batch_size = R_left.shape[0]
    filler = torch.Tensor([0.0, 0.0, 0.0, 1.0]).reshape(1, 1, 4).repeat(
        batch_size, 1, 1)
    transform_mat = torch.cat([torch.cat([R_rel, t_rel], dim=2).float(),
                               filler.float()], dim=1)
    batch_size, img_height, img_width, _ = img.shape
    depth = depth.reshape(batch_size, 1, img_height * img_width)
    grid = _meshgrid_abs(img_height, img_width).unsqueeze(0).repeat(
        batch_size, 1, 1)
    cam_coords = torch.matmul(K_left_inv.float(), grid.float()) * depth.float()
    ones = torch.ones([batch_size, 1, img_height * img_width])
    cam_coords_hom = torch.cat([cam_coords, ones], dim=1)
    hom_filler = torch.Tensor([0.0, 0.0, 0.0, 1.0]).reshape(1, 1, 4).repeat(
        batch_size, 1, 1)
    intrinsic_mat_hom = torch.cat(
        [torch.cat([K_left.float(), torch.zeros([batch_size, 3, 1])], dim=2),
         hom_filler], dim=1)
    proj = torch.matmul(intrinsic_mat_hom, transform_mat)
    pcoords = torch.matmul(proj, cam_coords_hom)
    x_norm = pcoords[:, 0:1, :] / (pcoords[:, 2:3, :] + 1e-10)
    y_norm = pcoords[:, 1:2, :] / (pcoords[:, 2:3, :] + 1e-10)
    coords = torch.cat([x_norm, y_norm], dim=1).reshape(
        batch_size, 2, img_height, img_width).permute(0, 2, 3, 1)
    px = coords[:, :, :, :1] / (img_width - 1) * 2.0 - 1.0
    py = coords[:, :, :, 1:] / (img_height - 1) * 2.0 - 1.0
    return _bilinear_sample(img, px, py)


class _SSIM(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.pool = torch.nn.AvgPool2d(3, 1)
        self.C1, self.C2 = 0.01 ** 2, 0.03 ** 2

    def forward(self, x, y, mask):
        x = x.permute(0, 3, 1, 2)
        y = y.permute(0, 3, 1, 2)
        mask = mask.permute(0, 3, 1, 2)
        mu_x, mu_y = self.pool(x), self.pool(y)
        sigma_x = self.pool(x ** 2) - mu_x ** 2
        sigma_y = self.pool(y ** 2) - mu_y ** 2
        sigma_xy = self.pool(x * y) - mu_x * mu_y
        ssim_n = (2 * mu_x * mu_y + self.C1) * (2 * sigma_xy + self.C2)
        ssim_d = (mu_x ** 2 + mu_y ** 2 + self.C1) * (sigma_x + sigma_y + self.C2)
        out = self.pool(mask) * torch.clamp((1 - ssim_n / ssim_d) / 2, 0, 1)
        return out.permute(0, 2, 3, 1)


def _gradient_x(img):
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def _gradient_y(img):
    return img[:, :-1, :, :] - img[:, 1:, :, :]


def _gradient(pred):
    d_dy = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    d_dx = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    return d_dx, d_dy


def _depth_smoothness(depth, img, lambda_wt=1):
    depth_dx, depth_dy = _gradient_x(depth), _gradient_y(depth)
    image_dx, image_dy = _gradient_x(img), _gradient_y(img)
    weights_x = torch.exp(-(lambda_wt * torch.mean(torch.abs(image_dx), 3,
                                                   keepdim=True)))
    weights_y = torch.exp(-(lambda_wt * torch.mean(torch.abs(image_dy), 3,
                                                   keepdim=True)))
    return (torch.mean(torch.abs(depth_dx * weights_x))
            + torch.mean(torch.abs(depth_dy * weights_y)))


def _compute_reconstr_loss(warped, ref, mask, simple=False):
    alpha = 0.5
    ref_dx, ref_dy = _gradient(ref * mask)
    warped_dx, warped_dy = _gradient(warped * mask)
    photo_loss = F.smooth_l1_loss(warped * mask, ref * mask, reduction="mean")
    grad_loss = (F.smooth_l1_loss(warped_dx, ref_dx, reduction="mean")
                 + F.smooth_l1_loss(warped_dy, ref_dy, reduction="mean"))
    return (1 - alpha) * photo_loss + alpha * grad_loss


def torch_unsup_loss(imgs, cams, depth, stage_idx):
    """Literal port of UnSupLoss.forward (unsup_loss.py:14-96)."""
    ssim_mod = _SSIM()
    imgs = torch.unbind(imgs, 1)
    cams = torch.unbind(cams, 1)
    num_views = len(imgs)
    ref_img = imgs[0]
    if stage_idx == 0:
        ref_img = F.interpolate(ref_img, scale_factor=0.25,
                                recompute_scale_factor=True)
    elif stage_idx == 1:
        ref_img = F.interpolate(ref_img, scale_factor=0.5,
                                recompute_scale_factor=True)
    ref_img = ref_img.permute(0, 2, 3, 1)
    ref_cam = cams[0]

    ssim_loss = 0
    reprojection_losses = []
    for view in range(1, num_views):
        view_img = imgs[view]
        view_cam = cams[view]
        if stage_idx == 0:
            view_img = F.interpolate(view_img, scale_factor=0.25,
                                     recompute_scale_factor=True)
        elif stage_idx == 1:
            view_img = F.interpolate(view_img, scale_factor=0.5,
                                     recompute_scale_factor=True)
        view_img = view_img.permute(0, 2, 3, 1)
        warped_img, mask = _inverse_warping(view_img, ref_cam, view_cam, depth)
        reconstr_loss = _compute_reconstr_loss(warped_img, ref_img, mask,
                                               simple=False)
        valid_mask = 1 - mask
        reprojection_losses.append(reconstr_loss + 1e4 * valid_mask)
        if view < 3:
            ssim_loss += torch.mean(ssim_mod(ref_img, warped_img, mask))

    smooth_loss = _depth_smoothness(depth.unsqueeze(dim=-1), ref_img, 1.0)
    reprojection_volume = torch.stack(reprojection_losses).permute(1, 2, 3, 4, 0)
    top_vals, _ = torch.topk(torch.neg(reprojection_volume), k=1, sorted=False)
    top_vals = torch.neg(top_vals)
    top_mask = (top_vals < (1e4 * torch.ones_like(top_vals))).float()
    top_vals = torch.mul(top_vals, top_mask)
    reconstr_loss = torch.mean(torch.sum(top_vals, dim=-1))
    unsup_loss = 12 * reconstr_loss + 6 * ssim_loss + 0.18 * smooth_loss
    return (float(unsup_loss), float(reconstr_loss), float(ssim_loss),
            float(smooth_loss))


# ------------------------------------------------------------------- fixture
def _stage_inputs(stage_idx, V=4, H=64, W=64, seed=0):
    """Shared synthetic multi-view rig: full-res images, stage-scaled cams
    and a perturbed stage-resolution depth map."""
    s = make_synthetic_views(H=H, W=W, V=V, depth0=600.0, seed=seed,
                             baseline=8.0)
    scale = {0: 4, 1: 2, 2: 1}[stage_idx]
    h, w = H // scale, W // scale
    rs = np.random.RandomState(seed + 1)

    cams = np.zeros((1, V, 2, 4, 4), np.float32)
    for v in range(V):
        cams[0, v, 0] = s["extrinsics"][v]
        K = s["intrinsics"].copy()
        K[:2] /= scale
        cams[0, v, 1, :3, :3] = K
        cams[0, v, 1, 3, 3] = 1.0
    imgs = s["images"][None].astype(np.float32)          # [1, V, H, W, 3]
    depth_full = s["depths"][0].astype(np.float32)  # ref-view depth
    depth = depth_full[::scale, ::scale][None]           # [1, h, w]
    depth = depth * (1.0 + 0.01 * rs.randn(*depth.shape).astype(np.float32))
    return imgs, cams, depth


@pytest.mark.parametrize("stage_idx", [0, 1, 2])
def test_unsup_stage_loss_matches_torch_port(stage_idx):
    imgs, cams, depth = _stage_inputs(stage_idx)

    want = torch_unsup_loss(
        torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 1, 4, 2, 3))),
        torch.from_numpy(cams), torch.from_numpy(depth), stage_idx)

    loss, comps = unsup_stage_loss(jnp.asarray(imgs), jnp.asarray(cams),
                                   jnp.asarray(depth), stage_idx)
    got = (float(loss), float(comps["reconstr_loss"]),
           float(comps["ssim_loss"]), float(comps["smooth_loss"]))

    for g, w_, name in zip(got, want,
                           ["unsup", "reconstr", "ssim", "smooth"]):
        np.testing.assert_allclose(g, w_, rtol=2e-4, atol=1e-6,
                                   err_msg=f"stage{stage_idx} {name}")
