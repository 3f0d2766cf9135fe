"""Loss-layer checks: analytic warping cases, hand-computed oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from rcmvsnet_tpu.losses import (abs_error, acc_threshold, aug_loss_multi_stage,
                                 cas_mvsnet_loss, img2mse, inverse_warping,
                                 random_image_mask, sl1_loss, thres_metric,
                                 abs_depth_error_metric)
from rcmvsnet_tpu.losses.unsup import unsup_stage_loss, unsup_loss_multi_stage
from rcmvsnet_tpu.ops.image import smooth_l1

RS = np.random.RandomState(21)


def _cam(K, R=None, t=None):
    cam = np.zeros((2, 4, 4), np.float32)
    E = np.eye(4, dtype=np.float32)
    if R is not None:
        E[:3, :3] = R
    if t is not None:
        E[:3, 3] = t
    cam[0] = E
    cam[1, :3, :3] = K
    return cam


K = np.array([[50.0, 0, 16.0], [0, 50.0, 12.0], [0, 0, 1.0]], np.float32)


def test_inverse_warping_identity():
    B, H, W, C = 1, 24, 32, 3
    img = RS.rand(B, H, W, C).astype(np.float32)
    cam = _cam(K)[None]
    depth = np.full((B, H, W), 100.0, np.float32)
    warped, mask = inverse_warping(jnp.asarray(img), jnp.asarray(cam),
                                   jnp.asarray(cam), jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(warped), img, atol=1e-4)
    m = np.asarray(mask)[0, :, :, 0]
    # reference-mask quirk: x1 = x0+1 fails `x1 <= W-1` at the last column
    # even for an exact identity warp (losses/homography.py:155)
    assert (m[:, :-1] == 1.0).all()
    assert (m[:, -1] == 0.0).all()


def test_inverse_warping_pure_translation_shifts_pixels():
    """src camera displaced by tx along x: ref pixel (u,v) samples src pixel
    (u + fx·tx/z, v) — with z=100, fx=50, tx=4 → 2-pixel shift."""
    B, H, W, C = 1, 20, 30, 1
    img = RS.rand(B, H, W, C).astype(np.float32)
    ref_cam = _cam(K)[None]
    src_cam = _cam(K, t=[2.0 * 100.0 / 50.0, 0, 0])[None]  # 2 px at z=100
    depth = np.full((B, H, W), 100.0, np.float32)
    warped, mask = inverse_warping(jnp.asarray(img), jnp.asarray(ref_cam),
                                   jnp.asarray(src_cam), jnp.asarray(depth))
    warped = np.asarray(warped)
    mask = np.asarray(mask)
    # ref pixel u sees src pixel u+2 (E maps world→cam: x_src = x + tx)
    valid = mask[0, :, :, 0] > 0
    np.testing.assert_allclose(warped[0, :, :-2][valid[:, :-2]],
                               img[0, :, 2:][valid[:, :-2]], atol=1e-4)
    # the last two columns can't see the source → masked out
    assert not valid[:, -2:].any()


def test_unsup_stage_loss_zero_photometric_when_views_identical():
    B, V, H, W = 1, 3, 32, 32
    img = RS.rand(B, 1, H, W, 3).astype(np.float32)
    imgs = np.repeat(img, V, axis=1)
    cams = np.stack([_cam(K)] * V)[None]  # identical poses
    depth = np.full((B, H, W), 100.0, np.float32)  # constant → smooth ≈ 0

    loss, comps = unsup_stage_loss(jnp.asarray(imgs), jnp.asarray(cams),
                                   jnp.asarray(depth), stage_idx=2)
    assert float(comps["reconstr_loss"]) < 1e-5
    assert float(comps["ssim_loss"]) < 1e-4
    assert float(comps["smooth_loss"]) < 1e-6
    assert float(loss) < 1e-3


def test_unsup_multi_stage_weights():
    """Total = Σ dlossw·stage — verify with per-stage recomputation."""
    B, V, H, W = 1, 3, 16, 16
    imgs = RS.rand(B, V, H, W, 3).astype(np.float32)
    cams = {}
    for i, s in enumerate([4, 2, 1]):
        Ks = K.copy()
        Ks[:2] /= s
        cams[f"stage{i+1}"] = jnp.asarray(
            np.stack([_cam(Ks, t=[v * 0.5, 0, 0]) for v in range(V)])[None])
    outputs = {f"stage{i+1}": {"depth": jnp.asarray(
        RS.rand(B, H // s, W // s).astype(np.float32) * 20 + 90)}
        for i, s in enumerate([4, 2, 1])}
    total, scalars = unsup_loss_multi_stage(outputs, jnp.asarray(imgs), cams)
    expected = sum(w * float(scalars[f"depth_loss_stage{i+1}"])
                   for i, w in enumerate([0.5, 1.0, 2.0]))
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def test_random_image_mask_properties():
    img = jnp.ones((1, 30, 30, 3))
    masked, fmask = random_image_mask(jax.random.PRNGKey(0), img, (10, 10))
    fm = np.asarray(fmask)
    assert fm.shape == (1, 30, 30, 3)
    assert np.isin(fm, [0.0, 1.0]).all()
    assert (fm == 0).sum() == 10 * 10 * 3
    np.testing.assert_array_equal(np.asarray(masked), fm)


def test_random_image_mask_per_sample_rectangles():
    """B>1 must draw an INDEPENDENT rectangle per sample (reference runs
    B=1 per DDP rank, so each sample gets its own mask — aug_loss.py:7-25)."""
    B = 6
    img = jnp.ones((B, 40, 40, 3))
    masked, fmask = random_image_mask(jax.random.PRNGKey(3), img, (12, 12))
    fm = np.asarray(fmask)
    # every sample has exactly one 12x12x3 hole...
    for b in range(B):
        assert (fm[b] == 0).sum() == 12 * 12 * 3
    # ...and the rectangles are not all in the same place
    holes = {tuple(np.argwhere(fm[b, :, :, 0] == 0)[0]) for b in range(B)}
    assert len(holes) > 1, "all samples drew the identical rectangle"
    np.testing.assert_array_equal(np.asarray(masked), fm)


def test_aug_loss_hand_computed():
    B, H, W = 1, 8, 8
    pseudo = RS.rand(B, H, W).astype(np.float32) * 10 + 5
    fmask = np.ones((B, H, W, 3), np.float32)
    fmask[:, 2:4, 2:4] = 0.0
    outputs = {}
    expected_total = 0.0
    for i, s in enumerate([4, 2, 1]):
        est = RS.rand(B, H // s, W // s).astype(np.float32) * 10 + 5
        outputs[f"stage{i+1}"] = {"depth": jnp.asarray(est)}
        pseudo_t = pseudo[:, ::s, ::s]
        mask_t = fmask[:, ::s, ::s, 0] > 0.5
        diff = np.abs(est - pseudo_t)
        sl1 = np.where(diff < 1, 0.5 * diff ** 2, diff - 0.5)
        expected_total += [0.5, 1.0, 2.0][i] * sl1[mask_t].mean()
    total, _ = aug_loss_multi_stage(outputs, jnp.asarray(pseudo),
                                    jnp.asarray(fmask))
    np.testing.assert_allclose(float(total), expected_total, rtol=1e-5)


def test_ray_losses_and_metrics():
    pred = jnp.asarray(RS.rand(64).astype(np.float32) * 10)
    gt = jnp.asarray(RS.rand(64).astype(np.float32) * 10)
    mask = gt > 5

    got = float(sl1_loss(pred, gt, mask))
    diff = np.abs(np.asarray(pred) - np.asarray(gt))
    sl1 = np.where(diff < 1, 0.5 * diff ** 2, diff - 0.5)
    np.testing.assert_allclose(got, sl1[np.asarray(mask)].mean() * 0.5, rtol=1e-5)

    np.testing.assert_allclose(
        float(img2mse(pred, gt)), ((np.asarray(pred) - np.asarray(gt)) ** 2).mean(),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(abs_error(pred, gt, mask)), diff[np.asarray(mask)].mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(acc_threshold(pred, gt, mask, 2.0)),
        (diff[np.asarray(mask)] < 2).mean(), rtol=1e-5)


def test_supervised_loss_and_metrics():
    B, H, W = 2, 8, 8
    outputs, gts, masks = {}, {}, {}
    for i, s in enumerate([4, 2, 1]):
        est = RS.rand(B, H // s, W // s).astype(np.float32) * 5
        gt = RS.rand(B, H // s, W // s).astype(np.float32) * 5
        m = (RS.rand(B, H // s, W // s) > 0.3).astype(np.float32)
        outputs[f"stage{i+1}"] = {"depth": jnp.asarray(est)}
        gts[f"stage{i+1}"] = jnp.asarray(gt)
        masks[f"stage{i+1}"] = jnp.asarray(m)
    total, last = cas_mvsnet_loss(outputs, gts, masks)
    assert np.isfinite(float(total)) and np.isfinite(float(last))

    est = jnp.asarray(RS.rand(B, H, W).astype(np.float32) * 10)
    gt = jnp.asarray(RS.rand(B, H, W).astype(np.float32) * 10)
    mask = gt > 3
    tm = float(thres_metric(est, gt, mask, 2.0))
    expected = np.mean([
        (np.abs(np.asarray(est[b])[np.asarray(mask[b])]
                - np.asarray(gt[b])[np.asarray(mask[b])]) > 2).mean()
        for b in range(B)])
    np.testing.assert_allclose(tm, expected, rtol=1e-5)
    ae = float(abs_depth_error_metric(est, gt, mask))
    expected_ae = np.mean([
        np.abs(np.asarray(est[b])[np.asarray(mask[b])]
               - np.asarray(gt[b])[np.asarray(mask[b])]).mean()
        for b in range(B)])
    np.testing.assert_allclose(ae, expected_ae, rtol=1e-5)
