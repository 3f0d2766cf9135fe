"""Subprocess helper for test_unsup_real_oracle: run the REFERENCE's own
UnsupLossMultiStage (/root/reference/losses/unsup_loss.py:9-94,423-451 with
losses/modules.py + losses/homography.py) on the shared synthetic batch and
dump the total + per-stage scalars.

tests/test_unsup_oracle.py compares against a literal in-repo PORT of the
same code; this runs the actual reference source (loaded under a synthetic
'losses' package, with Tensor.cuda patched to identity since the loss
hard-codes .cuda() on CPU-reachable tensors), so a transcription error in
the port cannot hide a divergence.
"""
import importlib.util
import os
import sys
import types

import numpy as np

H, W, V = 64, 64, 3
BATCH_SEED = 5
DLOSSW = [0.5, 1.0, 2.0]


def load_reference_losses():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = types.ModuleType("losses")
    pkg.__path__ = ["/root/reference/losses"]
    sys.modules["losses"] = pkg
    for name in ("modules", "homography", "unsup_loss", "aug_loss"):
        spec = importlib.util.spec_from_file_location(
            f"losses.{name}", f"/root/reference/losses/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"losses.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["losses.unsup_loss"], sys.modules["losses.aug_loss"]


def make_loss_inputs():
    """Synthetic batch + noisy GT-based stage depths (deterministic)."""
    sys.path.insert(0, "/root/repo")
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch

    batch = make_synthetic_batch(B=1, V=V, H=H, W=W, ndepth=16,
                                 seed=BATCH_SEED)
    rs = np.random.RandomState(BATCH_SEED + 1)
    depths = {}
    for key, d in batch["depth"].items():
        depths[key] = (d * (1.0 + 0.02 * rs.randn(*d.shape))).astype(
            np.float32)
    # deterministic (H/3, W/3) hole for the aug filter mask
    filter_mask = np.ones((1, H, W), np.float32)
    filter_mask[:, H // 5:H // 5 + H // 3, W // 4:W // 4 + W // 3] = 0.0
    return batch, depths, filter_mask


def main(out_dir):
    import torch

    torch.set_num_threads(1)
    unsup, aug = load_reference_losses()
    batch, depths, filter_mask = make_loss_inputs()

    imgs = torch.from_numpy(np.ascontiguousarray(
        np.transpose(batch["center_imgs"], (0, 1, 4, 2, 3))))
    cams = {k: torch.from_numpy(v) for k, v in batch["proj_matrices"].items()}
    inputs = {k: {"depth": torch.from_numpy(v)} for k, v in depths.items()}

    loss_fn = unsup.UnsupLossMultiStage()
    total, scalars = loss_fn(inputs, imgs, cams, dlossw=DLOSSW)

    # AugLossMultiStage (aug_loss.py:28-67): aug-pass depths vs full-res
    # pseudo-depth under the nearest-downscaled filter mask
    pseudo = torch.from_numpy(batch["depth"]["stage3"])       # [B, H, W]
    fmask = torch.from_numpy(filter_mask).unsqueeze(1)        # [B, 1, H, W]
    aug_total, aug_scalars = aug.AugLossMultiStage()(
        inputs, pseudo, None, fmask, dlossw=DLOSSW)
    scalars = dict(scalars, aug_total=aug_total, **aug_scalars)

    np.save(os.path.join(out_dir, "total.npy"),
            np.asarray(float(total), np.float32))
    for k, v in scalars.items():
        np.save(os.path.join(out_dir, f"{k}.npy"),
                np.asarray(float(v), np.float32))
    print("unsup oracle ok")


if __name__ == "__main__":
    main(sys.argv[1])
