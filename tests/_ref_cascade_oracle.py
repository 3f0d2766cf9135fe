"""Subprocess helper for test_cascade_oracle: run the REFERENCE torch
CascadeMVSNet_eval (/root/reference/models/casmvsnet.py:313-417) end to end
on the shared synthetic batch and dump its outputs plus a convertible
checkpoint.

Loaded by file path (not `import models`) so the reference package
__init__ — which imports torchvision, absent here — is bypassed.

Run in a SUBPROCESS by the test: this host's torch CPU kernels
occasionally SIGBUS (flaky host paging), and a crashed oracle must skip
the test, not kill the pytest process.

Every parameter AND BatchNorm buffer is re-randomized (fixed seed) before
the forward: at default init the cascade's outputs are degenerate (the
cost-regularizer maps the volume to near-constant logits, so soft-argmax
depth ≈ midrange everywhere and a broken warp would still "match").
Randomized running stats also make the comparison sensitive to eval-mode
BN semantics and to checkpoint conversion of the stats themselves.
"""
import importlib.util
import sys
import types

import numpy as np

H, W, NDEPTH = 64, 64, 32
NDEPTHS = [8, 8, 8]
RATIOS = [4, 2, 1]
BATCH_SEED = 3
WEIGHT_SEED = 7


def load_reference_casmvsnet():
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = ["/root/reference/models"]
    sys.modules["refmodels"] = pkg
    for name in ("modules", "casmvsnet"):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", f"/root/reference/models/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refmodels.casmvsnet"]


def randomized_state_dict(model, seed=WEIGHT_SEED):
    import torch

    rs = np.random.RandomState(seed)
    new = {}
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.from_numpy(
                rs.uniform(0.5, 1.5, v.shape).astype(np.float32))
        elif k.endswith("running_mean"):
            new[k] = torch.from_numpy(
                rs.normal(0.0, 0.1, v.shape).astype(np.float32))
        elif v.ndim == 1 and k.endswith(".weight"):  # BN gamma
            new[k] = torch.from_numpy(
                rs.uniform(0.5, 1.5, v.shape).astype(np.float32))
        elif v.ndim == 1:  # conv/BN bias
            new[k] = torch.from_numpy(
                rs.normal(0.0, 0.1, v.shape).astype(np.float32))
        else:
            fan_in = int(np.prod(v.shape[1:]))
            new[k] = torch.from_numpy(
                rs.normal(0.0, 1.2 / np.sqrt(fan_in),
                          v.shape).astype(np.float32))
    return new


def main(out_dir, ckpt_path):
    import torch

    torch.set_num_threads(1)
    sys.path.insert(0, "/root/repo")
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch

    batch = make_synthetic_batch(B=1, V=3, H=H, W=W, ndepth=NDEPTH,
                                 seed=BATCH_SEED)
    cas = load_reference_casmvsnet()
    model = cas.CascadeMVSNet_eval(ndepths=NDEPTHS,
                                   depth_interals_ratio=RATIOS)
    model.eval()
    model.load_state_dict(randomized_state_dict(model))

    imgs = torch.from_numpy(np.ascontiguousarray(
        np.transpose(batch["imgs"], (0, 1, 4, 2, 3))))
    proj = {k: torch.from_numpy(v) for k, v in batch["proj_matrices"].items()}
    dv = torch.from_numpy(batch["depth_values"])
    with torch.no_grad():
        out = model(imgs, proj, dv)

    # TRAIN-graph oracle: the train variant (casmvsnet.py:126-231) with the
    # same weights IN .train() MODE (batch-stats BN) — it additionally
    # warps the raw source images and returns the stage-1
    # volume_feature_no_ref [B, 3(V-1)+C, D, h, w] consumed by the
    # rendering branch. .train() matters beyond BN: DepthNet's eval branch
    # (casmvsnet.py:93-97) corrupts the no-ref accumulators via the
    # in-place `warped_volume.pow_(2)` (sum picks up x², sq-sum x⁴); only
    # the train branch — the one the rendering branch ever sees — is clean.
    train_model = cas.CascadeMVSNet(ndepths=NDEPTHS,
                                    depth_interals_ratio=RATIOS)
    train_model.train()
    # ... but with BN modules in eval (running-stats) mode: train-mode BN
    # stats are per-FeatureNet-call = per VIEW in the reference (it loops
    # `self.feature(img)` view by view, casmvsnet.py:177-180) while our
    # TPU-first FeatureNet batches all B·V views through one pass — a
    # documented deviation, so the oracle pins the shared (running-stats)
    # semantics and the clean train-branch volume accumulation only.
    for m in train_model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.eval()
    train_model.load_state_dict(randomized_state_dict(train_model))
    with torch.no_grad():
        tout, volume = train_model(imgs, proj, dv)

    # legacy (non-zip) serialization + separate .npy files: the zip paths
    # (torch's miniz container, numpy's npz via zipfile→encodings.cp437)
    # touch code/pages this flaky host can fail to read.
    torch.save({"model": model.state_dict(), "epoch": 0}, ckpt_path,
               _use_new_zipfile_serialization=False)
    import os
    for name, arr in [("depth", out["depth"]),
                      ("conf", out["photometric_confidence"]),
                      ("s1_depth", out["stage1"]["depth"]),
                      ("s2_depth", out["stage2"]["depth"]),
                      ("train_depth", tout["depth"]),
                      ("train_volume", volume)]:
        np.save(os.path.join(out_dir, name + ".npy"), arr.numpy())
    print("oracle ok")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
