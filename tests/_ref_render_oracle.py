"""Subprocess helper for test_render_oracle: run the REFERENCE rendering
branch downstream of ray sampling — Neural_Volume_Net + rendering()
(/root/reference/models/render_models.py:690-760, renderer.py:15-195,
render_utils.py:247-330) — with the SHIPPED trained NeRF checkpoint on
fixed, saved inputs.

build_rays_norm (the stochastic ray sampler) is bypassed: ray points/NDC/
depth candidates are deterministic arrays saved for the JAX side, which
injects them through a stubbed sample_rays. Everything else is the
reference's real code: trilinear volume resize + CostReg, NDC volume
lookup, per-view color volume with in-bounds masks, viewdir transform,
positional encoding, the v0 MLP, and raw2outputs compositing.

Import quirks handled here: the reference imports torchvision and
`utils` at module scope (stubbed — unused on this path) and Embedder
hard-calls .cuda() on its freq bands (patched to identity).
"""
import importlib.util
import os
import sys
import types

import numpy as np

NERF_CKPT = "/root/reference/pretrain/model_000014_nerf.ckpt"
N_RAYS, N_SAMPLES = 64, 16
H = W = 48
D0, HV, WV = 16, 16, 16
SEED = 11


def load_reference_render_stack():
    import torch

    # stub modules the reference imports but this path never executes
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    # render_models gets torch.nn.functional as F via `from utils import *`
    # (the reference's root utils.py re-exports it); the stub must too.
    utils_stub = types.ModuleType("utils")
    utils_stub.F = torch.nn.functional
    utils_stub.torch = torch
    utils_stub.np = np
    sys.modules.setdefault("utils", utils_stub)
    # Embedder.create_embedding_fn calls .cuda() on its freq bands
    torch.Tensor.cuda = lambda self, *a, **k: self

    pkg = types.ModuleType("refrender")
    pkg.__path__ = ["/root/reference/models"]
    sys.modules["refrender"] = pkg
    for name in ("render_utils", "renderer", "render_models"):
        spec = importlib.util.spec_from_file_location(
            f"refrender.{name}", f"/root/reference/models/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refrender.{name}"] = mod
        spec.loader.exec_module(mod)
    return (sys.modules["refrender.renderer"],
            sys.modules["refrender.render_models"])


def make_inputs():
    """Deterministic rays/images/cameras/volume shared with the JAX side."""
    rs = np.random.RandomState(SEED)
    f = 60.0
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]], np.float32)
    w2cs = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
    for v in range(4):
        w2cs[v, 0, 3] = -6.0 * v

    px = rs.uniform(0, W - 1, N_RAYS).astype(np.float32)
    py = rs.uniform(0, H - 1, N_RAYS).astype(np.float32)
    # world == cam-0 frame; dirs via K^-1, unnormalized (|d| is the
    # cos-angle factor the compositor uses)
    dirs = np.stack([(px - K[0, 2]) / f, (py - K[1, 2]) / f,
                     np.ones_like(px)], -1).astype(np.float32)
    z_vals = np.sort(rs.uniform(400.0, 800.0, (N_RAYS, N_SAMPLES)),
                     axis=1).astype(np.float32)
    pts = dirs[:, None, :] * z_vals[..., None]
    ndc = rs.uniform(0.02, 0.98, (N_RAYS, N_SAMPLES, 3)).astype(np.float32)
    imgs = rs.uniform(0, 1, (1, 3, 3, H, W)).astype(np.float32)
    vol_warp = rs.normal(0, 0.5, (1, 41, D0, HV, WV)).astype(np.float32)
    intrinsics = np.broadcast_to(K, (4, 3, 3)).copy()
    return {"pts": pts, "dirs": dirs, "z_vals": z_vals, "ndc": ndc,
            "imgs": imgs, "vol_warp": vol_warp, "w2cs": w2cs,
            "intrinsics": intrinsics}


def main(out_dir):
    import torch

    torch.set_num_threads(1)
    renderer, render_models = load_reference_render_stack()
    inp = make_inputs()

    ckpt = torch.load(NERF_CKPT, map_location="cpu")
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in ckpt["model"].items()}

    # default norm_act=BatchNorm2d only works after the train driver's
    # SyncBatchNorm conversion (train_rcmvsnet.py:524-525) — BN3d has
    # identical eval-mode math and state-dict keys.
    nv = render_models.Neural_Volume_Net(norm_act=torch.nn.BatchNorm3d)
    nv.load_state_dict({k[len("MVSNet."):]: v for k, v in sd.items()
                        if k.startswith("MVSNet.")})
    nv.eval()
    rendernet = render_models.RenderNet(
        D=6, W=128, input_ch_pts=63, input_ch_views=3, input_ch_feat=20,
        skips=[4], net_type="v0")
    rendernet.load_state_dict({k[len("network_fn."):]: v
                               for k, v in sd.items()
                               if k.startswith("network_fn.")})
    rendernet.eval()

    embed_fn, _ = render_models.get_embedder(10, 0, input_dims=3)
    query_fn = lambda pts, viewdirs, feats, fn: renderer.run_network_mvs(
        pts, viewdirs, feats, fn, embed_fn=embed_fn, embeddirs_fn=None,
        netchunk=1024)
    args = types.SimpleNamespace(feat_dim=20, img_downscale=1.0,
                                 use_color_volume=False, net_type="v0")

    t = {k: torch.from_numpy(v) for k, v in inp.items()}
    pose_ref = {"w2cs": t["w2cs"][:3], "intrinsics": t["intrinsics"][:3]}
    with torch.no_grad():
        volume = nv(t["vol_warp"])
        rgb, _, weights, depth, alpha, _ = renderer.rendering(
            args, pose_ref, t["pts"], t["ndc"], t["z_vals"],
            torch.zeros(N_RAYS, 3), t["dirs"], volume_feature=volume,
            imgs=t["imgs"], network_fn=rendernet, network_query_fn=query_fn,
            white_bkgd=False)

    for name, arr in [("rgb", rgb), ("weights", weights), ("depth", depth),
                      ("alpha", alpha), ("volume", volume)]:
        np.save(os.path.join(out_dir, name + ".npy"), arr.numpy())
    for name, arr in inp.items():
        np.save(os.path.join(out_dir, name + ".npy"), arr)
    print("render oracle ok")


if __name__ == "__main__":
    main(sys.argv[1])
