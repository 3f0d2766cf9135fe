"""Produce the committed golden-quality artifacts behind
tests/test_e2e_quality.py and PARITY.md.

No DTU data exists in this environment and the reference's shipped backbone
checkpoint blob is stripped (/root/reference/pretrain/.MISSING_LARGE_BLOBS),
so the committed end-to-end quality canary uses a backbone SUPERVISED-
overfit to the synthetic plane scene (exact GT geometry): any later
regression in kernels, cascade semantics, fusion, or the metric port moves
the committed acc/comp and fails the test.

Two phases (run separately so goldens come from the same CPU/XLA-f32 path
the test uses):

  python scripts/train_synth_golden.py train    # any backend (TPU fast)
      → tests/golden/backbone_synth.msgpack
  JAX_PLATFORMS=cpu python scripts/train_synth_golden.py golden
      → tests/golden/e2e_quality.json

Scene/protocol constants mirror tests/test_e2e_quality.py exactly.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN_DIR = REPO / "tests" / "golden"
CKPT = GOLDEN_DIR / "backbone_synth.msgpack"
GOLDEN_JSON = GOLDEN_DIR / "e2e_quality.json"

# scene + eval protocol (shared with tests/test_e2e_quality.py)
H, W, V, SEED = 128, 160, 5, 5
NDEPTH = 64
PROB_THRES, NUM_CONSISTENT = 0.5, 3


def build_samples(tmp, h=H, w=W, ndepth=NDEPTH):
    """DTU-layout scan → the 5 per-ref-view eval samples + GT depths."""
    from rcmvsnet_tpu.data.dtu_test import DTUTestDataset
    from rcmvsnet_tpu.data.synthetic import write_synthetic_scan
    _, scene = write_synthetic_scan(tmp, H=h, W=w, V=V, seed=SEED)
    ds = DTUTestDataset(tmp, ["scan1"], nviews=V, ndepths=ndepth,
                        max_h=h, max_w=w)
    return ds, scene


def train(steps=1200, lr=1e-3, h=H, w=W, ndepth=NDEPTH, out=None,
          init_ckpt=None):
    import jax
    import jax.numpy as jnp
    import optax
    import flax.serialization
    from rcmvsnet_tpu.config import Config
    from rcmvsnet_tpu.losses.supervised import cas_mvsnet_loss
    from rcmvsnet_tpu.train.state import make_models

    ds, scene = build_samples(f"/tmp/golden_scan_{w}x{h}", h, w, ndepth)
    cascade, _ = make_models(Config())

    # 5 training samples: every view once as reference (the eval protocol)
    samples = []
    for i in range(len(ds)):
        s = ds[i]  # metas follow pair.txt order: sample i's ref view is i
        gt = scene["depths"][i]
        depth_ms = {f"stage{k+1}": jnp.asarray(gt[::sc, ::sc][None])
                    for k, sc in enumerate((4, 2, 1))}
        mask_ms = {k: jnp.ones_like(v) for k, v in depth_ms.items()}
        samples.append((
            jnp.asarray(s["imgs"])[None],
            jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                   s["proj_matrices"]),
            jnp.asarray(s["depth_values"])[None], depth_ms, mask_ms))

    variables = jax.jit(lambda r: cascade.init(
        r, samples[0][0], samples[0][1], samples[0][2], train=True))(
        jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    if init_ckpt is not None:      # fine-tune (e.g. parity ckpt at DTU res)
        blob = flax.serialization.msgpack_restore(
            Path(init_ckpt).read_bytes())
        params = flax.serialization.from_state_dict(params, blob["params"])
        stats = flax.serialization.from_state_dict(stats,
                                                   blob["batch_stats"])
    tx = optax.adam(optax.piecewise_constant_schedule(
        lr, {int(steps * 0.6): 0.3, int(steps * 0.85): 0.3}))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, imgs, projs, dv, depth_ms, mask_ms):
        def loss_fn(p):
            out, mut = cascade.apply(
                {"params": p, "batch_stats": stats}, imgs, projs, dv,
                train=True, mutable=["batch_stats"])
            total, last = cas_mvsnet_loss(out, depth_ms, mask_ms)
            return total, (mut["batch_stats"], last)
        (loss, (new_stats, last)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss, last

    for it in range(steps):
        imgs, projs, dv, dms, mms = samples[it % len(samples)]
        params, stats, opt_state, loss, last = step(
            params, stats, opt_state, imgs, projs, dv, dms, mms)
        if it % 100 == 0 or it == steps - 1:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"stage3 smooth-l1 {float(last):.4f}", flush=True)

    GOLDEN_DIR.mkdir(exist_ok=True)
    out = Path(out) if out else CKPT
    blob = {"params": jax.device_get(params),
            "batch_stats": jax.device_get(stats)}
    out.write_bytes(flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, blob)))
    print("wrote", out)


def run_quality(ckpt_path=None, variables_override=None, forward=None,
                ds=None, scene=None, return_depths=False):
    """Shared depth→fusion→metric pipeline (imported by the test and the
    PARITY study): forward all 5 ref views, geometric-consistency fuse,
    score against the exact plane GT cloud with the ported DTU metric."""
    import jax
    import jax.numpy as jnp
    from rcmvsnet_tpu.config import Config
    from rcmvsnet_tpu.fusion.dtu_eval import dtu_point_compare
    from rcmvsnet_tpu.fusion.fuse import filter_depth_views
    from rcmvsnet_tpu.train.state import make_models
    import flax.serialization

    if ds is None:
        ds, scene = build_samples("/tmp/golden_scan")
    if forward is None:
        cascade, _ = make_models(Config())
        s0 = ds[0]
        template = jax.eval_shape(
            lambda r: cascade.init(
                r, jnp.asarray(s0["imgs"])[None],
                jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                       s0["proj_matrices"]),
                jnp.asarray(s0["depth_values"])[None], train=False),
            jax.random.PRNGKey(0))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        blob = flax.serialization.msgpack_restore(
            Path(ckpt_path or CKPT).read_bytes())
        variables = {
            "params": flax.serialization.from_state_dict(
                template["params"], blob["params"]),
            "batch_stats": flax.serialization.from_state_dict(
                template["batch_stats"], blob["batch_stats"]),
        }
        if variables_override is not None:
            variables = variables_override
        fwd = jax.jit(lambda v, i, p, d: cascade.apply(
            v, i, p, d, train=False))
        forward = lambda i, p, d: fwd(variables, i, p, d)

    depths, confs, intrs, extrs = [], [], [], []
    for i in range(len(ds)):
        s = ds[i]
        out = forward(
            jnp.asarray(s["imgs"])[None],
            jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                   s["proj_matrices"]),
            jnp.asarray(s["depth_values"])[None])
        depths.append(np.asarray(out["depth"][0], np.float32))
        confs.append(np.asarray(out["photometric_confidence"][0],
                                np.float32))
        pm = np.asarray(s["proj_matrices"]["stage3"])
        extrs.append(pm[0, 0])
        intrs.append(pm[0, 1][:3, :3])

    verts = []
    for ref in range(len(ds)):
        srcs = [v for v in range(len(ds)) if v != ref]
        xyz, _, _, _, _ = filter_depth_views(
            depths[ref], confs[ref], np.zeros((H, W, 3), np.float32),
            intrs[ref], extrs[ref],
            [depths[v] for v in srcs], [intrs[v] for v in srcs],
            [extrs[v] for v in srcs],
            prob_threshold=PROB_THRES, num_consistent=NUM_CONSISTENT)
        verts.append(xyz)
    fused = np.concatenate(verts, axis=0)

    # exact GT cloud: unproject every view's analytic depth map (plane
    # z = depth0 + tilt·x in world == ref-cam frame)
    gt_pts = []
    K = scene["intrinsics"]
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    for v in range(V):
        E = scene["extrinsics"][v]
        d = scene["depths"][v].reshape(-1).astype(np.float64)
        cam = (np.linalg.inv(K) @ pix.T) * d
        world = np.linalg.inv(E) @ np.vstack([cam, np.ones_like(d)[None]])
        gt_pts.append(world[:3].T)
    gt = np.concatenate(gt_pts, axis=0)

    metrics = dtu_point_compare(fused, gt, dst=0.2)
    metrics["n_fused_raw"] = int(len(fused))
    if return_depths:
        return metrics, depths, confs, (intrs, extrs)
    return metrics


def golden():
    metrics = run_quality()
    GOLDEN_JSON.write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))
    print("wrote", GOLDEN_JSON)


UNSUP_CKPT = GOLDEN_DIR / "backbone_synth_unsup.msgpack"
UNSUP_JSON = GOLDEN_DIR / "e2e_quality_unsup.json"
# The supervised golden's baseline-8 scene has ~2.6 px full-res disparity
# (f·B/z = 192·8/600) — fine when GT supervises directly, but the
# PHOTOMETRIC loss is depth-insensitive below ~a pixel of disparity (the
# first unsup run's reconstr term sat at 1e-4 from step 0 and depth never
# moved), and the default 8×-upscaled texture is too smooth to
# discriminate sub-pixel disparity. The unsupervised golden therefore
# trains AND evaluates on a wider-baseline, sharper-texture instance of
# the same plane scene: B=48 → ~15 px disparity (~6 px variation across
# the depth range), tex_upscale=2. Loss-landscape check (CPU): stage-3
# loss at GT depth 0.117 < GT+5 0.199 < const-600 0.376 < GT+20 0.709.
UNSUP_BASELINE = 48.0
UNSUP_TEX_UPSCALE = 2


def build_samples_unsup(tmp="/tmp/golden_scan_unsup"):
    from rcmvsnet_tpu.data.dtu_test import DTUTestDataset
    from rcmvsnet_tpu.data.synthetic import write_synthetic_scan
    _, scene = write_synthetic_scan(tmp, H=H, W=W, V=V, seed=SEED,
                                    baseline=UNSUP_BASELINE,
                                    tex_upscale=UNSUP_TEX_UPSCALE)
    ds = DTUTestDataset(tmp, ["scan1"], nviews=V, ndepths=NDEPTH,
                        max_h=H, max_w=W)
    return ds, scene


def build_unsup_batches(scene, v_train=4, ndepth=NDEPTH, w_aug=0.01):
    """Per-reference-view TRAIN batches (full make_train_step key set) for
    the synthetic scene — the unsupervised analogue of the eval protocol's
    5 samples. View order per batch: [ref] + nearest (v_train−1) sources
    (mirroring dtu_train pair selection). GT depth/mask ride along for
    MONITORING only (train/step.py keeps them out of the gradient)."""
    from rcmvsnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    V = scene["images"].shape[0]
    K = scene["intrinsics"]
    rs = np.random.RandomState(123)
    batches = []
    for r in range(V):
        order = [r] + sorted((u for u in range(V) if u != r),
                             key=lambda u: abs(u - r))[:v_train - 1]
        raw = scene["images"][order]                       # [v, H, W, 3]
        imgs = (raw - IMAGENET_MEAN) / IMAGENET_STD
        gamma = rs.uniform(0.7, 1.4)
        imgs_aug = ((raw.clip(0, 1) ** gamma) - IMAGENET_MEAN) / IMAGENET_STD
        mean = raw.mean(axis=(1, 2), keepdims=True)
        var = raw.var(axis=(1, 2), keepdims=True)
        center = (raw - mean) / (np.sqrt(var) + 1e-8)

        proj = np.zeros((len(order), 2, 4, 4), np.float32)
        for i, v in enumerate(order):
            proj[i, 0] = scene["extrinsics"][v]
            proj[i, 1, :3, :3] = K
            proj[i, 1, :2] /= 4.0
        stage2 = proj.copy(); stage2[:, 1, :2] *= 2
        stage3 = proj.copy(); stage3[:, 1, :2] *= 4

        depth_values = np.linspace(scene["depth_min"], scene["depth_max"],
                                   ndepth, dtype=np.float32)
        w2cs = scene["extrinsics"][order]
        gt = scene["depths"][r]
        depth_ms = {f"stage{k+1}": gt[::sc, ::sc][None]
                    for k, sc in enumerate((4, 2, 1))}
        batches.append({
            "imgs": imgs[None].astype(np.float32),
            "imgs_aug": imgs_aug[None].astype(np.float32),
            "center_imgs": center[None].astype(np.float32),
            "proj_matrices": {"stage1": proj[None], "stage2": stage2[None],
                              "stage3": stage3[None]},
            "depth_values": depth_values[None],
            "depth": depth_ms,
            "mask": {k: np.ones_like(v) for k, v in depth_ms.items()},
            "w2cs": w2cs[None].astype(np.float32),
            "c2ws": np.linalg.inv(w2cs)[None].astype(np.float32),
            "intrinsics": np.broadcast_to(
                K[None], (len(order), 3, 3))[None].astype(np.float32).copy(),
            "near_fars": np.broadcast_to(
                np.asarray([scene["depth_min"], scene["depth_max"]],
                           np.float32)[None],
                (len(order), 2))[None].copy(),
            "w_aug": np.asarray(w_aug, np.float32),
        })
    return batches


def train_unsup(steps=4000, lr=1e-3, out=None):
    """Train the FULL unsupervised objective (photometric + aug + render
    consistency, one fused gradient, NO ground truth in the gradient —
    train/step.py == /root/reference/train_rcmvsnet.py:279-445) on the
    synthetic scene, cycling the 5 reference views. GT enters only the
    printed monitoring metrics."""
    import jax
    import jax.numpy as jnp
    import flax.serialization
    from rcmvsnet_tpu.config import Config, RunConfig
    from rcmvsnet_tpu.data.synthetic import make_synthetic_views
    from rcmvsnet_tpu.train.state import create_train_state
    from rcmvsnet_tpu.train.step import make_train_step

    scene = make_synthetic_views(H=H, W=W, V=V, seed=SEED,
                                 baseline=UNSUP_BASELINE,
                                 tex_upscale=UNSUP_TEX_UPSCALE)
    batches = build_unsup_batches(scene)
    spe = len(batches)
    epochs = steps // spe
    config = Config(run=RunConfig(
        lr=lr, warmup_iters=100,
        lr_milestone_epochs=(int(epochs * 0.6), int(epochs * 0.8),
                             int(epochs * 0.9))))
    state = create_train_state(config, batches[0], steps_per_epoch=spe,
                               rng=jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(config, steps_per_epoch=spe))
    batches = [jax.tree_util.tree_map(jnp.asarray, b) for b in batches]
    rng = jax.random.PRNGKey(42)
    for it in range(steps):
        state, metrics = step_fn(state, batches[it % spe],
                                 jax.random.fold_in(rng, it))
        if it % 200 == 0 or it == steps - 1:
            print(f"step {it}: loss {float(metrics['loss']):.4f} "
                  f"reconstr {float(metrics['reconstr_loss_stage3']):.4f} "
                  f"abs_err(GT monitor) "
                  f"{float(metrics['abs_depth_error']):.3f}", flush=True)

    GOLDEN_DIR.mkdir(exist_ok=True)
    out = Path(out) if out else UNSUP_CKPT
    blob = {"params": jax.device_get(state.params["cascade"]),
            "batch_stats": jax.device_get(state.batch_stats["cascade"])}
    out.write_bytes(flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, blob)))
    print("wrote", out)


def golden_unsup():
    ds, scene = build_samples_unsup()
    metrics = run_quality(ckpt_path=UNSUP_CKPT, ds=ds, scene=scene)
    UNSUP_JSON.write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))
    print("wrote", UNSUP_JSON)


def parity_train():
    """Fine-tune the golden backbone at the reference's own TRAIN
    resolution (512×640 — train_rcmvsnet.py datasets/dtu_train crops) so
    the PARITY study (scripts/parity_study.py) runs on meaningful depths
    at the DTU eval resolutions. (Fine-tuning at the 1152×864 EVAL res
    needs >36G HBM for the f32 supervised backward — the C=8 NDHWC conv
    temps pad 16× into the 128-lane axis; the conv features transfer
    across resolution for the plane scene, which is all the parity
    comparison needs.)"""
    train(steps=600, lr=3e-4, h=512, w=640, ndepth=192,
          out=GOLDEN_DIR / "backbone_parity.msgpack", init_ckpt=CKPT)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    {"train": train, "golden": golden, "parity_train": parity_train,
     "train_unsup": train_unsup, "golden_unsup": golden_unsup}[mode]()
