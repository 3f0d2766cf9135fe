"""Training driver: unsupervised RC-MVSNet on DTU, data-parallel over the
device mesh.

Replaces /root/reference/train_rcmvsnet.py (mp.spawn/DDP loop) with one
process jitting the fused train step over a jax.sharding Mesh. Per-epoch:
checkpoint both artifacts, run the supervised validation loop.

Usage:
  python -m rcmvsnet_tpu.cli.train --trainpath /data/dtu \
      --logdir ./rc-mvsnet [--epochs 15] [--batch_size 1] [--resume]
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig, Config, DataConfig, LossConfig, RenderConfig, RunConfig
from ..data.dtu_train import DTUTrainDataset
from ..data.dtu_val import DTUValDataset
from ..data.loader import DataLoader
from ..losses.aug import adjust_w_aug
from ..parallel.mesh import (initialize_multihost, is_main_process,
                             make_mesh, replicate, shard_batch)
from ..train.checkpoint import restore_checkpoint, save_checkpoint
from ..train.logging import DictAverageMeter, MetricLogger
from ..train.state import create_train_state
from ..train.step import make_train_step, make_val_step


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native RC-MVSNet training")
    p.add_argument("--trainpath", required=True)
    p.add_argument("--testpath", default=None)
    p.add_argument("--trainlist", default="lists/dtu/train.txt")
    p.add_argument("--testlist", default="lists/dtu/test.txt")
    p.add_argument("--logdir", default="./rc-mvsnet")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lrepochs", default="10,12,14:2",
                   help="'e1,e2,..:g' — scale lr by 1/g at those epochs "
                        "(reference train_rcmvsnet.py:40,131-132)")
    p.add_argument("--wd", type=float, default=0.0,
                   help="L2-into-gradient weight decay (torch Adam style)")
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--grad_method", default="detach",
                   choices=["detach", "undetach"])
    p.add_argument("--train_dtype", default=None,
                   choices=[None, "bfloat16"],
                   help="mixed-precision backbone compute (params/BN/"
                        "losses stay f32); None = float32")
    p.add_argument("--net_type", default="v0", choices=["v0", "v1", "v2"],
                   help="renderer MLP variant (v0 mult-bias / v1 attention "
                        "/ v2 additive)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-device batch size")
    p.add_argument("--num_view", type=int, default=3)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,2,1")
    p.add_argument("--dlossw", default="0.5,1.0,2.0")
    p.add_argument("--cr_base_chs", default="8,8,8")
    p.add_argument("--w_aug", type=float, default=0.01)
    p.add_argument("--n_rays", type=int, default=1024)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--random_seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=10)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host jax.distributed run with "
                        "cluster autodetection (TPU pods, SLURM) — no "
                        "explicit rendezvous flags needed")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 — joins a multi-host "
                        "jax.distributed run (DCN); the reference's "
                        "init_process_group rendezvous "
                        "(train_rcmvsnet.py:503-505)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--no_pallas", action="store_true",
                   help="disable the fused Pallas train warp kernel "
                        "(default: on-TPU, enabled when the band-coverage "
                        "probe over every training camera passes)")
    p.add_argument("--no_remat", action="store_true",
                   help="disable sub-pass/U-Net rematerialization (faster "
                        "when the shapes fit HBM without it; the default "
                        "remat is what fits the reference 512x640 train "
                        "config on one chip)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="cap steps/epoch (debug/smoke runs)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N train steps "
                        "(starting at step 3) into <logdir>/profile")
    return p.parse_args(argv)


def config_from_args(a) -> Config:
    csv = lambda s, t: tuple(t(x) for x in s.split(",") if x)
    milestones_str, _, gamma_str = a.lrepochs.partition(":")
    return Config(
        backbone=BackboneConfig(ndepths=csv(a.ndepths, int),
                                depth_intervals_ratio=csv(a.depth_inter_r, float),
                                cr_base_chs=csv(a.cr_base_chs, int),
                                grad_detach=a.grad_method == "detach",
                                train_dtype=a.train_dtype),
        render=RenderConfig(n_rays=a.n_rays, n_samples=a.n_samples,
                            net_type=a.net_type),
        loss=LossConfig(dlossw=csv(a.dlossw, float), w_aug=a.w_aug),
        data=DataConfig(datapath=a.trainpath, train_list=a.trainlist,
                        test_list=a.testlist, num_views=a.num_view + 1,
                        numdepth=a.numdepth, interval_scale=a.interval_scale),
        run=RunConfig(epochs=a.epochs, lr=a.lr, batch_size=a.batch_size,
                      lr_milestone_epochs=csv(milestones_str, int),
                      lr_gamma=1.0 / float(gamma_str or 2.0),
                      weight_decay=a.wd,
                      save_freq=a.save_freq, eval_freq=a.eval_freq,
                      seed=a.random_seed, logdir=a.logdir,
                      summary_freq=a.summary_freq, n_devices=a.n_devices,
                      remat=not a.no_remat))


def _host_image(v):
    """Host-transfer a summary image batch. Multi-process runs shard the
    batch axis across hosts, so the global array is not fully addressable;
    take the first process-local shard — rank 0 logs its own first sample,
    the reference's DDP rank-0 save_images semantics (utils.py:83-100)."""
    if getattr(v, "is_fully_addressable", True):
        return np.asarray(v)
    return np.asarray(v.addressable_shards[0].data)


def main(argv=None):
    args = parse_args(argv)
    config = config_from_args(args)

    if (args.multihost or args.coordinator_address is not None
            or args.num_processes is not None
            or args.process_id is not None):
        # partial flag sets fall through to jax's own validation/autodetect
        initialize_multihost(coordinator_address=args.coordinator_address,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
    n_proc = jax.process_count()
    rank0 = is_main_process()

    if n_proc > 1 and config.run.n_devices not in (None, jax.device_count()):
        raise SystemExit(
            f"--n_devices {config.run.n_devices} would subset the global "
            f"mesh ({jax.device_count()} devices) in a {n_proc}-process "
            "run, stranding other processes' devices; omit it (each "
            "process contributes all of its local devices)")
    mesh = make_mesh(config.run.n_devices)
    n_dev = mesh.devices.size
    global_batch = config.run.batch_size * n_dev
    if global_batch % n_proc:
        raise SystemExit(f"global batch {global_batch} not divisible by "
                         f"{n_proc} processes")
    local_batch = global_batch // n_proc
    if rank0:
        print(f"mesh: {n_dev} devices / {n_proc} process(es), "
              f"global batch {global_batch}")

    if args.trainpath == "synthetic":
        # smoke-test mode: textured-plane scenes, no DTU on disk
        from ..data.synthetic_dataset import SyntheticDataset
        config = config.replace(render=dataclasses.replace(
            config.render, n_rays=min(config.render.n_rays, 128),
            n_samples=min(config.render.n_samples, 32), num_planes=32))
        train_ds = SyntheticDataset(n_samples=8 * global_batch,
                                    nviews=config.data.num_views,
                                    ndepths=config.data.numdepth,
                                    seed=config.run.seed)
        val_ds = SyntheticDataset(n_samples=2 * global_batch,
                                  nviews=config.data.num_views,
                                  ndepths=config.data.numdepth,
                                  seed=config.run.seed + 1000)
    else:
        train_ds = DTUTrainDataset(args.trainpath, args.trainlist,
                                   nviews=config.data.num_views,
                                   ndepths=config.data.numdepth,
                                   interval_scale=config.data.interval_scale,
                                   seed=config.run.seed)
        val_ds = DTUValDataset(args.testpath or args.trainpath, args.testlist,
                               nviews=config.data.eval_num_views,
                               ndepths=config.data.numdepth,
                               interval_scale=config.data.interval_scale)
    # TRAIN fast path: the custom-VJP fused warp+variance kernel replaces
    # the XLA gather warp (+ scatter backward) on covered stages — 2.6x
    # the step rate at the reference config. Probed over every unique
    # training camera (sample_cams_all covers all scan/light/src-subset
    # samples); the probe is deterministic from the shared cam files, so
    # every process picks the same jit program in multi-host runs.
    if (jax.default_backend() == "tpu" and not args.no_pallas
            and hasattr(train_ds, "sample_cams_all")):
        import types

        from .eval_dtu import pick_fast_path
        max_bytes, band, rows, xband = pick_fast_path(
            types.SimpleNamespace(no_pallas=False, ndepths=args.ndepths,
                                  depth_inter_r=args.depth_inter_r),
            train_ds.sample_cams_all())
        if max_bytes:
            config = config.replace(
                backbone=dataclasses.replace(
                    config.backbone, pallas_warp_max_bytes=max_bytes,
                    pallas_warp_band=band, pallas_warp_rows=rows,
                    pallas_warp_xband=xband, pallas_warp_train=True,
                    pallas_costreg_train=True),
                # render-branch fast paths: lanes U-Net convs, the U-Net
                # compute dtype following --train_dtype, and the ray-major
                # volume lookup (exact for ref-camera rays)
                render=dataclasses.replace(
                    config.render, pallas_costreg_train=True,
                    train_dtype=args.train_dtype,
                    ray_major_lookup=True))

    # each process loads only its shard of the global batch
    # (DistributedSampler semantics, train_rcmvsnet.py:592-600)
    pidx = jax.process_index()
    train_loader = DataLoader(train_ds, local_batch, shuffle=True,
                              seed=config.run.seed,
                              process_index=pidx, process_count=n_proc)
    # drop_last whenever the batch axis is sharded: a partial final batch
    # isn't divisible by the device count (P('data') placement fails), and
    # in multi-process runs it would desync collective counts
    val_loader = DataLoader(val_ds, local_batch, shuffle=False,
                            drop_last=n_proc > 1 or n_dev > 1,
                            process_index=pidx, process_count=n_proc)
    steps_per_epoch = len(train_loader)
    if args.max_steps:
        steps_per_epoch = min(steps_per_epoch, args.max_steps)

    rng = jax.random.PRNGKey(config.run.seed)
    rng, init_rng = jax.random.split(rng)
    # flax init depends on input SHAPES and the rng only, so a local-batch
    # sample yields identical parameters on every process
    sample = next(iter(DataLoader(train_ds, local_batch, shuffle=False,
                                  process_index=pidx,
                                  process_count=n_proc)))
    state = create_train_state(config, sample, steps_per_epoch, init_rng)
    start_epoch = 0
    if args.resume:
        state, start_epoch = restore_checkpoint(config.run.logdir, state)
        if rank0:
            print(f"resumed at epoch {start_epoch}")
        if n_proc > 1:
            # replicate() assembles per-process values with NO cross-process
            # consistency check; a rank that restored a different (or no)
            # checkpoint — e.g. non-shared logdirs — would train on silently
            # inconsistent weights or deadlock on mismatched epoch ranges.
            from jax.experimental import multihost_utils
            leaves = jax.tree_util.tree_leaves(state.params)
            probe = np.array(
                [float(start_epoch), float(int(state.step))]
                + [float(np.abs(np.asarray(l)).sum()) for l in leaves[:8]],
                np.float64)
            gathered = np.asarray(multihost_utils.process_allgather(probe))
            if not np.allclose(gathered, gathered[0]):
                raise SystemExit(
                    "multi-host --resume restored inconsistent state across "
                    "processes (epoch/params differ) — all ranks must read "
                    f"the same logdir checkpoint:\n{gathered}")

    train_step = jax.jit(make_train_step(config, steps_per_epoch,
                                         with_images=True))
    val_step = jax.jit(make_val_step(config))
    # rank-0-only observability, matching the reference's
    # dist.get_rank()==0 guard (train_rcmvsnet.py:151)
    logger = MetricLogger(config.run.logdir) if rank0 else None
    profile_until = None

    with mesh:
        state = replicate(state, mesh)
        for epoch in range(start_epoch, config.run.epochs):
            train_loader.set_epoch(epoch)
            w_aug = adjust_w_aug(epoch, config.loss.w_aug)
            meter = DictAverageMeter()
            gstep0 = epoch * steps_per_epoch
            for step_idx, batch in enumerate(train_loader):
                if args.max_steps and step_idx >= args.max_steps:
                    break
                t0 = time.time()
                sharded = shard_batch(batch, mesh)
                sharded["w_aug"] = jnp.asarray(w_aug, jnp.float32)
                rng, step_rng = jax.random.split(rng)
                if args.profile_steps and step_idx == 3 and epoch == start_epoch:
                    jax.profiler.start_trace(f"{config.run.logdir}/profile")
                    profile_until = gstep0 + step_idx + args.profile_steps
                state, metrics = train_step(state, sharded, step_rng)
                # host-mirrored step counter: int(state.step) would force
                # a blocking device sync EVERY step, serializing dispatch
                # (the optimizer applies exactly one increment per call)
                gstep = gstep0 + step_idx + 1
                if (step_idx == 0 and epoch == start_epoch
                        and "warp_violations" in metrics):
                    # first step only (one device sync): a nonzero count
                    # means the fused train warp kernel's probed band does
                    # not cover this dataset's geometry — corrupted taps
                    # AND gradients. Eval drivers already fail loudly;
                    # training must too.
                    wv = float(metrics["warp_violations"])
                    if wv:
                        raise RuntimeError(
                            f"fused train warp kernel reported {wv:.0f} "
                            "band-coverage violations on the first step — "
                            "the (rows, band, xband) config does not cover "
                            "this geometry; widen the band or disable "
                            "pallas_warp_train")
                if profile_until is not None and gstep > profile_until:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics["loss"])
                    jax.profiler.stop_trace()
                    profile_until = None
                    print(f"profile trace -> {config.run.logdir}/profile")
                images = metrics.pop("images", None)
                if rank0 and gstep % config.run.summary_freq == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host["step_time"] = time.time() - t0
                    logger.log("train", host, gstep)
                    if images is not None:
                        logger.log_images(
                            "train",
                            {k: _host_image(v) for k, v in images.items()},
                            gstep)
                    meter.update(host)
                    print(f"epoch {epoch} step {step_idx}/{steps_per_epoch} "
                          f"loss {host['loss']:.3f} "
                          f"time {host['step_time']:.2f}s")
            if profile_until is not None:
                # epoch ended mid-trace (profile_steps > steps left):
                # flush now rather than record checkpointing + validation
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics["loss"])
                jax.profiler.stop_trace()
                profile_until = None
                print(f"profile trace -> {config.run.logdir}/profile")
            gstep = (epoch + 1) * steps_per_epoch
            if rank0 and meter.count:
                # epoch mean over the summary-step SAMPLES (the reference
                # averages every step, but float()ing metrics each step
                # forces a device sync that serializes dispatch — see the
                # gstep comment above)
                logger.log("fulltrain", meter.mean(), gstep)
                if (epoch + 1) % config.run.save_freq == 0:
                    # state is fully replicated: rank 0 holds every leaf
                    save_checkpoint(config.run.logdir,
                                    jax.device_get(state), epoch)

            # supervised validation (monitoring only; reference
            # train_rcmvsnet.py:230 eval_freq gate)
            if (epoch % config.run.eval_freq == 0
                    or epoch == config.run.epochs - 1):
                vmeter = DictAverageMeter()
                for vi, batch in enumerate(val_loader):
                    if args.max_steps and vi >= args.max_steps:
                        break
                    sharded = shard_batch(batch, mesh)
                    vmetrics = val_step(state, sharded)
                    vmeter.update({k: float(v) for k, v in vmetrics.items()})
                if rank0:
                    logger.log("fulltest", vmeter.mean(), gstep)
                    print(f"epoch {epoch} val: {vmeter.mean()}")
    if rank0:
        logger.close()


if __name__ == "__main__":
    main()
