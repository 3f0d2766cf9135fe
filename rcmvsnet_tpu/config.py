"""Typed configuration tree (replaces the reference's ~60 argparse flags
spread over three drivers — /root/reference/train_rcmvsnet.py:27-123,
eval_rcmvsnet_dtu.py:26-79, eval_rcmvsnet_tanks.py:29-89)."""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class BackboneConfig:
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: Tuple[float, ...] = (4.0, 2.0, 1.0)
    cr_base_chs: Tuple[int, ...] = (8, 8, 8)
    base_channels: int = 8
    grad_detach: bool = True
    # eval fast path: max bf16 source-feature bytes held in VMEM by the
    # Pallas warp kernel; 0 disables (CPU/tests). 17 MB covers all 3 DTU stages.
    pallas_warp_max_bytes: int = 0
    # y-band / row-group size: int = all stages, 3-tuple = per stage
    # (stage 1's C=32 crosses a 128-sublane MXU tile at band > 4, so a
    # tight stage-1 band halves its hat-matmul passes; see models/cascade)
    pallas_warp_band: int | Tuple[int, ...] = 24
    pallas_warp_rows: int | Tuple[int, ...] = 8
    # x-band columns per warp window: 0 = dense, int = all stages,
    # 3-tuple = per stage (probed per scan by the drivers)
    pallas_warp_xband: int | Tuple[int, ...] = 0
    # eval fast path: CostRegNet 3D convs via the Pallas channel-major
    # matmul kernel (ops/pallas_conv3d.py); False = XLA convs
    pallas_costreg: bool = False
    # eval fast path: fused softmax+depth_regression+confidence tail
    # (ops/pallas_tail.py); False = unfused XLA ops
    pallas_tail: bool = False
    # eval conv compute dtype ('bfloat16' for TPU speed); None = float32
    eval_dtype: Optional[str] = None
    # TRAIN conv/feature compute dtype for the backbone ('bfloat16' for
    # TPU speed; params, BN statistics, variance accumulation, depth
    # regression, losses and the render branch stay float32). None = f32.
    train_dtype: Optional[str] = None
    # TRAIN fast path: custom-VJP fused warp+variance kernel for
    # non-want_volume stages (ops/pallas_warp_train.py); gated by the
    # same pallas_warp_max_bytes/rows/band/xband ladder as eval
    pallas_warp_train: bool = False
    # TRAIN fast path: per-stage CostRegNet U-Nets through the
    # differentiable lanes convs (ops/pallas_costreg_train.py); gated on
    # B=1 and 8-divisible D/h/w per stage, XLA fallback otherwise
    pallas_costreg_train: bool = False


@dataclass(frozen=True)
class RenderConfig:
    n_rays: int = 1024
    n_samples: int = 128
    multires: int = 10
    net_depth: int = 6
    net_width: int = 128
    volume_channels: int = 8
    num_planes: int = 128
    net_type: str = "v0"  # 'v0' mult feat bias | 'v1' attention | 'v2' additive
    # NDC border squeeze for ray sampling (core/geometry.py world_to_ndc),
    # matching render_utils.py:112-146. The reference's corresponding
    # VOLUME-side pad is dead AND broken there (casmvsnet.py:58-61 assigns
    # an [H+2p, W+2p] slice into an [H, W] buffer — crashes for pad>0, and
    # no call site ever passes pad≠0), so only the ray side is functional.
    pad: int = 0
    # TRAIN fast path: the neural-volume RenderCostReg U-Net through the
    # differentiable lanes convs (ops/pallas_costreg_train.py)
    pallas_costreg_train: bool = False
    # compute dtype of the neural-volume U-Net under training
    # ('bfloat16' halves its conv + layout traffic; BN stats, the MLP,
    # ray sampling, compositing and all ray losses stay float32). None=f32.
    train_dtype: Optional[str] = None
    # ray-major trilinear neural-volume lookup (TPU fast path — see
    # models/render_net.py); exact for ref-camera rays, ~1 ulp coordinate
    # drift vs the per-sample gather
    ray_major_lookup: bool = False


@dataclass(frozen=True)
class LossConfig:
    dlossw: Tuple[float, ...] = (0.5, 1.0, 2.0)
    w_aug: float = 0.01


@dataclass(frozen=True)
class DataConfig:
    datapath: str = ""
    train_list: str = "lists/dtu/train.txt"
    val_list: str = "lists/dtu/val.txt"
    test_list: str = "lists/dtu/test.txt"
    num_views: int = 4          # 1 ref + 3 src (train)
    eval_num_views: int = 5
    numdepth: int = 192
    interval_scale: float = 1.06
    max_h: int = 1200
    max_w: int = 1600


@dataclass(frozen=True)
class RunConfig:
    epochs: int = 15
    lr: float = 1e-4
    lr_milestone_epochs: Tuple[int, ...] = (10, 12, 14)
    lr_gamma: float = 0.5
    warmup_iters: int = 500
    warmup_factor: float = 1.0 / 3.0
    weight_decay: float = 0.0
    batch_size: int = 1          # per device
    # rematerialize the three training sub-passes (clean/aug/render) and
    # the heavy conv blocks (FeatureNet, CostRegNet, RenderCostReg) during
    # backward. Trades ~1/3 recompute FLOPs for fitting the reference train
    # shapes (512×640, B=1, V=4) in one chip's HBM: without it XLA keeps
    # every pass's conv residuals live across the fused gradient and the
    # small-channel (C=8) cost volumes pad 16× in the 128-lane axis.
    remat: bool = True
    # additionally nn.remat the heavy conv modules INSIDE each pass.
    # Stacked on the pass-level checkpoint this recomputes every U-Net /
    # FeatureNet forward TWICE during backward (3 executions total — the
    # round-5 trace shows each lanes conv 3x per step); it buys the lowest
    # peak HBM. False keeps only the pass-level checkpoint: one recompute,
    # ~17% faster steps at the reference train shapes, still fits v5e HBM
    # (measured round 5). Ignored when remat=False.
    remat_modules: bool = True
    seed: int = 1
    logdir: str = "./rc-mvsnet"
    save_freq: int = 1
    eval_freq: int = 1
    summary_freq: int = 10
    n_devices: Optional[int] = None


@dataclass(frozen=True)
class Config:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)
