"""Analytic MXU FLOP counts for the cascade/render compute paths → MFU.

Counts 2·N·Ci·Co·K multiply-accumulate FLOPs for every conv / dense /
hat-matmul actually executed — the operations that land on the MXU. Not
counted (VPU / bandwidth-bound, negligible or non-matmul): BN/ReLU,
softmax + depth-regression tail, bilinear gathers on the XLA warp path,
resizes, ray sampling, and the lane-padding waste of the Pallas layouts
(wp vs w — the reported MFU is therefore a slight LOWER bound on actual
MXU occupancy for the fused path).

Model structure mirrored from nn/featurenet.py, nn/costreg.py, nn/mlp.py
and the fused warp's hat contraction (ops/pallas_warp2.py: one
[band·C, x_e] @ [x_e, R·x_tile] matmul per (view, plane, row-group,
x-tile) ⇒ 2·band·C·x_e per output lane). Reference topology:
/root/reference/models/modules.py:363-501, render_models.py:143-220,690-760.
"""
from __future__ import annotations

STAGE_SCALES = (4, 2, 1)

# TPU v5e (v5 lite) dense peak: 197 TFLOP/s bf16 (public spec). XLA f32
# convs run through MXU passes at a fraction of this; all rates here are
# reported on the bf16-peak basis and labelled as such.
PEAK_BF16_FLOPS = 197e12


def conv_flops(n_spatial_out: int, ci: int, co: int, k: int) -> float:
    """2·N·Ci·Co·K for a dense conv evaluated at N output positions."""
    return 2.0 * n_spatial_out * ci * co * k


def featurenet_flops(H: int, W: int, c: int = 8) -> float:
    """One image through the FPN (nn/featurenet.py)."""
    n, n2, n4 = H * W, (H // 2) * (W // 2), (H // 4) * (W // 4)
    f = conv_flops(n, 3, c, 9) + conv_flops(n, c, c, 9)
    f += conv_flops(n2, c, 2 * c, 25) + 2 * conv_flops(n2, 2 * c, 2 * c, 9)
    f += conv_flops(n4, 2 * c, 4 * c, 25) + 2 * conv_flops(n4, 4 * c, 4 * c, 9)
    f += conv_flops(n4, 4 * c, 4 * c, 1)                      # out1
    f += conv_flops(n2, 2 * c, 4 * c, 1) + conv_flops(n2, 4 * c, 2 * c, 9)
    f += conv_flops(n, c, 4 * c, 1) + conv_flops(n, 4 * c, c, 9)
    return f


def costreg_flops(D: int, h: int, w: int, ci: int, c: int = 8,
                  with_prob: bool = True, out_c: int | None = None) -> float:
    """The 3-level 3D U-Net (CostRegNet; RenderCostReg with
    with_prob=False, out_c=c shares the topology). Transpose convs are
    counted input-voxel-based (each input element feeds k³ outputs)."""
    n = D * h * w
    f = conv_flops(n, ci, c, 27)                              # conv0
    f += conv_flops(n // 8, c, 2 * c, 27) + conv_flops(n // 8, 2 * c, 2 * c, 27)
    f += conv_flops(n // 64, 2 * c, 4 * c, 27) + conv_flops(n // 64, 4 * c, 4 * c, 27)
    f += conv_flops(n // 512, 4 * c, 8 * c, 27) + conv_flops(n // 512, 8 * c, 8 * c, 27)
    f += conv_flops(n // 512, 8 * c, 4 * c, 27)               # deconv7
    f += conv_flops(n // 64, 4 * c, 2 * c, 27)                # deconv9
    f += conv_flops(n // 8, 2 * c, c, 27)                     # deconv11
    if with_prob:
        f += conv_flops(n, c, 1, 27)
    return f


def fused_warp_flops(D: int, h: int, w: int, C: int, views: int,
                     band: int, x_band: int | None) -> float:
    """Executed hat-matmul FLOPs of the fused warp+variance kernel for one
    stage: (V−1) source views (the reference view is a copy), every output
    lane of every plane contracts a [band·C, x_e] window."""
    wp = -(-(w + 2) // 128) * 128          # padded lane row (pallas_costreg)
    x_e = x_band if (x_band and x_band < w) else -(-w // 128) * 128
    return 2.0 * (views - 1) * D * h * wp * band * C * x_e


def nerf_mlp_flops(n_pts: int, in_pts: int = 63, feat: int = 20,
                   width: int = 128, depth: int = 6, skips=(4,)) -> float:
    """NerfMLP (v0) dense layers per sample point × n_pts."""
    f = 2.0 * feat * width                                    # pts_bias
    d_in = in_pts
    for i in range(depth):
        f += 2.0 * d_in * width
        d_in = width + (in_pts if i in skips else 0)
    f += 2.0 * width * 1 + 2.0 * width * width                # alpha, feature
    f += 2.0 * (width + 3) * (width // 2) + 2.0 * (width // 2) * 3
    return f * n_pts


def eval_forward_flops(H: int, W: int, views: int,
                       ndepths=(48, 32, 8), c: int = 8,
                       feat_chs=(32, 16, 8),
                       band=(4, 4, 4), x_band=(256, 256, 256),
                       fused: bool = True) -> float:
    """One DTU-protocol eval forward (B=1) on the fused TPU path."""
    f = views * featurenet_flops(H, W, c)
    for i, (D, C) in enumerate(zip(ndepths, feat_chs)):
        sc = STAGE_SCALES[i]
        h, w = H // sc, W // sc
        if fused:
            b = band[i] if isinstance(band, (tuple, list)) else band
            xb = x_band[i] if isinstance(x_band, (tuple, list)) else x_band
            f += fused_warp_flops(D, h, w, C, views, b, xb)
        f += costreg_flops(D, h, w, C, c)
    return f


def train_step_flops(H: int, W: int, views: int, ndepths=(48, 32, 8),
                     c: int = 8, feat_chs=(32, 16, 8),
                     n_rays: int = 1024, n_samples: int = 128,
                     volume_planes: int = 128) -> float:
    """One fused train step (B=1): clean + aug cascade forwards, render
    forward, and the backward pass (2× forward for matmul ops — standard
    fwd/bwd accounting). The XLA gather warp contributes no MXU matmuls
    and is excluded (it is bandwidth-, not FLOP-bound)."""
    fwd = 2 * views * featurenet_flops(H, W, c)     # clean + aug passes
    for i, (D, C) in enumerate(zip(ndepths, feat_chs)):
        sc = STAGE_SCALES[i]
        fwd += 2 * costreg_flops(D, H // sc, W // sc, C, c)
    # render branch: NeuralVolumeNet CostReg over (volume_planes, H/4, W/4)
    # on the 41-ch no-ref volume, then the MLP over n_rays·n_samples points
    fwd += costreg_flops(volume_planes, H // 4, W // 4, 3 * (views - 1) + 32,
                         c, with_prob=False)
    fwd += nerf_mlp_flops(n_rays * n_samples)
    return 3.0 * fwd
