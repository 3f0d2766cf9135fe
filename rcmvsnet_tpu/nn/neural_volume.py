"""Neural volume encoder: backbone cost volume → 8-channel NeRF volume.

Parity target: Neural_Volume_Net at
/root/reference/models/render_models.py:736-760 — trilinear
(align_corners=True) resize of the stage-1 `volume_feature_no_ref`
([B, 48, H/4, W/4, 3(V−1)+32] channels-last here) to 128 depth planes, then
the no-ReLU conv+BN 3D U-Net (`CostReg(32+9, base=8)`).

The reference converts these BatchNorm2d instances via SyncBatchNorm
(train_rcmvsnet.py:524), which is what makes them accept 5-D input —
semantically BatchNorm3d, which is what TorchBatchNorm provides here.
"""
from __future__ import annotations

from flax import linen as nn

from ..ops.sampling import resize_trilinear
from .costreg import RenderCostReg


class NeuralVolumeNet(nn.Module):
    num_planes: int = 128
    base_channels: int = 8
    remat: bool = False  # nn.remat the U-Net under train (RunConfig.remat)
    # TRAIN fast path: the U-Net through the differentiable lanes convs
    # (ops/pallas_costreg_train.py); RenderCostReg falls back to XLA when
    # its own B=1 / 8-divisibility gate fails
    costreg_train_impl: str = "xla"
    # compute dtype of the resize + U-Net ('bfloat16' halves their HBM
    # traffic — the 48→128-plane resize alone materializes ~430 MB at f32);
    # the returned neural volume is cast back to float32, and BN statistics
    # are float32 regardless (RenderConfig.train_dtype)
    costreg_dtype: str | None = None

    @nn.compact
    def __call__(self, volume_feature, train: bool = False):
        """volume_feature: [B, D0, H, W, C] → [B, num_planes, H, W, base]."""
        B, D0, H, W, C = volume_feature.shape
        out_dtype = volume_feature.dtype
        if self.costreg_dtype:
            volume_feature = volume_feature.astype(self.costreg_dtype)
        vol = resize_trilinear(volume_feature, self.num_planes, H, W,
                               align_corners=True)
        RC = (nn.remat(RenderCostReg, static_argnums=(2,))
              if self.remat and train else RenderCostReg)
        out = RC(self.base_channels, train_impl=self.costreg_train_impl,
                 lanes_dtype=self.costreg_dtype,
                 name="cost_reg_2")(vol, train)
        return out.astype(out_dtype)
