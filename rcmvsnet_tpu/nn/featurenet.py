"""FPN feature extractor: 3-scale pyramid, strides 1/2/4.

Parity target: FeatureNet(arch_mode='fpn', base_channels=8, num_stage=3) at
/root/reference/models/modules.py:363-464. Outputs (channels-last):
  stage1: [B, H/4, W/4, 4·base]   stage2: [B, H/2, W/2, 2·base]
  stage3: [B, H, W, base]
The FPN top-down path uses torch-'nearest' ×2 upsampling and 1×1 lateral
convs with bias, exactly as the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import resize_nearest
from .layers import ConvBNAct, PlainConv


class RefineNet(nn.Module):
    """Residual depth refiner: conv(img ⊕ depth) → depth residual.

    Parity target: RefineNet at /root/reference/models/modules.py:504-516
    (dead code there — `refine=False` everywhere, and its `F.cat` call would
    crash if enabled; implemented working here for capability parity,
    gated by CascadeMVSNet(refine=True)).
    """

    @nn.compact
    def __call__(self, img, depth_init, train: bool = False):
        """img: [B, H, W, 3]; depth_init: [B, H, W] → refined [B, H, W]."""
        x = jnp.concatenate([img, depth_init[..., None]], axis=-1)
        for i in range(3):
            x = ConvBNAct(32, (3, 3), (1, 1), (1, 1), name=f"conv{i+1}")(x, train)
        residual = ConvBNAct(1, (3, 3), (1, 1), (1, 1), name="res")(x, train)
        return depth_init + residual[..., 0]


class FeatureNet(nn.Module):
    base_channels: int = 8
    num_stage: int = 3

    @property
    def out_channels(self):
        return [4 * self.base_channels, 2 * self.base_channels,
                self.base_channels][: self.num_stage]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        conv0 = ConvBNAct(c, (3, 3), (1, 1), (1, 1), name="conv0_0")(x, train)
        conv0 = ConvBNAct(c, (3, 3), (1, 1), (1, 1), name="conv0_1")(conv0, train)

        conv1 = ConvBNAct(c * 2, (5, 5), (2, 2), (2, 2), name="conv1_0")(conv0, train)
        conv1 = ConvBNAct(c * 2, (3, 3), (1, 1), (1, 1), name="conv1_1")(conv1, train)
        conv1 = ConvBNAct(c * 2, (3, 3), (1, 1), (1, 1), name="conv1_2")(conv1, train)

        conv2 = ConvBNAct(c * 4, (5, 5), (2, 2), (2, 2), name="conv2_0")(conv1, train)
        conv2 = ConvBNAct(c * 4, (3, 3), (1, 1), (1, 1), name="conv2_1")(conv2, train)
        conv2 = ConvBNAct(c * 4, (3, 3), (1, 1), (1, 1), name="conv2_2")(conv2, train)

        intra = conv2
        outputs = {"stage1": PlainConv(c * 4, (1, 1), use_bias=False, name="out1")(intra)}
        if self.num_stage >= 2:
            h, w = intra.shape[1] * 2, intra.shape[2] * 2
            intra = resize_nearest(intra, h, w) + PlainConv(
                c * 4, (1, 1), use_bias=True, name="inner1")(conv1)
            outputs["stage2"] = PlainConv(c * 2, (3, 3), (1, 1), use_bias=False,
                                          name="out2")(intra)
        if self.num_stage >= 3:
            h, w = intra.shape[1] * 2, intra.shape[2] * 2
            intra = resize_nearest(intra, h, w) + PlainConv(
                c * 4, (1, 1), use_bias=True, name="inner2")(conv0)
            outputs["stage3"] = PlainConv(c, (3, 3), (1, 1), use_bias=False,
                                          name="out3")(intra)
        return outputs
