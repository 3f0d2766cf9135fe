"""3D U-Net cost regularizers.

Parity targets:
  * CostRegNet at /root/reference/models/modules.py:470-501 — conv+BN+ReLU
    encoder (8→16→32→64 with stride-2 downs), transpose-conv ups with
    additive skips, final 1-channel conv (no BN / bias).
  * The rendering branch's CostReg at
    /root/reference/models/render_models.py:690-734 — same topology but its
    ConvBnReLU3D blocks apply **no ReLU** (conv+BN only, despite the name)
    and the output is `base_channels` wide (the 8-channel neural volume).

Volumes are [B, D, H, W, C] (NDHWC).
"""
from __future__ import annotations

from flax import linen as nn

from .layers import ConvBNAct, DeconvBNAct, PlainConv


class CostRegNet(nn.Module):
    base_channels: int = 8
    # 'pallas3d' routes every conv through the channel-major Pallas kernel
    # (ops/pallas_conv3d.py) on the eval path; train always uses XLA (the
    # kernel has no custom VJP). Param tree is identical either way.
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        k, s1, s2, p = (3, 3, 3), (1, 1, 1), (2, 2, 2), (1, 1, 1)
        impl = self.conv_impl if not train else "xla"
        conv = lambda f, s, name: ConvBNAct(f, k, s, p, name=name,
                                            conv_impl=impl)
        deconv = lambda f, name: DeconvBNAct(f, k, s2, p, (1, 1, 1),
                                             name=name, conv_impl=impl)
        conv0 = conv(c, s1, "conv0")(x, train)
        conv2 = conv(c * 2, s1, "conv2")(
            conv(c * 2, s2, "conv1")(conv0, train), train)
        conv4 = conv(c * 4, s1, "conv4")(
            conv(c * 4, s2, "conv3")(conv2, train), train)
        x = conv(c * 8, s1, "conv6")(
            conv(c * 8, s2, "conv5")(conv4, train), train)
        x = conv4 + deconv(c * 4, "conv7")(x, train)
        x = conv2 + deconv(c * 2, "conv9")(x, train)
        x = conv0 + deconv(c, "conv11")(x, train)
        return PlainConv(1, k, p, use_bias=False, name="prob",
                         conv_impl=impl)(x)


class RenderCostReg(nn.Module):
    """The no-ReLU conv+BN variant used by NeuralVolumeNet (output: C=base)."""
    base_channels: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        k, s1, s2, p = (3, 3, 3), (1, 1, 1), (2, 2, 2), (1, 1, 1)

        def block(feat, stride, name):
            def fn(y):
                return ConvBNAct(feat, k, stride, p, relu=False, name=name)(y, train)
            return fn

        conv0 = block(c, s1, "conv0")(x)
        conv2 = block(c * 2, s1, "conv2")(block(c * 2, s2, "conv1")(conv0))
        conv4 = block(c * 4, s1, "conv4")(block(c * 4, s2, "conv3")(conv2))
        x = block(c * 8, s1, "conv6")(block(c * 8, s2, "conv5")(conv4))
        x = conv4 + DeconvBNAct(c * 4, k, s2, p, (1, 1, 1), relu=False,
                                name="conv7")(x, train)
        x = conv2 + DeconvBNAct(c * 2, k, s2, p, (1, 1, 1), relu=False,
                                name="conv9")(x, train)
        x = conv0 + DeconvBNAct(c, k, s2, p, (1, 1, 1), relu=False,
                                name="conv11")(x, train)
        return x
