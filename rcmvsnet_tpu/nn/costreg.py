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

import functools

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBNAct, DeconvBNAct, PlainConv, torch_kernel_init)


class _KernelP(nn.Module):
    """Declares a conv kernel param only (for the lanes fast path, which
    computes outside flax but must own the identical param tree)."""
    shape: tuple
    fan_in: int | None = None

    @nn.compact
    def __call__(self):
        init = (functools.partial(torch_kernel_init, fan_in=self.fan_in)
                if self.fan_in else torch_kernel_init)
        return self.param("kernel", init, self.shape)


class _BNP(nn.Module):
    """Declares TorchBatchNorm's params + running stats without computing."""
    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean.value, var.value


class _PlainP(nn.Module):
    """Param mirror of PlainConv (kernel under Conv_0, no BN/bias)."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return _KernelP(self.shape, name="Conv_0")()


class _LanesBlockP(nn.Module):
    """Param mirror of one ConvBNAct/DeconvBNAct block; returns the
    BN-folded (kernel, bias) consumed by ops.pallas_costreg."""
    ci: int
    co: int
    deconv: bool = False

    @nn.compact
    def __call__(self):
        from ..ops.pallas_costreg import fold_bn
        if self.deconv:
            # DeconvBNAct stores the kernel at block level with torch's
            # transpose-conv fan_in = out_ch * prod(k)
            init = functools.partial(torch_kernel_init,
                                     fan_in=self.co * 27)
            kernel = self.param("kernel", init, (3, 3, 3, self.ci, self.co))
        else:
            kernel = _KernelP((3, 3, 3, self.ci, self.co), name="Conv_0")()
        scale, bias, mean, var = _BNP(self.co, name="TorchBatchNorm_0")()
        return fold_bn(kernel, scale, bias, mean, var)


class CostRegNet(nn.Module):
    base_channels: int = 8
    # 'pallas3d' routes every conv through the channel-major Pallas kernel
    # (ops/pallas_conv3d.py) on the eval path; 'lanes' runs the whole U-Net
    # in the persistent channel-major layout (ops/pallas_costreg.py — no
    # per-layer layout conversion); train always uses XLA (the kernels have
    # no custom VJP). Param tree is identical across impls.
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False, lanes_dims=None):
        c = self.base_channels
        k, s1, s2, p = (3, 3, 3), (1, 1, 1), (2, 2, 2), (1, 1, 1)
        impl = self.conv_impl if not train else "xla"
        if impl == "lanes":
            from ..ops.pallas_costreg import costreg_lanes
            ci = lanes_dims[-1] if lanes_dims is not None else x.shape[-1]
            blk = lambda ci_, co_, dec, name: _LanesBlockP(
                ci_, co_, dec, name=name)()
            folded = {
                "conv0": blk(ci, c, False, "conv0"),
                "conv1": blk(c, c * 2, False, "conv1"),
                "conv2": blk(c * 2, c * 2, False, "conv2"),
                "conv3": blk(c * 2, c * 4, False, "conv3"),
                "conv4": blk(c * 4, c * 4, False, "conv4"),
                "conv5": blk(c * 4, c * 8, False, "conv5"),
                "conv6": blk(c * 8, c * 8, False, "conv6"),
                "conv7": blk(c * 8, c * 4, True, "conv7"),
                "conv9": blk(c * 4, c * 2, True, "conv9"),
                "conv11": blk(c * 2, c, True, "conv11"),
                "prob": (_PlainP((3, 3, 3, c, 1), name="prob")(),
                         jnp.zeros((1,), jnp.float32)),
            }
            return costreg_lanes(x, folded, lanes_dims=lanes_dims)[..., None]
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
