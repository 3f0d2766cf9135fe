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


class _BNTrainP(nn.Module):
    """TorchBatchNorm's param/stat tree with the batch reduction done
    OUTSIDE (the lanes layout computes it on the channel-major tensor):
    consumes precomputed batch (mean, biased var, n), updates the running
    stats with torch's conventions (nn/layers.py:89-95), returns
    (scale, bias)."""
    ch: int
    momentum: float = 0.1

    @nn.compact
    def __call__(self, mean, var, n):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.ch,), jnp.float32))
        if not self.is_initializing():
            unbiased = var * (n / max(n - 1.0, 1.0))
            ra_mean.value = ((1 - self.momentum) * ra_mean.value
                             + self.momentum * mean)
            ra_var.value = ((1 - self.momentum) * ra_var.value
                            + self.momentum * unbiased)
        return scale, bias


class _LanesConvBN(nn.Module):
    """One TRAIN-mode U-Net block on the lanes layout: conv (or
    zero-stuffed transpose conv) via the differentiable Pallas primitive
    (ops/pallas_costreg_train.conv_lanes_t) → train BN (+ optional ReLU).
    Param/stat tree identical to ConvBNAct / DeconvBNAct. Compute dtype
    follows the input (bf16 under train_dtype=bfloat16; BN stats are
    always f32)."""
    ci: int
    co: int
    deconv: bool = False
    relu: bool = True

    @nn.compact
    def __call__(self, x, lay_in, lay_out=None, z_stride: int = 1):
        from ..ops.pallas_costreg import stuff_hw_z, subsample_hw
        from ..ops.pallas_costreg_train import (bn_apply_lanes,
                                                bn_stats_lanes, conv_lanes_t)
        if lay_out is None:
            lay_out = lay_in
        cd = x.dtype
        if self.deconv:
            init = functools.partial(torch_kernel_init, fan_in=self.co * 27)
            kernel = self.param("kernel", init, (3, 3, 3, self.ci, self.co))
            y = stuff_hw_z(x, lay_in, lay_out)
            y = conv_lanes_t(y, kernel, lay_out, compute_dtype=cd)
        else:
            kernel = _KernelP((3, 3, 3, self.ci, self.co), name="Conv_0")()
            y = conv_lanes_t(x, kernel, lay_in, z_stride=z_stride,
                             compute_dtype=cd)
            if z_stride == 2:
                y = subsample_hw(y, lay_in, lay_out)
        mean, var, n = bn_stats_lanes(y, lay_out, self.co)
        scale, bias = _BNTrainP(self.co, name="TorchBatchNorm_0")(
            mean, var, n)
        return bn_apply_lanes(y, lay_out, mean, var, scale, bias,
                              relu=self.relu)


def _lanes_unet_train(mod, x, lanes_dims, *, relu: bool, with_prob: bool):
    """Shared TRAIN-mode lanes U-Net trunk for CostRegNet (relu=True,
    prob head) and RenderCostReg (relu=False, base-channel output).

    x: [1, D, h, w, C] NDHWC (converted in) or, with lanes_dims=(D,h,w,C),
    an already-lanes-resident [D+2, C', lanesp] volume (e.g. straight
    from the fused train warp kernel). Called from inside the owning
    module's @nn.compact __call__ (`mod`), so the blocks' params land in
    the right scope."""
    from ..ops.pallas_conv3d import _round_up
    from ..ops.pallas_costreg import (cost_from_lanes, make_layout,
                                      to_lanes)
    from ..ops.pallas_costreg_train import conv_lanes_t

    if lanes_dims is not None:
        D, h, w, ci = lanes_dims
        xl = x
    else:
        B, D, h, w, ci = x.shape
        assert B == 1, "lanes train path is per-sample (B=1)"
        xl = to_lanes(x[0], make_layout(h, w), _round_up(ci, 8), x.dtype)
    lays = [make_layout(h >> i, w >> i) for i in range(4)]
    c = mod.base_channels

    def blk(ci_, co_, name, dec=False):
        return _LanesConvBN(ci_, co_, deconv=dec, relu=relu, name=name)

    conv0 = blk(ci, c, "conv0")(xl, lays[0])
    t = blk(c, c * 2, "conv1")(conv0, lays[0], lays[1], z_stride=2)
    conv2 = blk(c * 2, c * 2, "conv2")(t, lays[1])
    t = blk(c * 2, c * 4, "conv3")(conv2, lays[1], lays[2], z_stride=2)
    conv4 = blk(c * 4, c * 4, "conv4")(t, lays[2])
    t = blk(c * 4, c * 8, "conv5")(conv4, lays[2], lays[3], z_stride=2)
    t = blk(c * 8, c * 8, "conv6")(t, lays[3])
    t = conv4 + blk(c * 8, c * 4, "conv7", dec=True)(t, lays[3], lays[2])
    t = conv2 + blk(c * 4, c * 2, "conv9", dec=True)(t, lays[2], lays[1])
    t = conv0 + blk(c * 2, c, "conv11", dec=True)(t, lays[1], lays[0])
    if not with_prob:
        return t, lays[0]
    cost = conv_lanes_t(t, _PlainP((3, 3, 3, c, 1), name="prob")(),
                        lays[0], compute_dtype=t.dtype,
                        out_dtype=jnp.float32)
    return cost_from_lanes(cost, lays[0])[None][..., None], lays[0]


class CostRegNet(nn.Module):
    base_channels: int = 8
    # 'pallas3d' routes every conv through the channel-major Pallas kernel
    # (ops/pallas_conv3d.py) on the eval path; 'lanes' runs the whole U-Net
    # in the persistent channel-major layout (ops/pallas_costreg.py — no
    # per-layer layout conversion). Param tree is identical across impls.
    conv_impl: str = "xla"
    # TRAIN path: 'lanes' runs the U-Net through the differentiable lanes
    # conv primitive (ops/pallas_costreg_train.py) — custom-VJP Pallas
    # convs with train-mode BN between layers; 'xla' keeps the NDHWC
    # reference path. Same param/stat tree either way.
    train_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False, lanes_dims=None):
        c = self.base_channels
        if train and self.train_impl == "lanes":
            cost, _ = _lanes_unet_train(self, x, lanes_dims,
                                        relu=True, with_prob=True)
            return cost
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
    """The no-ReLU conv+BN variant used by NeuralVolumeNet (output: C=base).

    train_impl='lanes' routes the TRAIN forward/backward through the
    differentiable lanes U-Net (gated on B=1 and 8-divisible dims);
    lanes_dtype sets its compute dtype (e.g. 'bfloat16' under a mixed-
    precision step — the render branch itself stays f32 outside the
    U-Net; BN stats are f32 regardless)."""
    base_channels: int = 8
    train_impl: str = "xla"
    lanes_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        lanes_ok = (x.shape[0] == 1
                    and all(d % 8 == 0 for d in x.shape[1:4]))
        if train and self.train_impl == "lanes" and lanes_ok:
            from ..ops.pallas_warp_train import lanes_to_ndhwc
            xc = (x.astype(self.lanes_dtype) if self.lanes_dtype else x)
            t, lay0 = _lanes_unet_train(self, xc, None,
                                        relu=False, with_prob=False)
            return lanes_to_ndhwc(t, lay0, c)[None].astype(x.dtype)
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
