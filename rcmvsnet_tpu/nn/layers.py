"""Flax building blocks with exact torch-layer semantics.

Channels-last (NHWC / NDHWC) throughout — the TPU-native layout. Parity
notes vs the reference wrappers (/root/reference/models/modules.py:28-211):

  * torch Conv{2,3}d(padding=p) == XLA conv with explicit (p, p) padding.
    (XLA 'SAME' places padding differently for stride 2 — don't use it.)
  * torch ConvTranspose(stride s, padding p, output_padding op) == conv over
    an input dilated by s with explicit padding (k-1-p, k-1-p+op) and a
    spatially-flipped, channel-transposed kernel. We parametrize the kernel
    directly in the flipped/HWIO form the forward conv consumes.
  * torch BatchNorm(momentum=0.1, eps=1e-5) == flax BatchNorm(momentum=0.9,
    epsilon=1e-5) (opposite momentum convention). Under jit with sharded
    batches the batch-stat reduction is global, which *is* SyncBatchNorm
    (/root/reference/train_rcmvsnet.py:524-525); under shard_map pass
    axis_name explicitly.
  * Default inits mirror torch: kaiming_uniform(a=√5) → U(±1/√fan_in) for
    conv kernels, same bound for biases.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32, fan_in: Optional[int] = None):
    """torch default conv/linear weight init: U(±1/√fan_in).

    shape is HWIO-style (..., in, out); fan_in = in * prod(spatial) unless
    overridden (transpose convs use out * prod(spatial), matching torch's
    layout-dependent fan computation).
    """
    if fan_in is None:
        fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """torch nn.init.kaiming_normal_ (fan_in, relu gain √2) for HWIO/IO."""
    fan_in = int(np.prod(shape[:-1]))
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics: normalize by the biased batch
    variance, but update running_var with the UNBIASED batch variance
    (torch's convention; flax stores the biased one). Collection
    'batch_stats' is mutable in train mode. axis_name enables explicit
    cross-replica sync under shard_map/pmap; under jit+GSPMD the batch
    reduction is already global (== SyncBatchNorm)."""
    momentum: float = 0.1  # torch convention: new = (1-m)·old + m·batch
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(xf * xf, axis=reduce_axes)
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                + bias.astype(x.dtype))


class PallasConv3d(nn.Module):
    """Drop-in for nn.Conv on 3×3×3 stride-{1,2} padding-1 3D convs, backed
    by the Pallas channel-major matmul kernel (ops/pallas_conv3d.py — XLA's
    conv lowering runs at ~2% MXU on this chip). Same param tree as nn.Conv
    ('kernel' [3,3,3,Ci,Co], optional 'bias')."""
    features: int
    strides: Sequence[int] = (1, 1, 1)
    use_bias: bool = False
    kernel_init: callable = torch_kernel_init
    bias_init: callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv3d import conv3d_lanewise
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 3, in_ch, self.features))
        conv = functools.partial(conv3d_lanewise,
                                 kernel=kernel.astype(x.dtype),
                                 strides=tuple(self.strides))
        # unrolled batch loop: vmap-of-pallas_call faults on this libtpu
        # (batched grids); B is static and 1 on the eval path
        y = jnp.stack([conv(x[b]) for b in range(x.shape[0])])
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvBNAct(nn.Module):
    """conv → [BN] → [ReLU], any spatial rank (2 or 3 from input shape).

    Mirrors the reference Conv2d/Conv3d wrappers: bias only when bn=False.
    conv_impl='pallas3d' swaps the conv for the Pallas kernel (3D, k=3,
    p=1 only) with an identical param tree.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (1, 1)
    relu: bool = True
    bn: bool = True
    bias: Optional[bool] = None  # default: not bn
    axis_name: Optional[str] = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = (not self.bn) if self.bias is None else self.bias
        in_ch = x.shape[-1]
        fan_in = in_ch * int(np.prod(self.kernel_size))
        if self.conv_impl == "pallas3d":
            assert (tuple(self.kernel_size) == (3, 3, 3)
                    and tuple(self.padding) == (1, 1, 1)), (
                "pallas3d covers k=3 p=1 3D convs only")
            x = PallasConv3d(
                self.features, strides=tuple(self.strides),
                use_bias=use_bias, kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in), name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(self.strides),
                padding=[(p, p) for p in self.padding],
                use_bias=use_bias,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in),
                dtype=x.dtype,
                name="Conv_0",
            )(x)
        if self.bn:
            x = TorchBatchNorm(axis_name=self.axis_name)(x, train)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class DeconvBNAct(nn.Module):
    """ConvTranspose (torch semantics) → [BN] → [ReLU].

    stride/padding/output_padding follow torch ConvTranspose{2,3}d. The
    stride-2 Deconv2d crop quirk at /root/reference/models/modules.py:100-104
    (y[:, :, :2h, :2w]) is honored via `crop_to_double`.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    padding: Sequence[int] = (1, 1)
    output_padding: Sequence[int] = (1, 1)
    relu: bool = True
    bn: bool = True
    crop_to_double: bool = False
    axis_name: Optional[str] = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim_sp = len(self.kernel_size)
        in_ch = x.shape[-1]
        in_spatial = x.shape[1:-1]
        # torch layout (in, out, *k) has fan_in = out * prod(k); keep the same
        # init statistics in our flipped-HWIO parametrization.
        fan_in = self.features * int(np.prod(self.kernel_size))
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype=jnp.float32: torch_kernel_init(
                key, shape, dtype, fan_in=fan_in),
            (*self.kernel_size, in_ch, self.features))

        if self.conv_impl == "pallas3d":
            assert (ndim_sp == 3 and tuple(self.kernel_size) == (3, 3, 3)
                    and tuple(self.strides) == (2, 2, 2)
                    and tuple(self.padding) == (1, 1, 1)
                    and tuple(self.output_padding) == (1, 1, 1)), (
                "pallas3d covers the k=3/s=2/p=1/op=1 transpose conv only")
            from ..ops.pallas_conv3d import conv3d_lanewise
            deconv = functools.partial(
                conv3d_lanewise, kernel=kernel.astype(x.dtype),
                transposed=True)
            # unrolled batch loop — see PallasConv3d
            y = jnp.stack([deconv(x[b]) for b in range(x.shape[0])])
        else:
            pad = [(k - 1 - p, k - 1 - p + op)
                   for k, p, op in zip(self.kernel_size, self.padding,
                                       self.output_padding)]
            dn_map = {2: ("NHWC", "HWIO", "NHWC"),
                      3: ("NDHWC", "DHWIO", "NDHWC")}
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype),
                window_strides=(1,) * ndim_sp,
                padding=pad,
                lhs_dilation=tuple(self.strides),
                dimension_numbers=dn_map[ndim_sp],
                precision=None)
        if not self.bn:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        if self.crop_to_double and all(s == 2 for s in self.strides):
            sl = (slice(None),) + tuple(slice(0, 2 * s) for s in in_spatial) + (slice(None),)
            y = y[sl]
        if self.bn:
            y = TorchBatchNorm(axis_name=self.axis_name)(y, train)
        if self.relu:
            y = jax.nn.relu(y)
        return y


class PlainConv(nn.Module):
    """Bare conv (no BN, no activation) — the reference's out/inner heads."""
    features: int
    kernel_size: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = False
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * int(np.prod(self.kernel_size))
        if self.conv_impl == "pallas3d":
            assert (tuple(self.kernel_size) == (3, 3, 3)
                    and tuple(self.padding) == (1, 1, 1))
            return PallasConv3d(
                self.features, use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in), name="Conv_0")(x)
        return nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=(1,) * len(self.kernel_size),
            padding=[(p, p) for p in self.padding],
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=x.dtype,
        )(x)
