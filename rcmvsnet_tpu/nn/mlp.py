"""NeRF MLP with multiplicative feature conditioning + positional encoding.

Parity targets:
  * Embedder.embed ordering — /root/reference/models/render_models.py:45-49:
    output = [p, sin(f₁p..f_Np interleaved per-freq), cos(...)] i.e.
    concat(p, sin(scaled), cos(scaled)) where scaled lays out freqs
    major, coords minor.
  * Renderer_ours (net_type 'v0') — /root/reference/models/render_models.py:143-220:
    D=6, W=128, skip at layer 4, h = linear(h) * pts_bias(feat), viewdir
    head (alpha = relu(linear), rgb = sigmoid(linear(relu(linear(cat)))))
  * weights_init (kaiming_normal, zero bias) applied to every linear except
    pts_bias — /root/reference/models/render_models.py:8-12,168-172.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import kaiming_normal_init, torch_kernel_init, torch_bias_init


def positional_encoding(x: jnp.ndarray, num_freqs: int = 10) -> jnp.ndarray:
    """[..., d] → [..., d + 2·d·num_freqs] with 2^k log-spaced freqs."""
    freqs = (2.0 ** jnp.arange(num_freqs, dtype=x.dtype))
    scaled = (x[..., None, :] * freqs[:, None]).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


class _KaimingDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=kaiming_normal_init,
                        bias_init=nn.initializers.zeros, dtype=x.dtype)(x)


class _TorchDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(self.features, kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(fan_in), dtype=x.dtype)(x)


class NerfMLP(nn.Module):
    """Renderer_ours(v0) / Renderer_linear(v2): rgb+sigma from (pos-enc pts,
    volume feat, viewdir). bias_mode 'multiply' is the default v0 net
    (h = linear(h)·pts_bias(feat)); 'add' is the v2 variant
    (/root/reference/models/render_models.py:462-536, additive conditioning,
    torch-default init on its pts_linears per weights_init application).
    The v1 attention variant is non-default & unused in the reference
    training config and is not implemented."""
    depth: int = 6
    width: int = 128
    in_ch_pts: int = 63
    in_ch_views: int = 3
    skips: Sequence[int] = (4,)
    bias_mode: str = "multiply"  # 'multiply' (v0) | 'add' (v2)

    @nn.compact
    def __call__(self, pts: jnp.ndarray, feats: jnp.ndarray,
                 views: jnp.ndarray) -> jnp.ndarray:
        """pts [..., 63], feats [..., F], views [..., 3] → [..., 4] (rgb, σ)."""
        h = pts
        bias = _TorchDense(self.width, name="pts_bias")(feats)
        for i in range(self.depth):
            h = _KaimingDense(self.width, name=f"pts_linear_{i}")(h)
            h = h * bias if self.bias_mode == "multiply" else h + bias
            h = jax.nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)
        alpha = jax.nn.relu(_KaimingDense(1, name="alpha_linear")(h))
        feature = _KaimingDense(self.width, name="feature_linear")(h)
        h = jnp.concatenate([feature, views], axis=-1)
        h = jax.nn.relu(_KaimingDense(self.width // 2, name="views_linear_0")(h))
        rgb = jax.nn.sigmoid(_KaimingDense(3, name="rgb_linear")(h))
        return jnp.concatenate([rgb, alpha], axis=-1)
