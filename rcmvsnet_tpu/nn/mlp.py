"""NeRF MLP with multiplicative feature conditioning + positional encoding.

Parity targets:
  * Embedder.embed ordering — /root/reference/models/render_models.py:45-49:
    output = [p, sin(f₁p..f_Np interleaved per-freq), cos(...)] i.e.
    concat(p, sin(scaled), cos(scaled)) where scaled lays out freqs
    major, coords minor.
  * Renderer_ours (net_type 'v0') — /root/reference/models/render_models.py:143-220:
    D=6, W=128, skip at layer 4, h = linear(h) * pts_bias(feat), viewdir
    head (alpha = relu(linear), rgb = sigmoid(linear(relu(linear(cat)))))
  * Renderer_attention (net_type 'v1') —
    /root/reference/models/render_models.py:382-460: per-point multi-head
    attention over the (rgba, volume-feat) tokens of the 3 paired source
    views fuses a color prior; additive pts conditioning, no skips,
    output cat([rgb, alpha, colors, colors]) (the reference concatenates
    colors twice — reproduced).
  * MultiHeadAttention — render_models.py:90-141: 4 heads, d_k=d_v=4,
    bias-free q/k/v/fc projections, residual + LayerNorm(eps 1e-6);
    ScaledDotProductAttention at render_models.py:68-88 (temperature √d_k,
    dropout dead/commented-out there).
  * weights_init (kaiming_normal, zero bias) applied to every linear except
    pts_bias and the attention block —
    /root/reference/models/render_models.py:8-12,168-172,412-417.
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
    The v1 attention variant lives in AttentionNerfMLP below."""
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


class MultiHeadAttention(nn.Module):
    """Residual multi-head attention + LayerNorm over a short token axis.

    Parity: /root/reference/models/render_models.py:68-141 (temperature
    √d_k, bias-free projections, residual BEFORE the LayerNorm; the
    reference's dropout layers are commented out there). Tokens on the
    second-to-last axis; optional mask [..., L, 1] zeros → −1e9 logits.
    """
    n_head: int = 4
    d_k: int = 4
    d_v: int = 4

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        *lead, L, d_model = q.shape
        split = lambda t, d: jnp.moveaxis(
            t.reshape(*lead, L, self.n_head, d), -2, -3)  # [..., H, L, d]
        proj = lambda name, d: nn.Dense(
            self.n_head * d, use_bias=False,
            kernel_init=torch_kernel_init, dtype=q.dtype, name=name)
        qh = split(proj("w_qs", self.d_k)(q), self.d_k)
        kh = split(proj("w_ks", self.d_k)(k), self.d_k)
        vh = split(proj("w_vs", self.d_v)(v), self.d_v)
        logits = jnp.einsum("...qd,...kd->...qk",
                            qh / np.sqrt(self.d_k), kh)
        if mask is not None:
            # reference broadcast ([..., L, 1] + head axis): the token
            # axis lands on the QUERY dim of [..., H, Lq, Lk]
            logits = jnp.where(mask[..., None, :, :] == 0, -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...qk,...kd->...qd", attn, vh)
        out = jnp.moveaxis(out, -3, -2).reshape(*lead, L,
                                                self.n_head * self.d_v)
        out = nn.Dense(d_model, use_bias=False,
                       kernel_init=torch_kernel_init, dtype=q.dtype,
                       name="fc")(out)
        out = out + q
        return nn.LayerNorm(epsilon=1e-6, dtype=q.dtype,
                            name="layer_norm")(out), attn


class AttentionNerfMLP(nn.Module):
    """Renderer_attention (net_type 'v1') — rgb+σ with an attention-fused
    per-view color prior.

    Parity: /root/reference/models/render_models.py:382-460. feats =
    [8 volume channels ⊕ n_src·4 warped rgba]; tokens (rgba_v ⊕ feat8)
    per source view attend to each other, sigmoid(weight_out) sums to a
    3-channel color prior; pts trunk is additive-bias, skip-free; output
    is cat([rgb, alpha, colors, colors]) — the reference concatenates
    `colors` twice (:457-460), reproduced for parity ([..., 10]).
    """
    depth: int = 6
    width: int = 128
    in_ch_pts: int = 63
    in_ch_views: int = 3

    @nn.compact
    def __call__(self, pts: jnp.ndarray, feats: jnp.ndarray,
                 views: jnp.ndarray) -> jnp.ndarray:
        *lead, F = feats.shape
        feat8 = feats[..., :8]
        if F > 8 + 3:
            n_src = (F - 8) // 4
            colors_in = feats[..., 8:].reshape(*lead, n_src, 4)
            tokens = jnp.concatenate(
                [colors_in,
                 jnp.broadcast_to(feat8[..., None, :],
                                  (*lead, n_src, 8))], axis=-1)
            tokens, _ = MultiHeadAttention(name="color_attention")(
                tokens, tokens, tokens)
            weight = jax.nn.sigmoid(
                _TorchDense(3, name="weight_out")(tokens))
            colors = jnp.sum(weight, axis=-2)                 # [..., 3]
        else:
            colors = feats[..., -3:]

        h = pts
        bias = _TorchDense(self.width, name="pts_bias")(
            jnp.concatenate([feat8, colors], axis=-1))
        # the reference builds its trunk as [Linear(in,W)] +
        # [Linear(W,W)]*(D−1) — python list replication, so layers
        # 1..D−1 SHARE one weight (render_models.py:401-402); reproduced
        shared = _KaimingDense(self.width, name="pts_linear_shared")
        for i in range(self.depth):
            h = (_KaimingDense(self.width, name="pts_linear_0")(h)
                 if i == 0 else shared(h))
            h = jax.nn.relu(h + bias)
        alpha = jax.nn.relu(_KaimingDense(1, name="alpha_linear")(h))
        feature = _KaimingDense(self.width, name="feature_linear")(h)
        h = jnp.concatenate([feature, views], axis=-1)
        h = jax.nn.relu(_KaimingDense(self.width // 2,
                                      name="views_linear_0")(h))
        rgb = jax.nn.sigmoid(_KaimingDense(3, name="rgb_linear")(h))
        return jnp.concatenate([rgb, alpha, colors, colors], axis=-1)
