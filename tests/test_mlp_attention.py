"""AttentionNerfMLP (net_type 'v1') vs a literal torch port of
Renderer_attention + MultiHeadAttention
(/root/reference/models/render_models.py:68-141,382-460), shared weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _highest_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from rcmvsnet_tpu.nn.mlp import AttentionNerfMLP  # noqa: E402

RS = np.random.RandomState(3)
D_TRUNK, W_TRUNK, PTS, VIEWS, FEAT = 6, 32, 63, 3, 20


class TorchMHA(tnn.Module):
    """render_models.py:68-141 (dropouts are dead there)."""

    def __init__(self, n_head, d_model, d_k, d_v):
        super().__init__()
        self.n_head, self.d_k, self.d_v = n_head, d_k, d_v
        self.w_qs = tnn.Linear(d_model, n_head * d_k, bias=False)
        self.w_ks = tnn.Linear(d_model, n_head * d_k, bias=False)
        self.w_vs = tnn.Linear(d_model, n_head * d_v, bias=False)
        self.fc = tnn.Linear(n_head * d_v, d_model, bias=False)
        self.layer_norm = tnn.LayerNorm(d_model, eps=1e-6)

    def forward(self, q, k, v):
        nh, dk, dv = self.n_head, self.d_k, self.d_v
        b, lq = q.shape[0], q.shape[1]
        residual = q
        q = self.w_qs(q).view(b, lq, nh, dk).transpose(1, 2)
        k = self.w_ks(k).view(b, lq, nh, dk).transpose(1, 2)
        v = self.w_vs(v).view(b, lq, nh, dv).transpose(1, 2)
        attn = F.softmax(torch.matmul(q / dk ** 0.5, k.transpose(2, 3)),
                         dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, lq, -1)
        return self.layer_norm(self.fc(out) + residual)


class TorchRendererAttention(tnn.Module):
    """render_models.py:382-460, use_viewdirs=True branch. Note the
    [Linear(W,W)]*(D-1) list replication → ONE shared trunk layer."""

    def __init__(self, D=D_TRUNK, W=W_TRUNK):
        super().__init__()
        self.attension_dim = 4 + 8
        self.color_attention = TorchMHA(4, self.attension_dim, 4, 4)
        self.weight_out = tnn.Linear(self.attension_dim, 3)
        self.pts_linears = tnn.ModuleList(
            [tnn.Linear(PTS, W, bias=True)]
            + [tnn.Linear(W, W, bias=True)] * (D - 1))
        self.pts_bias = tnn.Linear(11, W)
        self.views_linears = tnn.ModuleList([tnn.Linear(VIEWS + W, W // 2)])
        self.feature_linear = tnn.Linear(W, W)
        self.alpha_linear = tnn.Linear(W, 1)
        self.rgb_linear = tnn.Linear(W // 2, 3)

    def forward(self, x):
        n_ray, n_sample, dim = x.shape
        in_feat = dim - PTS - VIEWS
        input_pts, input_feats, input_views = torch.split(
            x, [PTS, in_feat, VIEWS], dim=-1)
        colors_tok = input_feats[..., 8:].reshape(n_ray * n_sample, -1, 4)
        weight = torch.cat(
            (colors_tok,
             input_feats[..., :8].reshape(n_ray * n_sample, 1, -1)
             .expand(-1, colors_tok.shape[-2], -1)), dim=-1)
        weight = self.color_attention(weight, weight, weight)
        colors = torch.sum(torch.sigmoid(self.weight_out(weight)),
                           dim=-2).view(n_ray, n_sample, -1)
        h = input_pts
        bias = self.pts_bias(torch.cat((input_feats[..., :8], colors), -1))
        for layer in self.pts_linears:
            h = F.relu(layer(h) + bias)
        alpha = torch.relu(self.alpha_linear(h))
        h = torch.cat([self.feature_linear(h), input_views], -1)
        for layer in self.views_linears:
            h = F.relu(layer(h))
        rgb = torch.sigmoid(self.rgb_linear(h))
        out = torch.cat([rgb, alpha, colors], -1)
        return torch.cat((out, colors), dim=-1)


def _lin(mod):
    p = {"kernel": jnp.asarray(mod.weight.detach().numpy().T)}
    if mod.bias is not None:
        p["bias"] = jnp.asarray(mod.bias.detach().numpy())
    return p


def test_attention_mlp_matches_torch():
    tmod = TorchRendererAttention().eval()
    N, S = 5, 7
    pts = RS.randn(N, S, PTS).astype(np.float32)
    feats = RS.randn(N, S, FEAT).astype(np.float32)
    views = RS.randn(N, S, VIEWS).astype(np.float32)

    with torch.no_grad():
        want = tmod(torch.from_numpy(
            np.concatenate([pts, feats, views], -1))).numpy()

    mlp = AttentionNerfMLP(D_TRUNK, W_TRUNK, in_ch_pts=PTS)
    params = {
        "color_attention": {
            "w_qs": _lin(tmod.color_attention.w_qs),
            "w_ks": _lin(tmod.color_attention.w_ks),
            "w_vs": _lin(tmod.color_attention.w_vs),
            "fc": _lin(tmod.color_attention.fc),
            "layer_norm": {
                "scale": jnp.asarray(
                    tmod.color_attention.layer_norm.weight.detach().numpy()),
                "bias": jnp.asarray(
                    tmod.color_attention.layer_norm.bias.detach().numpy())},
        },
        "weight_out": {"Dense_0": _lin(tmod.weight_out)},
        "pts_bias": {"Dense_0": _lin(tmod.pts_bias)},
        "pts_linear_0": {"Dense_0": _lin(tmod.pts_linears[0])},
        "pts_linear_shared": {"Dense_0": _lin(tmod.pts_linears[1])},
        "alpha_linear": {"Dense_0": _lin(tmod.alpha_linear)},
        "feature_linear": {"Dense_0": _lin(tmod.feature_linear)},
        "views_linear_0": {"Dense_0": _lin(tmod.views_linears[0])},
        "rgb_linear": {"Dense_0": _lin(tmod.rgb_linear)},
    }
    init = mlp.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                    jnp.asarray(feats), jnp.asarray(views))
    # same tree structure as the random init (catches naming drift)
    assert (jax.tree_util.tree_structure(init["params"])
            == jax.tree_util.tree_structure(params))
    got = mlp.apply({"params": params}, jnp.asarray(pts),
                    jnp.asarray(feats), jnp.asarray(views))
    assert got.shape == (N, S, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_trunk_weight_sharing():
    """Layers 1..D-1 share one parameter set, like the reference's
    [Linear]*(D-1) list replication."""
    mlp = AttentionNerfMLP(D_TRUNK, W_TRUNK, in_ch_pts=PTS)
    init = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, PTS)),
                    jnp.zeros((2, 3, FEAT)), jnp.zeros((2, 3, VIEWS)))
    names = sorted(init["params"])
    assert "pts_linear_shared" in names
    assert not any(n.startswith("pts_linear_")
                   and n not in ("pts_linear_0", "pts_linear_shared")
                   for n in names)
