"""Convert reference PyTorch checkpoints to our parameter pytrees.

Handles the two reference artifacts (/root/reference/pretrain/,
train_rcmvsnet.py:214-226):
  * model_*_cas.ckpt  — {'model': CascadeMVSNet state_dict, 'optimizer', 'epoch'}
  * model_*_nerf.ckpt — {'model': Rendering_Consistency_Net state_dict}

Layout transforms:
  Conv{2,3}d   (O,I,*k)  → (*k, I, O)
  ConvTranspose(I,O,*k)  → spatially flipped (*k, I, O) (our deconv kernels
                           are parametrized as the equivalent forward conv)
  Linear       (O,I)     → (I,O)
  BatchNorm weight/bias/running_mean/running_var
                          → scale/bias (params) + mean/var (batch_stats)
"""
from __future__ import annotations

import numpy as np


def _conv(w):
    w = np.asarray(w)
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv(w):
    w = np.asarray(w)
    if w.ndim == 4:
        return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


def _linear(w):
    return np.asarray(w).T.copy()


def _load_torch_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt["model"] if "model" in ckpt else ckpt
    return {k: v.numpy() for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}, ckpt


def _strip_module(sd):
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _convbn(sd, prefix, params, stats, name, deconv=False, seq_bn=False):
    """Map one reference Conv+BN block to (params[name], stats[name])."""
    conv_key = f"{prefix}.0.weight" if seq_bn else f"{prefix}.conv.weight"
    bn_prefix = f"{prefix}.1" if seq_bn else f"{prefix}.bn"
    w = sd[conv_key]
    if deconv:
        params[name] = {"kernel": _deconv(w)}
    else:
        params[name] = {"Conv_0": {"kernel": _conv(w)}}
    if f"{bn_prefix}.weight" in sd:
        params[name]["TorchBatchNorm_0"] = {
            "scale": np.asarray(sd[f"{bn_prefix}.weight"]),
            "bias": np.asarray(sd[f"{bn_prefix}.bias"])}
        stats[name] = {"TorchBatchNorm_0": {
            "mean": np.asarray(sd[f"{bn_prefix}.running_mean"]),
            "var": np.asarray(sd[f"{bn_prefix}.running_var"])}}


def _costreg(sd, prefix):
    params, stats = {}, {}
    for conv in ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]:
        _convbn(sd, f"{prefix}.{conv}", params, stats, conv)
    for conv in ["conv7", "conv9", "conv11"]:
        # CostRegNet uses Deconv3d wrappers (.conv/.bn); the render branch's
        # CostReg uses nn.Sequential (.0/.1) — accept either
        seq = f"{prefix}.{conv}.0.weight" in sd
        _convbn(sd, f"{prefix}.{conv}", params, stats, conv,
                deconv=True, seq_bn=seq)
    if f"{prefix}.prob.weight" in sd:
        params["prob"] = {"Conv_0": {"kernel": _conv(sd[f"{prefix}.prob.weight"])}}
    return params, stats


def convert_cascade_checkpoint(path):
    """Reference *_cas.ckpt → (params, batch_stats, epoch) for CascadeMVSNet."""
    sd, ckpt = _load_torch_state_dict(path)
    sd = _strip_module(sd)
    params, stats = {}, {}

    feat_p, feat_s = {}, {}
    for torch_name, our_name in [
            ("conv0.0", "conv0_0"), ("conv0.1", "conv0_1"),
            ("conv1.0", "conv1_0"), ("conv1.1", "conv1_1"), ("conv1.2", "conv1_2"),
            ("conv2.0", "conv2_0"), ("conv2.1", "conv2_1"), ("conv2.2", "conv2_2")]:
        _convbn(sd, f"feature.{torch_name}", feat_p, feat_s, our_name)
    for head in ["out1", "out2", "out3", "inner1", "inner2"]:
        key = f"feature.{head}.weight"
        if key in sd:
            entry = {"kernel": _conv(sd[key])}
            if f"feature.{head}.bias" in sd:
                entry["bias"] = np.asarray(sd[f"feature.{head}.bias"])
            feat_p[head] = {"Conv_0": entry}
    params["feature"] = feat_p
    stats["feature"] = feat_s

    stage_idx = 0
    while f"cost_regularization.{stage_idx}.conv0.conv.weight" in sd:
        p, s = _costreg(sd, f"cost_regularization.{stage_idx}")
        params[f"stage{stage_idx + 1}"] = {"cost_reg": p}
        stats[f"stage{stage_idx + 1}"] = {"cost_reg": s}
        stage_idx += 1
    if stage_idx == 0 and "cost_regularization.conv0.conv.weight" in sd:
        # share_cr=True variant: one regularizer for all stages
        p, s = _costreg(sd, "cost_regularization")
        for i in range(3):
            params[f"stage{i + 1}"] = {"cost_reg": p}
            stats[f"stage{i + 1}"] = {"cost_reg": s}

    epoch = int(ckpt.get("epoch", -1)) if isinstance(ckpt, dict) else -1
    return params, stats, epoch


def convert_render_checkpoint(path):
    """Reference *_nerf.ckpt → (params, batch_stats) for
    RenderingConsistencyNet."""
    sd, _ = _load_torch_state_dict(path)
    sd = _strip_module(sd)
    cr_p, cr_s = _costreg(sd, "MVSNet.cost_reg_2")
    params = {"neural_volume": {"cost_reg_2": cr_p}}
    stats = {"neural_volume": {"cost_reg_2": cr_s}}

    def dense(torch_name, our_name):
        return {our_name: {"Dense_0": {
            "kernel": _linear(sd[f"network_fn.nerf.{torch_name}.weight"]),
            "bias": np.asarray(sd[f"network_fn.nerf.{torch_name}.bias"])}}}

    nerf = {}
    if "network_fn.nerf.color_attention.w_qs.weight" in sd:
        # net_type 'v1' Renderer_attention: the torch trunk is ONE shared
        # Linear at indices 1..D−1 (render_models.py:401-402 list
        # replication), mapped to our pts_linear_shared; plus the
        # attention block (bias-free projections) and weight_out head
        nerf.update(dense("pts_linears.0", "pts_linear_0"))
        nerf.update(dense("pts_linears.1", "pts_linear_shared"))
        att = {}
        for proj in ("w_qs", "w_ks", "w_vs", "fc"):
            att[proj] = {"kernel": _linear(
                sd[f"network_fn.nerf.color_attention.{proj}.weight"])}
        att["layer_norm"] = {
            "scale": np.asarray(
                sd["network_fn.nerf.color_attention.layer_norm.weight"]),
            "bias": np.asarray(
                sd["network_fn.nerf.color_attention.layer_norm.bias"])}
        nerf["color_attention"] = att
        nerf.update(dense("weight_out", "weight_out"))
    else:
        i = 0
        while f"network_fn.nerf.pts_linears.{i}.weight" in sd:
            nerf.update(dense(f"pts_linears.{i}", f"pts_linear_{i}"))
            i += 1
    nerf.update(dense("pts_bias", "pts_bias"))
    nerf.update(dense("views_linears.0", "views_linear_0"))
    nerf.update(dense("feature_linear", "feature_linear"))
    nerf.update(dense("alpha_linear", "alpha_linear"))
    nerf.update(dense("rgb_linear", "rgb_linear"))
    params["nerf"] = nerf
    return params, stats
