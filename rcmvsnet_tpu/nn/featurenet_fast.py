"""Fast FeatureNet eval path: one flat channel-major Pallas conv chain.

The FPN extractor (nn/featurenet.py, parity target
/root/reference/models/modules.py:363-464) runs 3-32-channel convs that
XLA lowers at ~4 TFLOP/s on this chip (~36 ms/forward at 1152×864×5).
This module evaluates the SAME parameters through
ops/pallas_conv2d.conv2d_cm: the whole trunk chains in the flat
channel-major margined layout (zero NHWC↔CM relayouts between layers —
the margins ARE the conv zero-padding), eval-BatchNorm folds into the
kernel weights, ReLU fuses into the kernel epilogue, the 1×1 FPN heads
run as plain [Co, Ci]@[Ci, lanes] matmuls, and nearest-×2 upsampling is
a repeat whose output geometry coincides exactly with the lateral
branch's (margins 4 → 2 → 1 across the stride-2 levels).

Exactness: identical convolution math — tests/test_featurenet_fast.py
checks parity with FeatureNet.apply(train=False) at f32.

Eval-only (uses running BN stats); the train path keeps the Flax module.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_conv2d import (cm_from_nhwc, cm_to_nhwc, conv2d_cm,
                                 make_geo, matmul_cm, upsample2_cm)

# (name, kernel, stride, pad) for the ConvBNAct trunk (all BN+ReLU); the
# FPN heads (out*/inner*) are handled explicitly below.
_TRUNK = (
    ("conv0_0", 3, 1, 1),
    ("conv0_1", 3, 1, 1),
    ("conv1_0", 5, 2, 2),
    ("conv1_1", 3, 1, 1),
    ("conv1_2", 3, 1, 1),
    ("conv2_0", 5, 2, 2),
    ("conv2_1", 3, 1, 1),
    ("conv2_2", 3, 1, 1),
)


def _fold_bn(params, stats, name):
    """BN(eval) as per-channel (scale, shift)."""
    bn_p = params[name]["TorchBatchNorm_0"]
    bn_s = stats[name]["TorchBatchNorm_0"]
    inv = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + 1e-5)
    return inv, bn_p["bias"] - bn_s["mean"] * inv


def pack_featurenet(params, batch_stats, dtype=jnp.bfloat16):
    """FeatureNet params (+ running stats) → folded-weight dict."""
    packed = {"dtype": dtype}
    for name, *_ in _TRUNK:
        kern = params[name]["Conv_0"]["kernel"]
        scale, shift = _fold_bn(params, batch_stats, name)
        packed[name] = (kern.astype(jnp.float32), scale, shift)
    for name in ("out1", "inner1", "inner2"):
        w = params[name]["Conv_0"]["kernel"]  # 1×1 convs → plain dots
        packed[name] = (w[0, 0], params[name]["Conv_0"].get("bias"))
    for name in ("out2", "out3"):  # 3×3, no BN/bias/ReLU
        packed[name] = (params[name]["Conv_0"]["kernel"].astype(jnp.float32),
                        None, None)
    return packed


def featurenet_packed(packed, x, num_stage: int = 3,
                      out_layout: str = "nhwc",
                      interpret: bool = False):
    """Folded-weight FeatureNet forward; mirrors FeatureNet.__call__
    (nn/featurenet.py:47-75) output-for-output.

    x: [N, H, W, 3], H and W divisible by 4 → {stage1..3} NHWC maps, or
    with out_layout='warp', {stage1..3: (src2d, meta)} in the warp
    kernel's source layout (meta = (V, hm, row0, C, w_pad) for
    plane_sweep_variance_lanes(src2d=..., src_meta=...)) — the stage
    heads write it directly, skipping the NHWC transposes entirely.
    """
    dt = packed["dtype"]
    N, H, W, _ = x.shape
    geo = make_geo(N, H, W, margin=4)
    flat = cm_from_nhwc(x.astype(dt), geo)

    acts = {}
    for name, k, s, pad in _TRUNK:
        kern, scale, shift = packed[name]
        flat, geo = conv2d_cm(flat, geo, kern.astype(dt), stride=s,
                              padding=pad, scale=scale, shift=shift,
                              relu=True, interpret=interpret)
        acts[name] = (flat, geo)
    conv0 = acts["conv0_1"]
    conv1 = acts["conv1_2"]
    intra, geo1 = acts["conv2_2"]

    warp = out_layout == "warp"

    def head_1x1(flat_in, g, name):
        """out1: 1×1 no-bias head — as a conv2d_cm for warp layout."""
        if not warp:
            return cm_to_nhwc(matmul_cm(flat_in, g, packed[name][0]), g)
        w11 = packed[name][0][None, None]              # [1, 1, Ci, Co]
        out, g2 = conv2d_cm(flat_in, g, w11.astype(dt), stride=1,
                            padding=0, out_layout="warp",
                            interpret=interpret)
        return out, (g2.views, g2.hm, g2.row0, w11.shape[-1],
                     -(-g2.width // 128) * 128)

    def head_3x3(flat_in, g, name):
        out, g2 = conv2d_cm(flat_in, g, packed[name][0].astype(dt),
                            stride=1, padding=1,
                            out_layout="warp" if warp else "cm",
                            interpret=interpret)
        if not warp:
            return cm_to_nhwc(out, g2)
        return out, (g2.views, g2.hm, g2.row0, packed[name][0].shape[-1],
                     -(-g2.width // 128) * 128)

    outputs = {"stage1": head_1x1(intra, geo1, "out1")}
    if num_stage >= 2:
        up, geo_up = upsample2_cm(intra, geo1)
        assert geo_up == conv1[1], (geo_up, conv1[1])
        intra = up + matmul_cm(conv1[0], conv1[1], packed["inner1"][0],
                               packed["inner1"][1])
        outputs["stage2"] = head_3x3(intra, geo_up, "out2")
    if num_stage >= 3 and warp:
        outputs["stage3"] = _stage3_polyphase(packed, intra, geo_up,
                                              conv0, dt, interpret)
    elif num_stage >= 3:
        up, geo_up = upsample2_cm(intra, geo_up)
        assert geo_up == conv0[1], (geo_up, conv0[1])
        intra = up + matmul_cm(conv0[0], conv0[1], packed["inner2"][0],
                               packed["inner2"][1])
        outputs["stage3"] = head_3x3(intra, geo_up, "out3")
    return outputs


# half-row tap a touched by output parity u and kernel row dy:
# full row 2i+u taps source full row 2i+u+dy−1 → half row
# floor((2i+u+dy−1)/2) = i − 1 + a
_PHASE_TAPS = {0: ((0, 0), (1, 1), (2, 1)), 1: ((0, 1), (1, 1), (2, 2))}


def _stage3_polyphase(packed, intra2, geo2, conv0, dt, interpret):
    """out3 without materializing the full-res intra3 tensor.

    out3 = conv3x3(up2(intra2) + inner2(conv0) + β·mask) decomposes by
    linearity into
      * conv(up2(intra2)): computed AT HALF RES as two phase convs
        (kernels collapse the taps that share a source row/col under
        nearest ×2 upsampling); emitting warp layout with output
        channels ordered (u·Co + o) makes the half-res rows land
        EXACTLY on the full-res warp rows — only a column interleave
        of the two v-phases remains;
      * conv(inner2(conv0)): the 1×1 folds into the 3×3
        (k'[·,·,i,o] = Σ_c W[i,c]·k[·,·,c,o]) — one 8→8 conv on conv0;
      * conv(β on the data region): a 1-channel conv of the data mask
        with kb[·,·,o] = Σ_c k[·,·,c,o]·β_c (exact border handling).
    Returns (src2d, meta) in the warp layout.
    """
    from ..ops.pallas_conv2d import lane_mask
    k3 = packed["out3"][0]                        # [3, 3, Ci, Co]
    w2, b2 = packed["inner2"]                     # [Ci0, Ci], [Ci]
    Ci, Co = k3.shape[2], k3.shape[3]
    geo0 = conv0[1]
    assert geo2.doubled() == geo0, (geo2, geo0)
    V, hm_f, row0_f = geo0.views, geo0.hm, geo0.row0
    w_pad = -(-geo0.width // 128) * 128
    rows_full = V * hm_f * Co

    def phase_kernel(v):
        K = jnp.zeros((3, 3, Ci, 2 * Co), k3.dtype)
        for u in (0, 1):
            for dy, a in _PHASE_TAPS[u]:
                for dx, b in _PHASE_TAPS[v]:
                    K = K.at[a, b, :, u * Co:(u + 1) * Co].add(k3[dy, dx])
        return K

    ph = [conv2d_cm(intra2, geo2, phase_kernel(v).astype(dt), stride=1,
                    padding=1, out_layout="warp", interpret=interpret)[0]
          for v in (0, 1)]
    up_term = jnp.stack([ph[0][:rows_full], ph[1][:rows_full]],
                        axis=-1).reshape(rows_full, -1)[:, :w_pad]

    k_fold = jnp.einsum("ic,yxco->yxio", w2, k3)
    cb = conv2d_cm(conv0[0], geo0, k_fold.astype(dt), stride=1,
                   padding=1, out_layout="warp", interpret=interpret)[0]

    kb = jnp.einsum("yxco,c->yxo", k3, b2)[:, :, None, :]
    mask_flat = lane_mask(geo0).astype(dt)
    cm_mask = conv2d_cm(mask_flat, geo0, kb.astype(dt), stride=1,
                        padding=1, out_layout="warp",
                        interpret=interpret)[0]

    src2d = up_term + cb[:rows_full, :w_pad] + cm_mask[:rows_full, :w_pad]
    return src2d, (V, hm_f, row0_f, Co, w_pad)


def packed_shapes_ok(H: int, W: int) -> bool:
    """Trunk strides need whole half/quarter resolutions."""
    return H % 4 == 0 and W % 4 == 0
