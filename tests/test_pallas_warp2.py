"""Fused warp+variance lanes kernel vs the XLA reference path — interpret
mode on CPU. Parity target: ops.warp.plane_sweep_variance (itself
oracle-tested against the literal torch port in tests/test_warp.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.core.geometry import (compose_projection,
                                        linspace_depth_samples)
from rcmvsnet_tpu.data.synthetic import make_synthetic_views
from rcmvsnet_tpu.ops.pallas_costreg import make_layout
from rcmvsnet_tpu.ops.pallas_warp2 import (check_group_coverage,
                                           plane_sweep_variance_lanes)
from rcmvsnet_tpu.ops.warp import plane_sweep_variance


def _lanes(*args, **kw):
    """Call the kernel, assert ZERO runtime band violations (every test
    here gates on check_group_coverage first), return the volume."""
    out, viol = plane_sweep_variance_lanes(*args, **kw)
    assert int(viol) == 0, f"unexpected band violations: {int(viol)}"
    return out


def _setup(H=16, W=24, V=4, D=8, seed=3):
    s = make_synthetic_views(H=H, W=W, V=V, depth0=600.0, seed=seed,
                             baseline=4.0)
    rs = np.random.RandomState(seed)
    C = 8
    feats = jnp.asarray(rs.randn(V, H, W, C).astype(np.float32))
    pairs = np.zeros((1, V, 2, 4, 4), np.float32)
    for v in range(V):
        pairs[0, v, 0] = s["extrinsics"][v]
        pairs[0, v, 1, :3, :3] = s["intrinsics"]
    projs = compose_projection(jnp.asarray(pairs))[0]        # [V, 4, 4]
    dvals = jnp.linspace(s["depth_min"], s["depth_max"], D)[None]
    dv = linspace_depth_samples(dvals.astype(jnp.float32), D, H, W)[0]
    return feats, projs, dv, jnp.asarray(pairs), dvals


def _lanes_to_ndhwc(y, lay, C):
    v = np.asarray(y)[1:-1, :C, lay.halo:lay.halo + lay.lanes0]
    v = v.reshape(v.shape[0], C, lay.hp, lay.wp)[:, :, 1:-1, 1:1 + lay.w]
    return np.transpose(v, (0, 2, 3, 1))    # [D, h, w, C]


def test_matches_xla_variance():
    feats, projs, dv, pairs, dvals = _setup()
    V, H, W, C = feats.shape
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    lay = make_layout(H, W, 512)
    got = _lanes(
        feats, projs, dv, lay, rows_per_step=4, band=8,
        compute_dtype=jnp.float32, out_dtype=jnp.float32, interpret=True)
    ref = feats[0]
    want, _ = plane_sweep_variance(
        ref[None], [feats[v][None] for v in range(1, V)],
        [projs[v][None] for v in range(1, V)], projs[0][None], dv[None])
    got_nd = _lanes_to_ndhwc(got, lay, C)
    np.testing.assert_allclose(got_nd, np.asarray(want[0]),
                               rtol=1e-4, atol=1e-4)


def test_planes_mode_matches_volume_mode():
    """depth_planes=(lo, step, D) — the schedule the PRODUCTION fused eval
    path always uses (models/cascade.py passes (lo, step, D), never a
    [D, h, w] volume) — must equal the volume-mode kernel bit-for-close on
    the same linear hypotheses, dense and banded."""
    feats, projs, dv, pairs, dvals = _setup()
    V, H, W, C = feats.shape
    D = dv.shape[0]
    lay = make_layout(H, W, 512)
    lo = jnp.broadcast_to(dvals[0, 0], (H, W)).astype(jnp.float32)
    step = jnp.broadcast_to((dvals[0, -1] - dvals[0, 0]) / (D - 1),
                            (H, W)).astype(jnp.float32)

    for rows, band in [(4, 8), (8, 16), (2, 8)]:
        if not check_group_coverage(pairs, dv[None], H, W, rows, band):
            continue
        kw = dict(rows_per_step=rows, band=band,
                  compute_dtype=jnp.float32, out_dtype=jnp.float32,
                  interpret=True)
        vol = _lanes(feats, projs, dv, lay, **kw)
        planes = _lanes(
            feats, projs, None, lay, depth_planes=(lo, step, D), **kw)
        np.testing.assert_allclose(np.asarray(planes), np.asarray(vol),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"rows={rows} band={band}")


def test_borders_and_margins_zero():
    feats, projs, dv, _, _ = _setup()
    V, H, W, C = feats.shape
    lay = make_layout(H, W, 512)
    got = np.asarray(_lanes(
        feats, projs, dv, lay, rows_per_step=4, band=8,
        compute_dtype=jnp.float32, out_dtype=jnp.float32, interpret=True))
    D = dv.shape[0]
    assert got.shape == (D + 2, C, lay.lanesp)
    # z-border planes and lane margins untouched (zero template)
    assert np.all(got[0] == 0) and np.all(got[-1] == 0)
    assert np.all(got[:, :, :lay.halo] == 0)
    assert np.all(got[:, :, lay.halo + lay.lanes0:] == 0)
    # border rows/cols within the written planes
    interior = got[1:-1, :, lay.halo:lay.halo + lay.lanes0].reshape(
        D, C, lay.hp, lay.wp)
    assert np.all(interior[:, :, 0] == 0)
    assert np.all(interior[:, :, -1] == 0)
    assert np.all(interior[:, :, :, 0] == 0)
    assert np.all(interior[:, :, :, 1 + lay.w:] == 0)


def test_x_banded_matches_dense():
    """x_band contraction windows must reproduce the dense hat matmul
    whenever check_group_coverage(x_band) passes."""
    feats, projs, dv, pairs, _ = _setup(H=16, W=24, V=4)
    V, H, W, C = feats.shape
    # tiny windows + alignment to exercise multi-tile logic on CPU
    x_band, x_tile, x_align = 16, 8, 8
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8,
                                x_band=x_band, x_tile=x_tile,
                                x_align=x_align)
    lay = make_layout(H, W, 512)
    kw = dict(rows_per_step=4, band=8, compute_dtype=jnp.float32,
              out_dtype=jnp.float32, interpret=True)
    dense = _lanes(feats, projs, dv, lay, **kw)
    banded = _lanes(feats, projs, dv, lay,
                                        x_band=x_band, x_tile=x_tile,
                                        x_align=x_align, **kw)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_x_banded_unaligned_width():
    """Widths that are NOT a multiple of x_align exercise the kernel's
    zero-padding of source rows (window clip bound = padded_w − x_band)."""
    feats, projs, dv, pairs, _ = _setup(H=16, W=20, V=4)
    V, H, W, C = feats.shape
    x_band, x_tile, x_align = 16, 8, 8
    assert W % x_align != 0  # must exercise the padded clip bound
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8,
                                x_band=x_band, x_tile=x_tile,
                                x_align=x_align)
    lay = make_layout(H, W, 512)
    kw = dict(rows_per_step=4, band=8, compute_dtype=jnp.float32,
              out_dtype=jnp.float32, interpret=True)
    dense = _lanes(feats, projs, dv, lay, **kw)
    banded = _lanes(feats, projs, dv, lay,
                                        x_band=x_band, x_tile=x_tile,
                                        x_align=x_align, **kw)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_rows8_band16_config():
    """The fallback (R=8, band=16) config must agree too."""
    feats, projs, dv, pairs, _ = _setup(H=16, W=16, V=3, D=8)
    V, H, W, C = feats.shape
    assert check_group_coverage(pairs, dv[None], H, W, 8, 16)
    lay = make_layout(H, W, 512)
    got = _lanes(
        feats, projs, dv, lay, rows_per_step=8, band=16,
        compute_dtype=jnp.float32, out_dtype=jnp.float32, interpret=True)
    want, _ = plane_sweep_variance(
        feats[0][None], [feats[v][None] for v in range(1, V)],
        [projs[v][None] for v in range(1, V)], projs[0][None], dv[None])
    np.testing.assert_allclose(_lanes_to_ndhwc(got, lay, C),
                               np.asarray(want[0]), rtol=1e-4, atol=1e-4)


def test_src2d_premade_matches():
    """Pre-built warp-layout source (+margin rows) must reproduce the
    features-path variance exactly."""
    feats, projs, dv, pairs, _ = _setup(H=16, W=24, V=4)
    V, H, W, C = feats.shape
    lay = make_layout(H, W, 512)
    kw = dict(rows_per_step=4, band=8, compute_dtype=jnp.float32,
              out_dtype=jnp.float32, interpret=True)
    want = _lanes(feats, projs, dv, lay, **kw)
    # emulate conv2d_cm(out_layout='warp'): per view block of hm rows,
    # data rows at row0, data cols at lane 0, zeros to w_pad
    hm, row0 = H + 4, 2
    w_pad = -(-W // 128) * 128
    src = np.zeros((V * hm * C, w_pad), np.float32)
    fnp = np.asarray(feats)
    for v in range(V):
        block = np.transpose(fnp[v], (0, 2, 1))       # [H, C, W]
        src[(v * hm + row0) * C:(v * hm + row0 + H) * C, :W] = \
            block.reshape(H * C, W)
    got = _lanes(
        None, projs, dv, lay, src2d=jnp.asarray(src),
        src_meta=(V, hm, row0, C, w_pad), **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_runtime_violation_counter_y_band():
    """A y-band too small for the geometry must be COUNTED at runtime
    (round-2 verdict weak #2: the kernel used to zero out-of-band taps
    silently). The counter fires iff check_group_coverage fails."""
    feats, projs, dv, pairs, _ = _setup()
    V, H, W, C = feats.shape
    assert not check_group_coverage(pairs, dv[None], H, W, 4, 2)
    lay = make_layout(H, W, 512)
    _, viol = plane_sweep_variance_lanes(
        feats, projs, dv, lay, rows_per_step=4, band=2,
        compute_dtype=jnp.float32, out_dtype=jnp.float32, interpret=True)
    assert int(viol) > 0


def test_runtime_violation_counter_planes_mode():
    """Same detection on the PRODUCTION planes-mode kernel (the path the
    fused cascade always takes)."""
    feats, projs, dv, pairs, dvals = _setup()
    V, H, W, C = feats.shape
    D = dv.shape[0]
    lay = make_layout(H, W, 512)
    lo = jnp.broadcast_to(dvals[0, 0], (H, W)).astype(jnp.float32)
    step = jnp.broadcast_to((dvals[0, -1] - dvals[0, 0]) / (D - 1),
                            (H, W)).astype(jnp.float32)
    _, viol = plane_sweep_variance_lanes(
        feats, projs, None, lay, depth_planes=(lo, step, D),
        rows_per_step=4, band=2, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, interpret=True)
    assert int(viol) > 0
    # and the covered config reports exactly zero
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    _, viol0 = plane_sweep_variance_lanes(
        feats, projs, None, lay, depth_planes=(lo, step, D),
        rows_per_step=4, band=8, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, interpret=True)
    assert int(viol0) == 0


def test_runtime_violation_counter_x_band():
    """An x-band window too narrow for the epipolar spread fires the
    counter even when the y-band covers."""
    feats, projs, dv, pairs, _ = _setup(H=16, W=24, V=4)
    V, H, W, C = feats.shape
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    assert not check_group_coverage(pairs, dv[None], H, W, 4, 8,
                                    x_band=8, x_tile=8, x_align=8)
    lay = make_layout(H, W, 512)
    _, viol = plane_sweep_variance_lanes(
        feats, projs, dv, lay, rows_per_step=4, band=8,
        x_band=8, x_tile=8, x_align=8,
        compute_dtype=jnp.float32, out_dtype=jnp.float32, interpret=True)
    assert int(viol) > 0


def test_coverage_probe_single_plane_tail_chunk():
    """D % 16 == 1 leaves the chunked probe a single-plane tail chunk;
    linspace_depth_samples(ndepth=1) used to divide by zero and the NaN
    coords silently disabled the fast path for covered geometries
    (ADVICE r3). The probe must agree with the NaN-free chunk sizes."""
    feats, projs, dv, pairs, _ = _setup()
    V, H, W, C = feats.shape
    for D in (16, 17, 33):
        dvals = np.linspace(600.0, 700.0, D, dtype=np.float32)[None]
        got = check_group_coverage(pairs, dvals, H, W, 4, 8)
        assert got, f"probe false-negative at D={D}"
    # and a genuinely uncovered band still fails at the awkward sizes
    assert not check_group_coverage(
        pairs, np.linspace(600.0, 700.0, 17, dtype=np.float32)[None],
        H, W, 4, 2)
