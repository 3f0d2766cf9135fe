"""Lane-layout resampling kernels for the cost regularizer's U-Net.

The lanes-resident CostRegNet (ops/pallas_costreg.py) originally moved
between resolution levels with XLA passes (subsample_hw / stuff_hw_z):
slice out the data region, reshape to [P, C, hp, wp], stride/pad rows,
MXU-deinterleave columns, pad margins back.  Each of those steps re-tiles
the minor dimension, which XLA lowers at a small fraction of HBM
bandwidth — profiled at ~25 ms/forward at 1152×864, more than the cost
regularizer's conv kernels themselves.

These kernels do each resample in ONE pallas_call that reads and writes
the flat [P, C', lanesp] layout directly:

  * rows move by static lane-offset slices (row r lives at lane offset
    halo + r·wp — contiguous row blocks per grid step, no re-tiling);
  * k rows stack along SUBLANES ([k·C', wp]) so the column
    subsample/zero-stuff runs as one well-fed MXU matmul against the
    same 0/1 selection matrices the XLA path used (exact: each output
    column copies exactly one input column or is zero);
  * zero borders and margins come from an aliased zero template — the
    kernels only write interior rows (and, for the transposed-conv
    stuff, only the odd output rows/planes the dilation populates).

Numerical contract: bit-identical to subsample_hw / stuff_hw_z
(selection matrices only copy values) — tests/test_pallas_resample.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_costreg import LaneLayout, _col_stuff_mat, _col_subsample_mat


def _rows_per_step(h_out: int, cap: int = 16) -> int:
    """Largest k ≤ cap dividing h_out (grid rows must tile exactly)."""
    for k in range(min(cap, h_out), 0, -1):
        if h_out % k == 0:
            return k
    return 1


def _sub_kernel(s_ref, x_ref, tmpl_ref, o_ref, *, k: int, C: int, wp: int,
                wp2: int):
    xs = x_ref[0]                                  # [C, 2k·wp]
    rows = jnp.concatenate(
        [xs[:, (2 * t) * wp:(2 * t) * wp + wp] for t in range(k)], axis=0)
    y = jnp.dot(rows, s_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = jnp.concatenate(
        [y[t * C:(t + 1) * C] for t in range(k)],
        axis=1).astype(o_ref.dtype)                # [C, k·wp2]


def subsample_lanes(y: jnp.ndarray, lay: LaneLayout, lay2: LaneLayout,
                    interpret: bool = False) -> jnp.ndarray:
    """Stride-2 (h, w) subsample, lanes layout in and out.

    y: [P, C', lanesp]; returns [P, C', lanesp2] keeping the torch
    stride-2 output positions (even real rows/cols; the row/col borders
    and margins of the output layout are zero).  Same values as
    pallas_costreg.subsample_hw.
    """
    P, C, lanesp = y.shape
    assert lanesp == lay.lanesp, (lanesp, lay)
    h2, wp, wp2 = lay2.h, lay.wp, lay2.wp
    assert lay.h // 2 >= h2, (lay.h, h2)
    k = _rows_per_step(h2)

    S = jnp.asarray(_col_subsample_mat(wp, wp2), y.dtype)
    template = jnp.zeros((P, C, lay2.lanesp), y.dtype)
    lane = lambda v: pl.multiple_of(v, 128)
    # out rows i0..i0+k−1 (0-based real) read in padded rows 1+2i,
    # i.e. the contiguous in-lane span starting at (1+2·i0)·wp
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(2 * k * wp)),
        lambda p, r: (p, 0, lane(lay.halo + (1 + 2 * r * k) * wp)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(k * wp2)),
        lambda p, r: (p, 0, lane(lay2.halo + (1 + r * k) * wp2)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sub_kernel, k=k, C=C, wp=wp, wp2=wp2),
        grid=(P, h2 // k),
        in_specs=[
            pl.BlockSpec((wp, wp2), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM),
            in_spec,
            out_spec,                    # aliased zero template
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((P, C, lay2.lanesp), y.dtype),
        input_output_aliases={2: 0},
        **({"interpret": True} if interpret else {}),
    )(S, y, template)


def _stuff_kernel(s_ref, x_ref, tmpl_ref, o_ref, *, k: int, C: int,
                  wp: int, wp2: int):
    xs = x_ref[0]                                  # [C, k·wp]
    rows = jnp.concatenate(
        [xs[:, t * wp:(t + 1) * wp] for t in range(k)], axis=0)
    y = jnp.dot(rows, s_ref[:], preferred_element_type=jnp.float32)
    zero = jnp.zeros((C, wp2), jnp.float32)
    pieces = []
    for t in range(k):                             # dilated rows 2x+1
        pieces.append(y[t * C:(t + 1) * C])
        pieces.append(zero)
    o_ref[0] = jnp.concatenate(pieces, axis=1).astype(o_ref.dtype)


def stuff_lanes(y: jnp.ndarray, lay: LaneLayout, lay2: LaneLayout,
                interpret: bool = False) -> jnp.ndarray:
    """Zero-stuff for the k=3/s=2/p=1/op=1 transposed conv, lanes layout
    in and out: interior-dilate z/h/w by 2 with the torch (1, 2) edge
    pads.  y: [D+2, C', lanesp] → [2D+2, C', lanesp2] at doubled
    resolution.  Same values as pallas_costreg.stuff_hw_z.
    """
    P, C, lanesp = y.shape
    assert lanesp == lay.lanesp, (lanesp, lay)
    D, h = P - 2, lay.h
    wp, wp2 = lay.wp, lay2.wp
    assert lay2.h == 2 * h and lay2.hp == 2 * h + 2, (lay, lay2)
    k = _rows_per_step(h)

    S = jnp.asarray(_col_stuff_mat(wp, wp2), y.dtype)
    template = jnp.zeros((2 * D + 2, C, lay2.lanesp), y.dtype)
    lane = lambda v: pl.multiple_of(v, 128)
    # input real rows x0..x0+k−1 (padded 1+x) → output padded rows
    # 1+2x (stride 2); one contiguous out block of 2k rows starting at
    # (1+2·x0)·wp2 holds them at even in-block positions, zeros between
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(k * wp)),
        lambda d, r: (d + 1, 0, lane(lay.halo + (1 + r * k) * wp)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(2 * k * wp2)),
        lambda d, r: (2 * d + 1, 0,
                      lane(lay2.halo + (1 + 2 * r * k) * wp2)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stuff_kernel, k=k, C=C, wp=wp, wp2=wp2),
        grid=(D, h // k),
        in_specs=[
            pl.BlockSpec((wp, wp2), lambda d, r: (0, 0),
                         memory_space=pltpu.VMEM),
            in_spec,
            out_spec,                    # aliased zero template
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2 * D + 2, C, lay2.lanesp),
                                       y.dtype),
        input_output_aliases={2: 0},
        **({"interpret": True} if interpret else {}),
    )(S, y, template)
