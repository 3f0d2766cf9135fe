"""Reference-shape GSPMD partition check (VERDICT r4 weak #5).

The 1-vs-8 parity tests (test_multichip.py) prove the data-parallel math
at toy shapes; this test proves the PRODUCTION train step still partitions
cleanly at the reference training geometry — 512×640, B=8 sharded 8-way,
V=4, 48/32/8 cascade, 192-hypothesis sweep
(/root/reference/train_rcmvsnet.py:38-46) — by compiling it on the virtual
8-device CPU mesh and inspecting the partitioned HLO:

  * every cross-device collective (all-reduce / all-gather / all-to-all /
    collective-permute) must move only parameter/BN/metric-sized data —
    gradient sync and SyncBN moments, never a cost volume. A GSPMD
    regression that replicates or reshards a full-batch volume shows up as
    a collective moving tens-to-hundreds of MB and fails the byte bound;
  * at least one all-reduce must exist (the gradient sync itself).

Compile-only (jit .lower().compile() on abstract shardings): nothing is
executed, so the full reference geometry stays cheap enough for CI.
"""
from __future__ import annotations

import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rcmvsnet_tpu.config import Config
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
from rcmvsnet_tpu.parallel.mesh import make_mesh
from rcmvsnet_tpu.train.state import create_train_state
from rcmvsnet_tpu.train.step import make_train_step

N_DEV = 8
H, W, V, NDEPTH = 512, 640, 4, 192

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}
_SHAPE_RE = re.compile(r"\b(pred|bf16|f16|f32|f64|s8|s16|s32|s64|u8|u16|u32|u64)"
                       r"\[([0-9,]*)\]")


def _line_bytes(line: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(line):
        elems = 1
        for d in filter(None, dims.split(",")):
            elems *= int(d)
        total += elems * _DTYPE_BYTES[dt]
    return total


@pytest.mark.slow
def test_refshape_partitioning_has_no_volume_collectives():
    config = Config()  # production 48/32/8 cascade, full render branch
    mesh = make_mesh(N_DEV)

    # one real (small-cost) scene fixes every leaf's shape/dtype; only
    # abstract ShapeDtypeStructs reach the compiler
    template = make_synthetic_batch(B=1, V=V, H=H, W=W, ndepth=NDEPTH, seed=0)

    state_shapes = jax.eval_shape(
        partial(create_train_state, config, template, 1000),
        jax.random.PRNGKey(0))

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    def batch_sds(x):
        x = np.asarray(x)
        if x.ndim == 0:  # w_aug scalar stays replicated
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl)
        return jax.ShapeDtypeStruct((N_DEV,) + x.shape[1:], x.dtype,
                                    sharding=bsh)

    batch_abs = jax.tree_util.tree_map(batch_sds, template)
    state_abs = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=repl),
        state_shapes)
    rng_abs = jax.ShapeDtypeStruct((2,), np.uint32, sharding=repl)

    train_step = make_train_step(config, steps_per_epoch=1000)
    with mesh:
        compiled = jax.jit(train_step).lower(
            state_abs, batch_abs, rng_abs).compile()
    hlo = compiled.as_text()

    coll_lines = [ln for ln in hlo.splitlines()
                  if re.search(r"\ball-(reduce|gather|to-all)|"
                               r"\bcollective-permute", ln)
                  and "-start(" not in ln.replace("all-reduce-start",
                                                  "all-reduce-start(")]
    # keep only op definitions (lines with '='), drop -done/update lines
    coll_lines = [ln for ln in coll_lines if "=" in ln]

    assert any("all-reduce" in ln for ln in coll_lines), (
        "no gradient all-reduce found — batch axis not actually sharded?")

    # Params + BN stats + metric scalars are a few MB total; any cost
    # volume at these shapes is >=100 MB even per-shard. 32 MB cleanly
    # separates the two worlds while allowing XLA's all-reduce bucketing.
    LIMIT = 32 * 1024 * 1024
    offenders = [(b, ln[:200]) for ln in coll_lines
                 if (b := _line_bytes(ln)) > LIMIT]
    assert not offenders, (
        "oversized collectives (full-tensor replication/reshard of a "
        f"volume?):\n" + "\n".join(f"{b/1e6:.1f} MB: {ln}"
                                   for b, ln in offenders))
