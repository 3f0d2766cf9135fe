"""Checkpointing: orbax for the full train state, plus the reference's
two-artifact split (backbone vs NeRF) so backbone-only export feeds eval.

Parity target: /root/reference/train_rcmvsnet.py:214-226 (per-epoch
model_{epoch}_cas.ckpt {epoch, model, optimizer} + model_{epoch}_nerf.ckpt
{model}) and the resume scan at :542-557 (newest epoch wins).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Optional

import flax.serialization
import jax
import numpy as np

from .state import TrainState

_CAS_RE = re.compile(r"model_(\d+)_cas\.msgpack$")


def _to_host(tree):
    """Host numpy + state-dict form (msgpack can't serialize tuples)."""
    return flax.serialization.to_state_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x), tree))


def save_checkpoint(logdir: str, state: TrainState, epoch: int) -> None:
    """Write model_{epoch}_cas.msgpack (backbone + optimizer + epoch) and
    model_{epoch}_nerf.msgpack (render branch), mirroring the reference's
    artifact split."""
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    cas = {
        "epoch": epoch,
        "step": np.asarray(state.step),
        "params": _to_host(state.params["cascade"]),
        "batch_stats": _to_host(state.batch_stats["cascade"]),
        "opt_state": _to_host(state.opt_state),
    }
    nerf = {
        "params": _to_host(state.params["render"]),
        "batch_stats": _to_host(state.batch_stats["render"]),
    }
    (logdir / f"model_{epoch:06d}_cas.msgpack").write_bytes(
        flax.serialization.msgpack_serialize(cas))
    (logdir / f"model_{epoch:06d}_nerf.msgpack").write_bytes(
        flax.serialization.msgpack_serialize(nerf))


def latest_epoch(logdir: str) -> Optional[int]:
    epochs = []
    if os.path.isdir(logdir):
        for fn in os.listdir(logdir):
            m = _CAS_RE.search(fn)
            if m:
                epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def restore_checkpoint(logdir: str, state: TrainState,
                       epoch: Optional[int] = None):
    """Restore (state, start_epoch) from the newest (or given) epoch pair.

    The serialized trees are restored onto the given template state so
    dtypes/structures match exactly.
    """
    if epoch is None:
        epoch = latest_epoch(logdir)
    if epoch is None:
        return state, 0
    logdir = Path(logdir)
    cas = flax.serialization.msgpack_restore(
        (logdir / f"model_{epoch:06d}_cas.msgpack").read_bytes())
    nerf = flax.serialization.msgpack_restore(
        (logdir / f"model_{epoch:06d}_nerf.msgpack").read_bytes())

    def onto(template, stored):
        return flax.serialization.from_state_dict(template, stored)

    new_state = state.replace(
        step=jax.numpy.asarray(cas["step"]),
        params={"cascade": onto(state.params["cascade"], cas["params"]),
                "render": onto(state.params["render"], nerf["params"])},
        batch_stats={"cascade": onto(state.batch_stats["cascade"],
                                     cas["batch_stats"]),
                     "render": onto(state.batch_stats["render"],
                                    nerf["batch_stats"])},
        opt_state=onto(state.opt_state, cas["opt_state"]))
    return new_state, int(cas["epoch"]) + 1


def export_backbone(logdir: str, state: TrainState, name: str) -> str:
    """Standalone backbone artifact for inference (params + batch_stats)."""
    path = Path(logdir) / name
    blob = {
        "params": _to_host(state.params["cascade"]),
        "batch_stats": _to_host(state.batch_stats["cascade"]),
    }
    path.write_bytes(flax.serialization.msgpack_serialize(blob))
    return str(path)


def load_backbone(path: str, template_variables):
    """Load an export_backbone artifact onto a template variables dict."""
    blob = flax.serialization.msgpack_restore(Path(path).read_bytes())
    return {
        "params": flax.serialization.from_state_dict(
            template_variables["params"], blob["params"]),
        "batch_stats": flax.serialization.from_state_dict(
            template_variables["batch_stats"], blob["batch_stats"]),
    }
