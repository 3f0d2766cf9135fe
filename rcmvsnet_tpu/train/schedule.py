"""optax learning-rate schedule matching WarmupMultiStepLR.

Parity target: /root/reference/utils.py:216-260 — linear warmup from
warmup_factor over warmup_iters steps, then ×gamma at each milestone step
(milestones are in optimizer steps, computed as epoch boundaries × steps
per epoch by the caller, /root/reference/train_rcmvsnet.py:131-134).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_multistep_schedule(base_lr: float, milestones: Sequence[int],
                              gamma: float = 0.5,
                              warmup_factor: float = 1.0 / 3.0,
                              warmup_iters: int = 500,
                              warmup_method: str = "linear"):
    if warmup_method not in ("linear", "constant"):
        raise ValueError(f"unknown warmup_method {warmup_method}")
    milestones = jnp.asarray(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear":
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            factor = warmup_factor * (1 - alpha) + alpha
        else:
            factor = warmup_factor
        warmup = jnp.where(step < warmup_iters, factor, 1.0)
        decay = gamma ** jnp.sum(step >= milestones)
        return base_lr * warmup * decay

    return schedule
