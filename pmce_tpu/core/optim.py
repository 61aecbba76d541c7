"""Optimizers and LR schedules (optax).

Mirrors the reference's optimizer/scheduler factory
(/root/reference/lib/funcs_utils.py:77-108): adam / sgd / rmsprop and a
MultiStepLR-style epoch schedule (lr × factor at each milestone epoch).
"""

from __future__ import annotations

import optax

from pmce_tpu.core.config import TrainConfig


def multistep_schedule(base_lr: float, milestones: list[int],
                       factor: float, steps_per_epoch: int
                       ) -> optax.Schedule:
    """MultiStepLR: multiply by ``factor`` at each milestone epoch."""
    # optax's piecewise_constant_schedule multiplies CUMULATIVELY at each
    # boundary, so each milestone contributes the single-step factor.
    boundaries = {int(m) * steps_per_epoch: factor
                  for m in sorted(milestones)}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int
                    ) -> optax.GradientTransformation:
    if cfg.scheduler == "step":
        schedule = multistep_schedule(
            cfg.lr, cfg.lr_step, cfg.lr_factor, max(1, steps_per_epoch))
    else:
        schedule = optax.constant_schedule(cfg.lr)

    if cfg.optimizer == "adam":
        return optax.adam(schedule)
    if cfg.optimizer == "sgd":
        return optax.sgd(schedule, momentum=0.9, nesterov=True)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(schedule)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
