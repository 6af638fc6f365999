"""Learning-rate schedules as optax schedule functions (step -> lr).

Covers the reference's schedule config group (`config/optim/schedule/*.yaml`
selecting torch classes, plus the custom tri-stage at
`/root/reference/src/optim/schedule/tri_stage.py:22-99`):

- ``one_cycle``   torch OneCycleLR with cos anneal (default in every
                  experiment preset) — optax.cosine_onecycle_schedule has the
                  same parametrization (pct_start, div_factor,
                  final_div_factor)
- ``tri_stage``   linear warmup -> constant -> exponential decay, index-exact
                  with the reference's linspace/logspace tables
- ``constant``    StepLR(gamma=1) == constant
- ``step``        StepLR
- ``multi_step``  MultiStepLR (wav2spk recipe)
- ``exp_decay``   tri-stage with 0/0/1 ratios
- ``cyclic``      CyclicLR triangular mode ("Fan et al." recipe)
- ``ReduceLROnPlateauController``  host-side controller (metric-driven decay);
                  emits a multiplicative factor consumed by the train loop.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp
import optax

__all__ = [
    "one_cycle",
    "tri_stage",
    "constant",
    "step_decay",
    "multi_step_decay",
    "exp_decay",
    "cyclic",
    "ReduceLROnPlateauController",
    "get_schedule",
]

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def one_cycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def tri_stage(
    max_steps: int,
    warmup_stage_ratio: float,
    constant_stage_ratio: float,
    decay_stage_ratio: float,
    initial_lr: float,
    base_lr: float,
    final_lr: float,
) -> Schedule:
    """Index-exact port of TriStageLearningRateLambdaLRFunction (x base_lr:
    the reference returns a factor multiplied by base_lr; we return the lr)."""
    total = warmup_stage_ratio + constant_stage_ratio + decay_stage_ratio
    if abs(total - 1.0) >= 1e-9:
        raise ValueError("stage ratios need to add up to 1")
    w = math.floor(max_steps * warmup_stage_ratio)
    c = math.floor(max_steps * constant_stage_ratio)
    d = math.floor(max_steps * decay_stage_ratio)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        # linspace(initial, base, w)[i]
        warm = initial_lr + (base_lr - initial_lr) * step / max(w - 1, 1)
        # logspace(ln base, ln final, d + 2)[j], j = step - (w + c)
        j = step - (w + c)
        decay = jnp.exp(
            math.log(base_lr)
            + (math.log(final_lr) - math.log(base_lr)) * j / max(d + 1, 1)
        )
        lr = jnp.where(
            step < w,
            warm,
            jnp.where(
                step <= w + c,
                base_lr,
                jnp.where(step <= max_steps, decay, final_lr),
            ),
        )
        return lr

    return schedule


def constant(lr: float) -> Schedule:
    return lambda step: jnp.full((), lr, dtype=jnp.float32)


def step_decay(lr: float, step_size: int, gamma: float = 0.1) -> Schedule:
    def schedule(step):
        k = jnp.asarray(step) // step_size
        return lr * gamma ** k.astype(jnp.float32)

    return schedule


def multi_step_decay(
    lr: float, milestones: Sequence[int], gamma: float = 0.1
) -> Schedule:
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        k = (jnp.asarray(step)[None] >= ms).sum()
        return lr * gamma ** k.astype(jnp.float32)

    return schedule


def exp_decay(max_steps: int, base_lr: float, final_lr: float) -> Schedule:
    return tri_stage(max_steps, 0.0, 0.0, 1.0, base_lr, base_lr, final_lr)


def cyclic(
    base_lr: float, max_lr: float, step_size_up: int, step_size_down: int = None
) -> Schedule:
    """torch CyclicLR, mode='triangular'."""
    down = step_size_down if step_size_down is not None else step_size_up
    period = step_size_up + down

    def schedule(step):
        pos = jnp.asarray(step, dtype=jnp.float32) % period
        frac = jnp.where(
            pos < step_size_up, pos / step_size_up, (period - pos) / down
        )
        return base_lr + (max_lr - base_lr) * frac

    return schedule


class ReduceLROnPlateauController:
    """Host-side torch ReduceLROnPlateau equivalent: call `update(metric)`
    after each validation; multiply the schedule lr by `factor_value`."""

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 10,
        mode: str = "min",
        min_factor: float = 1e-8,
    ):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_factor = min_factor
        self.best = None
        self.bad_count = 0
        self.factor_value = 1.0

    def update(self, metric: float) -> float:
        better = (
            self.best is None
            or (self.mode == "min" and metric < self.best)
            or (self.mode == "max" and metric > self.best)
        )
        if better:
            self.best = metric
            self.bad_count = 0
        else:
            self.bad_count += 1
            if self.bad_count > self.patience:
                self.factor_value = max(
                    self.factor_value * self.factor, self.min_factor
                )
                self.bad_count = 0
        return self.factor_value


_SCHEDULES = {
    "one_cycle": one_cycle,
    "tri_stage": tri_stage,
    "constant": constant,
    "step": step_decay,
    "multi_step": multi_step_decay,
    "exp_decay": exp_decay,
    "cyclic": cyclic,
}


def get_schedule(name: str, **kwargs) -> Schedule:
    if name not in _SCHEDULES:
        raise ValueError(
            f"unknown schedule '{name}', available: {sorted(_SCHEDULES)}"
        )
    return _SCHEDULES[name](**kwargs)
