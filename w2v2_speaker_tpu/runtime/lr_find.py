"""Learning-rate range test (auto_lr_find).

Equivalent of the reference's tune path (`/root/reference/src/main.py:458-493`
driving PL's lr_find, artifacts under `paper_results/auto_lr_find/`):
exponentially sweep the LR from `min_lr` to `max_lr` over `num_steps`
training steps, record the (smoothed) loss per LR, stop early on divergence,
dump `data.json` with the lr/loss arrays and the suggestion (steepest
negative loss gradient), and return the suggested LR.
"""

from __future__ import annotations

import json
import pathlib
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np
import optax

from ..parallel.mesh import shard_batch, strip_host_fields
from ..train.state import TrainState

__all__ = ["lr_range_test"]


def lr_range_test(
    task,
    init_params,
    init_model_state,
    train_batches: Iterable[Dict],
    mesh,
    min_lr: float = 1e-8,
    max_lr: float = 1.0,
    num_steps: int = 100,
    smoothing: float = 0.05,
    diverge_factor: float = 4.0,
    output_dir: Optional[pathlib.Path] = None,
) -> Dict:
    """Returns {"lr": [...], "loss": [...], "suggestion": float}."""
    lrs = np.exp(
        np.linspace(np.log(min_lr), np.log(max_lr), num_steps)
    )

    # injectable LR via schedule-on-step lookup
    lr_table = jax.numpy.asarray(lrs, dtype=jax.numpy.float32)

    def schedule(count):
        idx = jax.numpy.clip(count, 0, num_steps - 1)
        return lr_table[idx]

    tx = optax.adam(schedule)
    state = TrainState.create(
        apply_fn=task.model.apply,
        params=init_params,
        tx=tx,
        model_state=init_model_state,
        rng=jax.random.PRNGKey(0),
    )

    @jax.jit
    def step(state, batch):
        new_rng, srng = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            state.params, state.model_state, batch, srng, True
        )
        new_state = state.apply_gradients(grads, aux["model_state"]).replace(
            rng=new_rng
        )
        return new_state, loss

    losses = []
    smoothed = None
    best = np.inf
    it = iter(train_batches)
    ref_shape = None
    for i in range(num_steps):
        try:
            batch = strip_host_fields(next(it))
        except StopIteration:
            it = iter(train_batches)
            batch = strip_host_fields(next(it))
        if ref_shape is None:
            ref_shape = batch["features"].shape
        if batch["features"].shape != ref_shape:
            continue
        state, loss = step(state, shard_batch(batch, mesh))
        loss = float(loss)
        smoothed = (
            loss
            if smoothed is None
            else smoothing * loss + (1 - smoothing) * smoothed
        )
        losses.append(smoothed)
        best = min(best, smoothed)
        if not np.isfinite(smoothed) or smoothed > diverge_factor * best:
            break

    lr_used = lrs[: len(losses)]
    # suggestion: lr at the steepest descent of the smoothed loss
    if len(losses) > 3:
        grads_ = np.gradient(np.asarray(losses))
        suggestion = float(lr_used[int(np.argmin(grads_))])
    else:
        suggestion = float(min_lr)

    result = {
        "lr": lr_used.tolist(),
        "loss": losses,
        "suggestion": suggestion,
    }
    if output_dir is not None:
        output_dir = pathlib.Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        (output_dir / "data.json").write_text(json.dumps(result, indent=2))
        _write_plot(output_dir / "plot.png", lr_used, losses, suggestion)
    return result


def _write_plot(path, lrs, losses, suggestion) -> None:
    """Loss-vs-LR figure beside the JSON, matching the reference's lr-tune
    artifacts (`/root/reference/src/main.py:480-491` saves fig + json).
    Matplotlib is optional at runtime — the JSON is the canonical record."""
    if not len(losses):
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(lrs, losses)
    ax.set_xscale("log")
    ax.axvline(
        suggestion, color="red", linestyle="--",
        label=f"suggestion {suggestion:.2e}",
    )
    ax.set_xlabel("learning rate")
    ax.set_ylabel("smoothed loss")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
