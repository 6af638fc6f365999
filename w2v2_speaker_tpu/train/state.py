"""Train state: parameters, optimizer state, mutable model state, PRNG.

Functional re-expression of the reference's LightningModule mutation patterns
(SURVEY §7.3): freeze/unfreeze at step k becomes an optax `masked` wrapper
switched by step count (`make_freeze_schedule_tx`), replacing the
`on_after_backward` requires_grad mutation at
`/root/reference/src/lightning_modules/speaker/wav2vec2_fc.py:339-361`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_freeze_schedule_tx"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    model_state: Any  # batch_stats etc.
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_model_state=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=(
                new_model_state
                if new_model_state is not None
                else self.model_state
            ),
        )

    @classmethod
    def create(cls, *, apply_fn, params, tx, model_state=None, rng=None):
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state=model_state if model_state is not None else {},
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            tx=tx,
            apply_fn=apply_fn,
        )


def make_freeze_schedule_tx(
    inner: optax.GradientTransformation,
    frozen_predicate: Callable[[str], bool],
    num_frozen_steps: Optional[int],
) -> optax.GradientTransformation:
    """Zero updates for params matching `frozen_predicate` while
    step < num_frozen_steps (None freezes forever, 0 disables).

    The predicate receives the '/'-joined param path. Implemented as a
    step-conditioned mask so the whole schedule stays inside one jitted
    update (no python-side param surgery at step k).
    """
    if num_frozen_steps == 0:
        return inner

    def _gate_tree(tree, gate):
        flat = flax.traverse_util.flatten_dict(tree)
        gated = {
            k: (
                u * gate
                if frozen_predicate("/".join(map(str, k)))
                else u
            )
            for k, u in flat.items()
        }
        return flax.traverse_util.unflatten_dict(gated)

    def init(params):
        return (inner.init(params), jnp.zeros((), dtype=jnp.int32))

    def update(updates, state, params=None):
        inner_state, count = state
        # zero frozen grads *before* the inner optimizer, matching the
        # reference's grad-zeroing in on_after_backward (optimizer moments
        # see zeros during the frozen phase)
        if num_frozen_steps is None:
            gate = jnp.zeros((), dtype=jnp.float32)
        else:
            gate = (count >= num_frozen_steps).astype(jnp.float32)
        gated_grads = _gate_tree(updates, gate)
        new_updates, new_inner = inner.update(gated_grads, inner_state, params)
        # also gate the resulting updates (weight decay etc. must not move
        # frozen params)
        new_updates = _gate_tree(new_updates, gate)
        return new_updates, (new_inner, count + 1)

    return optax.GradientTransformation(init, update)
