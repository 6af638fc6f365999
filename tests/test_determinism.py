"""Determinism: identical seeds produce identical training trajectories and
embeddings (the functional-JAX answer to the reference's `deterministic`
trainer flag, SURVEY §5.2 — without its 20x slowdown)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
from w2v2_speaker_tpu.models.wav2vec2_speaker import (
    Wav2Vec2SpeakerConfig,
    Wav2Vec2SpeakerModel,
)
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

TINY = Wav2Vec2Config(
    conv_dim=(16, 16),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    layerdrop=0.1,       # exercises the stochastic paths
    mask_time_prob=0.1,
    hidden_dropout=0.1,
)


def _run(seed: int, steps: int = 5):
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=TINY, stat_pooling_type="mean"),
        num_speakers=6,
    )
    task = SpeakerTask(model=model, mode="ce")
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            rng.normal(size=(8, 1600)).astype(np.float32)
        ),
        "mask": jnp.ones((8, 1600), bool),
        "labels": jnp.asarray(rng.integers(0, 6, size=8)),
    }
    params, mstate = task.init(jax.random.PRNGKey(seed), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3),
        model_state=mstate, rng=jax.random.PRNGKey(seed + 1),
    )
    step = make_train_step(task)
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    emb = task.embed_fn(
        state.params, state.model_state, batch["features"], batch["mask"]
    )
    return losses, np.asarray(emb)


def test_same_seed_identical_trajectory():
    l1, e1 = _run(7)
    l2, e2 = _run(7)
    assert l1 == l2
    np.testing.assert_array_equal(e1, e2)


def test_different_seed_differs():
    l1, _ = _run(7)
    l2, _ = _run(8)
    assert l1 != l2
