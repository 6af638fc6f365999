"""Paired wav2vec2 (siamese BCE) model + task: sequence construction, masking
invariance, training, score-based EER."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
from w2v2_speaker_tpu.models.wav2vec2_paired import (
    Wav2Vec2PairedConfig,
    Wav2Vec2PairedModel,
)
from w2v2_speaker_tpu.train.paired_task import (
    PairedSpeakerTask,
    paired_scores_to_metrics,
)
from w2v2_speaker_tpu.train.state import TrainState

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
    layerdrop=0.0,
    mask_time_prob=0.0,
)
CFG = Wav2Vec2PairedConfig(w2v2=TINY)
N = 1200


def _pair_batch(seed, bs=8):
    """Half same-frequency pairs (label 1), half different (label 0)."""
    rng = np.random.default_rng(seed)
    t = np.arange(N) / 16000
    freqs = [300.0, 800.0, 1500.0, 2600.0]

    def utt(f):
        return (
            np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
            + 0.2 * rng.normal(size=N)
        ).astype(np.float32)

    labels, wa, wb = [], [], []
    for i in range(bs):
        same = i % 2 == 0
        fa = freqs[rng.integers(len(freqs))]
        fb = fa if same else freqs[(freqs.index(fa) + 1 + rng.integers(2)) % 4]
        wa.append(utt(fa))
        wb.append(utt(fb))
        labels.append(int(same))
    return {
        "features_a": jnp.asarray(np.stack(wa)),
        "features_b": jnp.asarray(np.stack(wb)),
        "mask_a": jnp.ones((bs, N), bool),
        "mask_b": jnp.ones((bs, N), bool),
        "labels": jnp.asarray(np.asarray(labels)),
    }


@pytest.fixture(scope="module")
def task_and_state():
    model = Wav2Vec2PairedModel(cfg=CFG)
    task = PairedSpeakerTask(model=model)
    batch = _pair_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(2e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    return task, state


def test_sequence_length_is_cls_f1_sep_f2_sep(task_and_state):
    task, state = task_and_state
    batch = _pair_batch(1, bs=2)
    out = task.model.apply(
        {"params": state.params},
        batch["features_a"],
        batch["features_b"],
        train=False,
    )
    assert out["logit"].shape == (2, 1)
    assert out["cls_embedding"].shape == (2, TINY.hidden_size)


def test_padding_invariance_of_scores(task_and_state):
    task, state = task_and_state
    rng = np.random.default_rng(3)
    n_short = 900
    wa = rng.normal(size=N).astype(np.float32)
    wb_short = rng.normal(size=n_short).astype(np.float32)

    wb_padded = np.zeros(N, np.float32)
    wb_padded[:n_short] = wb_short
    mask_b = np.zeros(N, bool)
    mask_b[:n_short] = True

    score_padded = task.score_fn(
        state.params,
        state.model_state,
        {
            "features_a": jnp.asarray(wa[None]),
            "features_b": jnp.asarray(wb_padded[None]),
            "mask_a": jnp.ones((1, N), bool),
            "mask_b": jnp.asarray(mask_b[None]),
        },
    )
    score_exact = task.score_fn(
        state.params,
        state.model_state,
        {
            "features_a": jnp.asarray(wa[None]),
            "features_b": jnp.asarray(wb_short[None]),
            "mask_a": jnp.ones((1, N), bool),
            "mask_b": jnp.ones((1, n_short), bool),
        },
    )
    assert float(score_padded[0]) == pytest.approx(
        float(score_exact[0]), abs=2e-5
    )


def test_bce_training_learns(task_and_state):
    task, state = task_and_state
    from w2v2_speaker_tpu.train.steps import make_train_step

    def step_fn(state, batch):
        new_rng, step_rng = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True
        )(state.params, state.model_state, batch, step_rng, True)
        state = state.apply_gradients(grads, aux["model_state"]).replace(
            rng=new_rng
        )
        return state, aux["metrics"]

    step = jax.jit(step_fn)
    losses = []
    for i in range(25):
        state, m = step(state, _pair_batch(i + 10))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_paired_scores_to_metrics():
    gt = [1, 0] * 50
    scores = [0.8 + 0.1 * np.random.default_rng(i).random() for i in range(50)]
    scores = []
    rng = np.random.default_rng(0)
    for g in gt:
        scores.append(0.7 + 0.2 * rng.random() if g else 0.2 + 0.2 * rng.random())
    m = paired_scores_to_metrics(gt, scores)
    assert m["eer"] == 0.0
    # degenerate: all same label -> sentinel
    m = paired_scores_to_metrics([1, 1], [0.5, 0.6])
    assert m["eer"] == 1 and m["eer_threshold"] == 1337
