"""ECAPA-TDNN, wav2spk and dummy model families: shapes, masking invariance,
AAM integration, mini training runs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.models.dummy import DummyModel
from w2v2_speaker_tpu.models.ecapa import EcapaConfig, EcapaModel, EcapaTdnn
from w2v2_speaker_tpu.models.wav2spk import Wav2SpkConfig, Wav2SpkModel
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

TINY_ECAPA = EcapaConfig(
    in_channels=24,
    channels=(64, 64, 64, 64, 96),
    res2net_scale=4,
    se_channels=16,
    attention_channels=16,
    lin_neurons=32,
)
N_SPK = 8


def _feat_batch(seed, bs=8, t=40, f=24):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_SPK, size=bs)
    templates = np.random.default_rng(0).normal(size=(N_SPK, 1, f))
    feats = templates[labels] + rng.normal(size=(bs, t, f))
    return {
        "features": jnp.asarray(feats, jnp.float32),
        "mask": jnp.ones((bs, t), bool),
        "labels": jnp.asarray(labels),
    }


def _wav_batch(seed, bs=6, n=8000):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_SPK, size=bs)
    freqs = 200.0 + 250.0 * np.arange(N_SPK)
    t = np.arange(n) / 16000
    wavs = np.stack(
        [
            np.sin(2 * np.pi * freqs[l] * t) + 0.3 * rng.normal(size=n)
            for l in labels
        ]
    ).astype(np.float32)
    return {
        "features": jnp.asarray(wavs),
        "mask": jnp.ones((bs, n), bool),
        "labels": jnp.asarray(labels),
    }


# ------------------------------------------------------------------ ECAPA

def test_ecapa_embedding_shape_and_masking_invariance():
    model = EcapaTdnn(cfg=TINY_ECAPA)
    rng = np.random.default_rng(0)
    t_max, f = 50, 24
    lengths = [50, 31]
    x = rng.normal(size=(2, t_max, f)).astype(np.float32)
    mask = np.arange(t_max)[None, :] < np.asarray(lengths)[:, None]
    x = x * mask[:, :, None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(mask)
    )
    batched = model.apply(variables, jnp.asarray(x), jnp.asarray(mask))
    assert batched.shape == (2, 32)
    # padding invariance for the short sample
    solo = model.apply(
        variables,
        jnp.asarray(x[1:2, :31]),
        jnp.ones((1, 31), bool),
    )
    np.testing.assert_allclose(
        np.asarray(batched[1]), np.asarray(solo[0]), rtol=5e-4, atol=5e-5
    )


def test_ecapa_aam_trains():
    model = EcapaModel(cfg=TINY_ECAPA, num_speakers=N_SPK, use_aam=True)
    task = SpeakerTask(model=model, mode="aam")
    batch = _feat_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(task)
    l0 = None
    for i in range(15):
        state, m = step(state, _feat_batch(i + 1))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0
    assert np.isfinite(float(m["loss"]))


def test_ecapa_ce_classifier_mode():
    model = EcapaModel(cfg=TINY_ECAPA, num_speakers=N_SPK, use_aam=False)
    task = SpeakerTask(model=model, mode="ce")
    batch = _feat_batch(3)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    loss, aux = task.loss_fn(
        params, mstate, batch, jax.random.PRNGKey(0), True
    )
    assert aux["out"]["logits"].shape == (8, N_SPK)
    assert np.isfinite(float(loss))


# ------------------------------------------------------------------ wav2spk

def test_wav2spk_forward_and_train():
    model = Wav2SpkModel(cfg=Wav2SpkConfig(), num_speakers=N_SPK)
    task = SpeakerTask(model=model, mode="ce")
    batch = _wav_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(task)
    l0 = None
    for i in range(10):
        state, m = step(state, _wav_batch(i + 1))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0


def test_wav2spk_gating_changes_output():
    batch = _wav_batch(1, bs=2)
    outs = {}
    for gating in (True, False):
        model = Wav2SpkModel(
            cfg=Wav2SpkConfig(apply_temporal_gating=gating),
            num_speakers=N_SPK,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            batch["features"],
            batch["mask"],
        )
        outs[gating] = np.asarray(
            model.apply(variables, batch["features"], batch["mask"])[
                "embedding"
            ]
        )
    assert not np.allclose(outs[True], outs[False])


def test_wav2spk_mean_std_pooling_dim():
    model = Wav2SpkModel(
        cfg=Wav2SpkConfig(stat_pooling_type="mean+std"), num_speakers=N_SPK
    )
    batch = _wav_batch(2, bs=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["features"], batch["mask"]
    )
    out = model.apply(variables, batch["features"], batch["mask"])
    assert out["embedding"].shape == (2, 1024)


def test_wav2spk_rejects_unknown_pooling():
    model = Wav2SpkModel(
        cfg=Wav2SpkConfig(stat_pooling_type="attentive"), num_speakers=N_SPK
    )
    with pytest.raises(ValueError):
        model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 8000)),
            jnp.ones((1, 8000), bool),
        )


# ------------------------------------------------------------------ dummy

def test_dummy_model_end_to_end():
    model = DummyModel(num_speakers=N_SPK)
    task = SpeakerTask(model=model, mode="ce")
    batch = _wav_batch(5)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-2),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(task)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    emb = task.embed_fn(
        state.params, state.model_state, batch["features"], batch["mask"]
    )
    assert emb.shape == (6, 2)
