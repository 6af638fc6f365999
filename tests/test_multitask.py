"""Joint speaker + speech (multitask) family: model forward, padded-row
exclusion in both objectives, overfit smoke, and the run.py e2e recipe.

The reference declares this family but never built it
(`/root/reference/src/lightning_modules/multitask/mt_speech_speaker_module.py`
— every step is `pass`; `main.py:304-307` raises "No multi-task networks
yet!"); these tests pin the working TPU-native realization."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.data.tokenizer import CharTokenizer
from w2v2_speaker_tpu.models.wav2vec2_multitask import (
    Wav2Vec2MultitaskConfig,
    Wav2Vec2MultitaskModel,
)
from w2v2_speaker_tpu.parallel.mesh import pad_batch_rows, strip_host_fields
from w2v2_speaker_tpu.train.multitask_task import MultitaskTask
from w2v2_speaker_tpu.train.state import TrainState

from tests.test_speech import TINY, _speech_batch

SR = 16000
N_SPK = 4


def _make_task(tok, mode="ce"):
    model = Wav2Vec2MultitaskModel(
        cfg=Wav2Vec2MultitaskConfig(
            w2v2=TINY,
            vocab_size=tok.vocab_size,
            head_dropout=0.0,
            stat_pooling_type="mean",
            use_aam=mode == "aam",
        ),
        num_speakers=N_SPK,
    )
    return MultitaskTask(model=model, tokenizer=tok, mode=mode)


def _mt_batch(tok, seed, bs=4, n=1600):
    batch = _speech_batch(tok, seed, bs=bs, n=n)
    batch["speaker_labels"] = np.arange(bs, dtype=np.int32) % N_SPK
    return batch


@pytest.fixture(scope="module", params=["ce", "aam"])
def mt_setup(request):
    tok = CharTokenizer.build(["ab ba", "aa bb"])
    task = _make_task(tok, mode=request.param)
    batch = _mt_batch(tok, 0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    return task, tok, params, mstate


def test_multitask_forward_outputs(mt_setup):
    task, tok, params, mstate = mt_setup
    batch = _mt_batch(tok, 1)
    out = task.model.apply(
        {"params": params, **mstate},
        batch["features"],
        batch["mask"],
        train=False,
    )
    bs, n = batch["features"].shape
    assert out["ctc_logits"].shape[0] == bs
    assert out["ctc_logits"].shape[-1] == tok.vocab_size
    assert out["frame_mask"].shape[:1] == (bs,)
    assert out["embedding"].ndim == 2 and out["embedding"].shape[0] == bs
    if task.mode == "ce":
        assert out["logits"].shape == (bs, N_SPK)
    # both losses present and finite through loss_fn
    loss, aux = task.loss_fn(
        params, mstate, strip_host_fields(batch), jax.random.PRNGKey(0),
        train=False,
    )
    m = aux["metrics"]
    assert np.isfinite(float(loss))
    assert np.isfinite(float(m["loss_speech"]))
    assert np.isfinite(float(m["loss_speaker"]))
    np.testing.assert_allclose(
        float(loss),
        float(m["loss_speech"]) + float(m["loss_speaker"]),
        rtol=1e-5,
    )


def test_multitask_padded_rows_excluded(mt_setup):
    """Device-divisibility padding rows (empty CTC targets, zero speaker
    labels) must not change either objective — the exact padding the train
    loop applies to token-budget batches (pad_batch_rows)."""
    task, tok, params, mstate = mt_setup
    batch = strip_host_fields(_mt_batch(tok, 2, bs=3))
    batch = {k: np.asarray(v) for k, v in batch.items()}
    padded = pad_batch_rows(batch, 8)
    assert padded["features"].shape[0] == 8
    assert (padded["label_lengths"][3:] == 0).all()

    rng = jax.random.PRNGKey(3)
    loss_a, aux_a = task.loss_fn(params, mstate, batch, rng, train=False)
    loss_b, aux_b = task.loss_fn(params, mstate, padded, rng, train=False)
    np.testing.assert_allclose(
        float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6
    )
    for k in ("loss_speech", "loss_speaker", "accuracy"):
        if k in aux_a["metrics"]:
            np.testing.assert_allclose(
                float(aux_a["metrics"][k]),
                float(aux_b["metrics"][k]),
                rtol=1e-5,
                atol=1e-6,
            )


def test_multitask_overfit_reduces_both_losses(mt_setup):
    task, tok, params, mstate = mt_setup
    state = TrainState.create(
        apply_fn=task.model.apply, params=params, tx=optax.adam(3e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )

    @jax.jit
    def step(state, batch):
        new_rng, srng = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            state.params, state.model_state, batch, srng, True
        )
        return (
            state.apply_gradients(grads, aux["model_state"]).replace(
                rng=new_rng
            ),
            aux["metrics"],
        )

    batch = strip_host_fields(_mt_batch(tok, 0))
    first = last = None
    for i in range(60):
        state, m = step(state, batch)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        last = {k: float(v) for k, v in m.items()}
    assert last["loss_speech"] < first["loss_speech"]
    assert last["loss_speaker"] < first["loss_speaker"] * 0.8
    # speaker head should classify the overfit batch (AAM preds carry the
    # additive margin on the true class, so its bar is lower)
    assert last["accuracy"] >= (0.75 if task.mode == "ce" else 0.5)

    # eval helpers: jitted logits fn + embedding extraction
    full = _mt_batch(tok, 0)
    logits, lengths = task.logits_fn(
        state.params, state.model_state, full["features"], full["mask"]
    )
    assert logits.shape[0] == 4 and (np.asarray(lengths) > 0).all()
    emb = task.embed_fn(
        state.params, state.model_state, full["features"], full["mask"]
    )
    assert emb.shape[0] == 4 and np.isfinite(np.asarray(emb)).all()


def test_multitask_loss_requires_speaker_labels(mt_setup):
    task, tok, params, mstate = mt_setup
    batch = strip_host_fields(_speech_batch(tok, 0))  # no speaker_labels
    with pytest.raises(ValueError, match="speaker_labels"):
        task.loss_fn(params, mstate, batch, jax.random.PRNGKey(0), False)


def test_speaker_map_from_meta_and_fallback(tmp_path):
    """speaker_id_to_idx comes from the shard meta's `speakers` field;
    shard dirs written before that field existed fall back to a one-time
    key scan persisted as speakers.json."""
    import json

    from tests.test_speech import _build_librispeech
    from w2v2_speaker_tpu.data.librispeech import (
        LibriSpeechConfig,
        LibriSpeechDataModule,
    )

    raw = tmp_path / "raw"
    _build_librispeech(raw, n_spk=3)
    cfg = LibriSpeechConfig(
        split_dirs={"train": raw},
        shards_dir=tmp_path / "shards",
        with_speaker_labels=True,
    )
    dm = LibriSpeechDataModule(cfg)
    dm.prepare_data()
    assert dm.num_speakers == 3
    assert dm.speaker_id_to_idx == {"100": 0, "101": 1, "102": 2}

    # batches carry int32 speaker labels resolved through the map
    batch = next(iter(dm.train_batches()))
    labels = batch["speaker_labels"]
    assert labels.dtype == np.int32
    assert set(labels.tolist()) <= {0, 1, 2}

    # legacy meta without 'speakers': fallback scans shard keys once and
    # persists speakers.json
    meta_file = tmp_path / "shards" / "train" / "meta.json"
    meta = json.loads(meta_file.read_text())
    meta.pop("speakers")
    meta_file.write_text(json.dumps(meta))
    dm2 = LibriSpeechDataModule(cfg)
    assert dm2.speaker_id_to_idx == dm.speaker_id_to_idx
    assert (tmp_path / "shards" / "train" / "speakers.json").exists()
    # third instance reads the persisted cache (no rescan path dependency)
    dm3 = LibriSpeechDataModule(cfg)
    assert dm3.speaker_id_to_idx == dm.speaker_id_to_idx
