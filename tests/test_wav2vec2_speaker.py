"""Flagship wav2vec2 speaker model: pooling/head wiring, AAM, no-pool modes,
mini end-to-end training in each objective mode."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
from w2v2_speaker_tpu.models.wav2vec2_speaker import (
    Wav2Vec2SpeakerConfig,
    Wav2Vec2SpeakerModel,
)
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState, make_freeze_schedule_tx
from w2v2_speaker_tpu.train.steps import make_train_step

TINY_W2V2 = Wav2Vec2Config(
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
    mask_time_prob=0.05,
)

N_SPK = 8
N_SAMPLES = 1600


def _wav_batch(seed, bs=16, n=N_SAMPLES):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_SPK, size=bs)
    # per-speaker sinusoid signature + noise
    freqs = 200.0 + 300.0 * np.arange(N_SPK)
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


def _mk(cfg: Wav2Vec2SpeakerConfig, mode: str):
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=N_SPK)
    task = SpeakerTask(model=model, mode=mode)
    batch = _wav_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=optax.adam(1e-3),
        model_state=mstate,
        rng=jax.random.PRNGKey(1),
    )
    return task, state, batch


@pytest.mark.parametrize(
    "pooling", ["mean", "mean+std", "attentive", "quantile", "first", "first+cls"]
)
def test_pooling_variants_forward(pooling):
    cfg = Wav2Vec2SpeakerConfig(w2v2=TINY_W2V2, stat_pooling_type=pooling)
    task, state, batch = _mk(cfg, "ce")
    loss, aux = task.loss_fn(
        state.params, state.model_state, batch, jax.random.PRNGKey(0), True
    )
    assert np.isfinite(float(loss))
    emb = aux["out"]["embedding"]
    from w2v2_speaker_tpu.models.pooling import pooled_embedding_size

    assert emb.shape == (
        16,
        pooled_embedding_size(pooling, TINY_W2V2.hidden_size),
    )


def test_ce_mode_trains():
    cfg = Wav2Vec2SpeakerConfig(w2v2=TINY_W2V2, stat_pooling_type="mean")
    task, state, _ = _mk(cfg, "ce")
    step = make_train_step(task)
    losses = []
    for i in range(30):
        state, m = step(state, _wav_batch(i + 1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses[::10]
    assert np.isfinite(losses[-1])


def test_aam_mode_trains():
    cfg = Wav2Vec2SpeakerConfig(
        w2v2=TINY_W2V2, stat_pooling_type="mean", use_aam=True
    )
    task, state, batch = _mk(cfg, "aam")
    # AAM head replaces the final FC: no logits
    loss, aux = task.loss_fn(
        state.params, state.model_state, batch, jax.random.PRNGKey(0), True
    )
    assert aux["out"]["logits"] is None
    assert "loss" in aux["out"]
    step = make_train_step(task)
    l0 = None
    for i in range(20):
        state, m = step(state, _wav_batch(i + 1))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0


def test_no_pool_ce_mode():
    cfg = Wav2Vec2SpeakerConfig(w2v2=TINY_W2V2, stat_pooling_type="none")
    task, state, batch = _mk(cfg, "ce_no_pool")
    loss, aux = task.loss_fn(
        state.params, state.model_state, batch, jax.random.PRNGKey(0), True
    )
    assert aux["out"]["logits"].ndim == 3  # [B, T, C]
    assert np.isfinite(float(loss))


def test_speaker_ctc_mode_with_blank_bias():
    cfg = Wav2Vec2SpeakerConfig(
        w2v2=TINY_W2V2,
        stat_pooling_type="none",
        ctc_head=True,
        ctc_blank_bias=100.0,
    )
    task, state, batch = _mk(cfg, "speaker_ctc")
    bias = state.params["head"]["fc_out"]["bias"]
    assert float(bias[0]) == 100.0 and float(bias[1]) == 0.0
    assert bias.shape == (N_SPK + 1,)
    loss, aux = task.loss_fn(
        state.params, state.model_state, batch, jax.random.PRNGKey(0), True
    )
    assert np.isfinite(float(loss))


def test_fc_head_embedding_tap():
    cfg = Wav2Vec2SpeakerConfig(
        w2v2=TINY_W2V2,
        stat_pooling_type="mean",
        hidden_fc_layers_out=(24, 20),
        embedding_layer_idx=1,
    )
    task, state, batch = _mk(cfg, "ce")
    _, aux = task.loss_fn(
        state.params, state.model_state, batch, jax.random.PRNGKey(0), False
    )
    assert aux["out"]["embedding"].shape == (16, 20)
    assert aux["out"]["logits"].shape == (16, N_SPK)


def test_different_test_pooling():
    cfg = Wav2Vec2SpeakerConfig(
        w2v2=TINY_W2V2,
        stat_pooling_type="mean",
        test_stat_pooling_type="max",
    )
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=N_SPK)
    batch = _wav_batch(0, bs=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["features"],
        batch["mask"],
    )
    train_out = model.apply(
        variables,
        batch["features"],
        batch["mask"],
        train=True,
        rngs={
            "dropout": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2),
            "layerdrop": jax.random.PRNGKey(3),
        },
    )
    eval_out = model.apply(variables, batch["features"], batch["mask"])
    # mean vs max pooling give different embeddings
    assert not np.allclose(
        np.asarray(train_out["embedding"]), np.asarray(eval_out["embedding"])
    )


def test_attentive_test_pooling_rejected():
    cfg = Wav2Vec2SpeakerConfig(
        w2v2=TINY_W2V2,
        stat_pooling_type="mean",
        test_stat_pooling_type="attentive",
    )
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=N_SPK)
    with pytest.raises(ValueError):
        model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, N_SAMPLES)),
            jnp.ones((2, N_SAMPLES), bool),
        )


def test_freeze_wav2vec2_subtree():
    cfg = Wav2Vec2SpeakerConfig(w2v2=TINY_W2V2, stat_pooling_type="mean")
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=N_SPK)
    task = SpeakerTask(model=model, mode="ce")
    batch = _wav_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    tx = make_freeze_schedule_tx(
        optax.adam(1e-3),
        frozen_predicate=lambda p: p.startswith("wav2vec2"),
        num_frozen_steps=2,
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, model_state=mstate,
        rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(task)
    before = jax.tree.map(lambda x: x.copy(), state.params["wav2vec2"])
    for i in range(2):
        state, _ = step(state, _wav_batch(i))
    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        before,
        state.params["wav2vec2"],
    )
    assert max(jax.tree.leaves(deltas)) == 0.0
    state, _ = step(state, _wav_batch(9))
    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        before,
        state.params["wav2vec2"],
    )
    assert max(jax.tree.leaves(deltas)) > 0.0


def test_ensemble_embeddings():
    cfg = Wav2Vec2SpeakerConfig(w2v2=TINY_W2V2, stat_pooling_type="mean")
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=N_SPK)
    batch = _wav_batch(0, bs=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["features"], batch["mask"]
    )
    ensembles = model.apply(
        variables,
        batch["features"],
        batch["mask"],
        num_ensembles=2,
        method=Wav2Vec2SpeakerModel.compute_ensemble_embeddings,
    )
    assert len(ensembles) == 2
    assert all(e.shape == (2, TINY_W2V2.hidden_size) for e in ensembles)


def test_encoder_unroll_equivalence():
    """encoder_unroll only changes codegen (lax.scan unroll), never math:
    outputs and param trees are identical for unroll=1 vs full unroll."""
    import dataclasses

    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Model

    wavs = _wav_batch(0, bs=2)["features"]
    cfg1 = dataclasses.replace(TINY_W2V2, encoder_unroll=1)
    cfgN = dataclasses.replace(TINY_W2V2, encoder_unroll=99)
    m1 = Wav2Vec2Model(cfg=cfg1)
    mN = Wav2Vec2Model(cfg=cfgN)
    v1 = m1.init(jax.random.PRNGKey(0), wavs)
    vN = mN.init(jax.random.PRNGKey(0), wavs)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(
        vN
    )
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(vN)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o1, _ = m1.apply(v1, wavs)
    oN, _ = mN.apply(v1, wavs)
    # same math; XLA may reassociate fusions across the unrolled body, so
    # bit-exactness is not guaranteed — but it must agree to fp32 noise
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(oN), atol=2e-5, rtol=1e-4
    )


def test_posconv_formulations_equivalent():
    """posconv_decomposed toggles codegen only: outputs identical, and at
    single-gradient-per-program (no accumulation) the grads agree too."""
    import dataclasses

    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Model

    wavs = _wav_batch(0, bs=2)["features"]
    m_dec = Wav2Vec2Model(
        cfg=dataclasses.replace(TINY_W2V2, posconv_decomposed=True)
    )
    m_nat = Wav2Vec2Model(
        cfg=dataclasses.replace(TINY_W2V2, posconv_decomposed=False)
    )
    v = m_dec.init(jax.random.PRNGKey(0), wavs)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_nat.init(jax.random.PRNGKey(0), wavs)
    )
    o1, _ = m_dec.apply(v, wavs)
    o2, _ = m_nat.apply(v, wavs)
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o2), atol=2e-5, rtol=1e-4
    )

    def loss(variables, model):
        out, _ = model.apply(variables, wavs)
        return (out**2).mean()

    g1 = jax.grad(loss)(v, m_dec)
    g2 = jax.grad(loss)(v, m_nat)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_remat_policies_match_no_remat_grads():
    """trainer.remat with either policy ("nothing" full recompute, "dots"
    save-matmul-outputs) must reproduce the no-remat gradients — remat
    trades memory/FLOPs, never math (reference has no remat; this is the
    TPU-side memory lever for LARGE batch-66, PERF.md)."""
    import dataclasses

    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Model

    wav = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.2, (2, N_SAMPLES))
        .astype(np.float32)
    )

    def grads(remat, policy):
        cfg = dataclasses.replace(
            TINY_W2V2, remat=remat, remat_policy=policy
        )
        m = Wav2Vec2Model(cfg)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2),
            "layerdrop": jax.random.PRNGKey(3),
        }
        v = m.init(rngs, wav)

        def loss(p):
            out = m.apply(
                {**v, "params": p}, wav, train=True,
                rngs={k: rngs[k] for k in
                      ("dropout", "masking", "layerdrop")},
            )
            h = out[0] if isinstance(out, tuple) else out
            return h.astype(jnp.float32).sum()

        return jax.grad(loss)(v["params"])

    base = jax.tree.leaves(grads(False, "nothing"))
    for policy in ("nothing", "dots", "dots_no_batch"):
        got = jax.tree.leaves(grads(True, policy))
        for a, b in zip(base, got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5
            )


def test_config_rejects_bad_enum_knobs():
    """Typo'd enum-like knobs (e.g. network.remat_policy=dots_nobatch on
    the CLI) must fail at config construction with the allowed set, not as
    a bare KeyError deep inside model building."""
    import dataclasses

    import pytest

    for field, bad in [
        ("remat_policy", "dots_nobatch"),
        ("attention_impl", "fast"),
        ("conv_impl", "pallas"),
        ("feat_extract_norm", "batch"),
    ]:
        with pytest.raises(ValueError, match=field):
            dataclasses.replace(TINY_W2V2, **{field: bad})
