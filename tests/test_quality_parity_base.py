"""BASE-geometry quality-parity harness (VERDICT r3 directive 3).

Same contract as `tests/test_quality_parity.py` but at the real flagship
geometry — wav2vec2-BASE, 12 layers x 768 hidden, the 7-layer 512-channel
conv stack — so scale-dependent drift (deeper error accumulation, wider
reductions, bucketing at real downsample rates) is covered, not just the
3-layer 64-dim toy:

  (a) reference semantics — random-init HF torch wav2vec2-BASE forward,
      f32, unpadded bs=1 (speaker_recognition_module.py:462-519), pooling
      re-derived in numpy, cosine with the (s+1)/2 clip
      (speaker_recognition_evaluator.py:81)
  (b) this repo — the same weights through `hf_state_dict_to_flax`, jitted
      `make_embed_fn`, bucketed/padded/batched `extract_embeddings`,
      `CosineDistanceEvaluator`

budgets: score drift <= 1e-3, EER drift <= 0.1 % absolute (BASELINE.md).
Variants: mean pooling + raw cosine (the flagship recipe) and attentive
stat pooling + centering evaluator (the reference's
`cosine_distance_with_train_data` path, `cosine_distance.py:42-73`).

The on-chip bf16 twin of this harness is `tools/parity_onchip.py` (drift of
the TPU bf16 batched path vs the same torch f32 reference; number recorded
in PERF.md).
"""

import numpy as np
import pytest
import torch

from w2v2_speaker_tpu.data.samples import SpeakerSample
from w2v2_speaker_tpu.data.trials import EvaluationPair
from w2v2_speaker_tpu.eval.evaluator import (
    CosineDistanceEvaluator,
    EmbeddingSample,
    compute_mean_std,
)
from w2v2_speaker_tpu.eval.metrics import calculate_eer
from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
from w2v2_speaker_tpu.models.wav2vec2_convert import hf_state_dict_to_flax
from w2v2_speaker_tpu.models.wav2vec2_speaker import (
    Wav2Vec2SpeakerConfig,
    Wav2Vec2SpeakerModel,
)

SR = 16000


@pytest.fixture(scope="module")
def hf_base():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    # HFConfig() defaults ARE wav2vec2-BASE: 12x768, heads 12, ffn 3072,
    # conv (512,)*7 k=(10,3,3,3,3,2,2) s=(5,2,2,2,2,2,2), group-norm first
    # layer, do_stable_layer_norm=False
    model = HFModel(HFConfig())
    model.eval()
    return model


@pytest.fixture(scope="module")
def utterances():
    rng = np.random.default_rng(11)
    freqs = rng.uniform(200, 3000, size=(6, 3))
    samples = []
    for s in range(6):
        for u in range(3):
            dur = int(SR * rng.uniform(1.0, 2.5))
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
    # odd count exercises the trailing row-padded extraction batch
    return samples[:-2]


@pytest.fixture(scope="module")
def torch_hidden(hf_base, utterances):
    """Reference-path hidden states: HF torch f32, unpadded, bs=1."""
    out = {}
    with torch.no_grad():
        for s in utterances:
            out[s.key] = (
                hf_base(torch.from_numpy(s.wav[None]))
                .last_hidden_state.numpy()[0]
            )  # [T', 768]
    return out


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


def _make_state(hf_base, pooling: str):
    import jax
    import optax

    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState

    cfg = Wav2Vec2Config()
    backbone = hf_state_dict_to_flax(hf_base.state_dict(), cfg)
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(
            w2v2=cfg,
            stat_pooling_type=pooling,
            hidden_fc_layers_out=(),
            embedding_layer_idx=-1,
        ),
        num_speakers=6,
    )
    task = SpeakerTask(model=model, mode="ce")
    example = {
        "features": np.zeros((2, SR), np.float32),
        "mask": np.ones((2, SR), bool),
        "labels": np.zeros(2, np.int64),
    }
    params, model_state = jax.jit(task.init)(jax.random.PRNGKey(0), example)
    params = dict(params)
    params["wav2vec2"] = backbone
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
        model_state=model_state, rng=jax.random.PRNGKey(1),
    )
    return task, state


def _repo_embeddings(task, state, samples):
    from w2v2_speaker_tpu.runtime.experiment import extract_embeddings
    from w2v2_speaker_tpu.train.steps import make_embed_fn

    return extract_embeddings(
        make_embed_fn(task), state, samples,
        pad_to_multiple=1600, batch_size=8,
    )


def _clip(scores):
    return np.clip((np.asarray(scores) + 1.0) / 2.0, 0.0, 1.0)


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_base_geometry_mean_pool_parity(hf_base, utterances, torch_hidden):
    pairs = _trial_pairs(utterances)
    gt = [1 if p.same_speaker else 0 for p in pairs]

    # (a) reference: mean over time (MeanStatPool1D), raw cosine + clip
    ref_emb = {k: h.mean(axis=0) for k, h in torch_hidden.items()}
    ref_scores = _clip(
        [_cos(ref_emb[p.sample1_id], ref_emb[p.sample2_id]) for p in pairs]
    )
    ref_eer, _ = calculate_eer(gt, ref_scores.tolist(), pos_label=1)

    # (b) repo production path
    task, state = _make_state(hf_base, "mean")
    emb_samples = _repo_embeddings(task, state, utterances)
    emb_map = {e.sample_id: np.asarray(e.embedding) for e in emb_samples}
    got_scores = _clip(
        [_cos(emb_map[p.sample1_id], emb_map[p.sample2_id]) for p in pairs]
    )
    result = CosineDistanceEvaluator().evaluate(pairs, emb_samples)

    assert float(np.max(np.abs(got_scores - ref_scores))) <= 1e-3
    assert abs(result["eer"] - ref_eer) <= 1e-3
    assert ref_eer < 0.5  # separable, not degenerate


def _numpy_attentive_pool(h, params, batch_stats, eps=1e-5):
    """AttentiveStatPool re-derived in numpy for an unpadded [T, F] input
    (models/pooling.py:130-182; speechbrain AttentiveStatisticsPooling
    semantics the reference uses, pooling.py:87-106)."""
    x = h[None]  # [1, T, F]
    mean = x.mean(axis=1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=1, keepdims=True)
    std = np.sqrt(np.maximum(var, 1e-12))
    attn_in = np.concatenate(
        [x, np.broadcast_to(mean, x.shape), np.broadcast_to(std, x.shape)],
        axis=-1,
    )
    d = params["attn_tdnn"]
    a = attn_in @ np.asarray(d["kernel"]) + np.asarray(d["bias"])
    a = np.maximum(a, 0.0)
    bn, bs = params["attn_bn"], batch_stats["attn_bn"]
    a = (a - np.asarray(bs["mean"])) / np.sqrt(np.asarray(bs["var"]) + eps)
    a = a * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    a = np.tanh(a)
    p = params["attn_proj"]
    e = a @ np.asarray(p["kernel"]) + np.asarray(p["bias"])  # [1, T, F]
    w = np.exp(e - e.max(axis=1, keepdims=True))
    w = w / w.sum(axis=1, keepdims=True)
    mean = (w * x).sum(axis=1)
    var = (w * (x - mean[:, None, :]) ** 2).sum(axis=1)
    std = np.sqrt(np.maximum(var, 1e-12))
    return np.concatenate([mean, std], axis=-1)[0]


def test_base_geometry_attentive_centering_parity(
    hf_base, utterances, torch_hidden
):
    """Attentive stat pooling + the centering evaluator
    (evaluator=cosine_distance_with_train_data): the random-init pooling
    parameters are shared between the repo model and a numpy re-derivation
    applied to the torch reference hidden states."""
    pairs = _trial_pairs(utterances)
    gt = [1 if p.same_speaker else 0 for p in pairs]

    task, state = _make_state(hf_base, "attentive")
    pool_params = state.params["stat_pooling"]
    pool_stats = state.model_state["batch_stats"]["stat_pooling"]

    # (a) reference semantics with the same pooling weights
    ref_emb = {
        k: _numpy_attentive_pool(h, pool_params, pool_stats)
        for k, h in torch_hidden.items()
    }
    ref_stack = np.stack([ref_emb[s.key] for s in utterances])
    ref_mean, ref_std = compute_mean_std(ref_stack)

    def ref_center(v):
        return (v - ref_mean) / (ref_std + 1e-12)

    ref_scores = _clip(
        [
            _cos(ref_center(ref_emb[p.sample1_id]),
                 ref_center(ref_emb[p.sample2_id]))
            for p in pairs
        ]
    )
    ref_eer, _ = calculate_eer(gt, ref_scores.tolist(), pos_label=1)

    # (b) repo path: batched extraction + centering evaluator
    emb_samples = _repo_embeddings(task, state, utterances)
    evaluator = CosineDistanceEvaluator(
        center_before_scoring=True,
        max_num_training_samples=len(utterances),
    )
    evaluator.fit_parameters(
        [np.asarray(e.embedding) for e in emb_samples]
    )
    result = evaluator.evaluate(pairs, emb_samples)

    emb_map = {e.sample_id: np.asarray(e.embedding) for e in emb_samples}
    got_scores = _clip(
        [
            _cos(
                (emb_map[p.sample1_id] - evaluator.mean)
                / (evaluator.std + 1e-12),
                (emb_map[p.sample2_id] - evaluator.mean)
                / (evaluator.std + 1e-12),
            )
            for p in pairs
        ]
    )

    assert float(np.max(np.abs(got_scores - ref_scores))) <= 1e-3
    assert abs(result["eer"] - ref_eer) <= 1e-3
