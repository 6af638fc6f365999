"""On-chip bf16 quality-parity probe (VERDICT r3 directive 3).

The TPU twin of `tests/test_quality_parity_base.py`: the SAME random-init
wav2vec2-BASE weights are scored two ways —

  (a) reference semantics: HF torch forward, f32, unpadded bs=1 on the host
      CPU, mean pooling, cosine with the (s+1)/2 clip
      (reference speaker_recognition_module.py:462-519,
      speaker_recognition_evaluator.py:81)
  (b) this repo's production serving path ON THE REAL CHIP: converted flax
      weights cast to bf16, bf16 compute, bucketed/padded/batched
      `extract_embeddings` (optionally with int8 dense matmuls)

and the drift (max |Δscore| after clip, ΔEER) is reported as one JSON line.
This is the scale- and precision-dependent drift the CPU f32 harness cannot
see; the number is recorded in PERF.md.

Usage (runs on the ambient backend — the real TPU under axon):
  python tools/parity_onchip.py [--int8] [--utts 16]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

SR = 16000


def build_utterances(n_speakers=6, utts_per_speaker=3, drop_last=2, seed=11):
    from w2v2_speaker_tpu.data.samples import SpeakerSample

    rng = np.random.default_rng(seed)
    freqs = rng.uniform(200, 3000, size=(n_speakers, 3))
    samples = []
    for s in range(n_speakers):
        for u in range(utts_per_speaker):
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
    return samples[: len(samples) - drop_last]


def trial_pairs(samples):
    from w2v2_speaker_tpu.data.trials import EvaluationPair

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="also run the int8 dense-matmul serving variant")
    ap.add_argument("--utts", type=int, default=16)
    args = ap.parse_args()

    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    from w2v2_speaker_tpu.eval.metrics import calculate_eer

    samples = build_utterances()[: args.utts]
    pairs = trial_pairs(samples)
    gt = [1 if p.same_speaker else 0 for p in pairs]

    # ---- (a) torch f32 reference on the host CPU
    torch.manual_seed(0)
    hf = HFModel(HFConfig())  # defaults ARE wav2vec2-BASE
    hf.eval()
    ref_emb = {}
    with torch.no_grad():
        for s in samples:
            h = hf(torch.from_numpy(s.wav[None])).last_hidden_state.numpy()
            ref_emb[s.key] = h.mean(axis=1)[0]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    def clip(x):
        return np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)

    ref_scores = clip(
        [cos(ref_emb[p.sample1_id], ref_emb[p.sample2_id]) for p in pairs]
    )
    ref_eer, _ = calculate_eer(gt, ref_scores.tolist(), pos_label=1)

    # ---- (b) the repo's serving path on the ambient backend
    import jax
    import jax.numpy as jnp
    import optax

    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
    from w2v2_speaker_tpu.models.wav2vec2_convert import hf_state_dict_to_flax
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.runtime.experiment import extract_embeddings
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState
    from w2v2_speaker_tpu.train.steps import make_embed_fn

    platform = jax.devices()[0].platform
    results = {
        "metric": "onchip_bf16_parity_drift",
        "platform": platform,
        "n_utts": len(samples),
        "n_trials": len(pairs),
        "ref_eer": round(float(ref_eer), 6),
    }

    def run_variant(name, int8):
        cfg = Wav2Vec2Config(
            dtype="bfloat16" if platform == "tpu" else "float32",
            layerdrop=0.0,
            int8_matmuls=int8,
        )
        backbone = hf_state_dict_to_flax(hf.state_dict(), cfg)
        model = Wav2Vec2SpeakerModel(
            cfg=Wav2Vec2SpeakerConfig(
                w2v2=cfg,
                stat_pooling_type="mean",
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
        params, model_state = jax.jit(task.init)(
            jax.random.PRNGKey(0), example
        )
        params = dict(params)
        params["wav2vec2"] = backbone
        if platform == "tpu":
            # production serving: bf16 weights (entry()'s cast)
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                params,
            )
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.sgd(1e-3),
            model_state=model_state, rng=jax.random.PRNGKey(1),
        )
        emb = extract_embeddings(
            make_embed_fn(task), state, samples,
            pad_to_multiple=16000, batch_size=8,
        )
        emb_map = {e.sample_id: np.asarray(e.embedding, np.float32)
                   for e in emb}
        got = clip(
            [cos(emb_map[p.sample1_id], emb_map[p.sample2_id])
             for p in pairs]
        )
        eer, _ = calculate_eer(gt, got.tolist(), pos_label=1)
        results[f"{name}_max_abs_score_drift"] = round(
            float(np.max(np.abs(got - ref_scores))), 6
        )
        results[f"{name}_eer"] = round(float(eer), 6)
        results[f"{name}_delta_eer"] = round(float(eer - ref_eer), 6)

    run_variant("bf16", int8=False)
    if args.int8:
        run_variant("int8", int8=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
