"""Batch embedding extraction + pair scoring (VoxSRC-style submission).

Equivalent of the reference's predict pipeline
(`/root/reference/src/predict.py:90-216`, wrapper `predict.py:31-45` — note
the reference wrapper imports `run_predictions` from the wrong module, a
wiring bug fixed here, SURVEY §7.4):

- read the pair file (2- or 3-column lines; 3-column has a leading label)
- extract one embedding per unique file — batched + bucketed + masked on
  the TPU instead of the reference's bs=1 CUDA-with-CPU-fallback loop —
  cached as .npy next to the audio
- score pairs with the configured evaluator, normalize (s+1)/2 clip [0,1]
- write `<pairs-stem>_scores.txt` lines `<score> <file1> <file2>`
"""

from __future__ import annotations

import pathlib
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.io import load_raw_audio
from ..data.normalize import normalize_waveform
from ..data.samples import SpeakerSample
from ..eval.evaluator import ASNormCosineEvaluator, EmbeddingSample
from ..ops.quant import INT8_AUTO_MIN_SAMPLES, int8_auto_policy
from ..train.steps import make_embed_fn
from ..parallel.mesh import create_mesh
from .experiment import (
    build_evaluator,
    build_model_and_task,
    extract_embeddings,
    _init_state,
)

__all__ = ["run_predictions", "read_pair_file", "BucketDispatchEmbed"]


class BucketDispatchEmbed:
    """Per-bucket bf16/int8 embed dispatch (`network.int8_matmuls=auto`).

    Extraction is bucketed by padded length (extract_embeddings sorts by
    duration and pads to `test_pad_to_multiple`), so each bucket compiles
    its own program anyway; this wrapper routes each bucket to whichever
    arithmetic the measured int8 matrix says is faster for that shape
    (ops/quant.py::int8_auto_policy) instead of one global flag. Both
    branches read the SAME TrainState — QuantDense keeps nn.Dense's exact
    parameter layout, so one set of served weights feeds both programs.
    `calls` records (padded_samples, used_int8) per dispatched bucket
    batch for tests and debugging.
    """

    def __init__(self, embed_bf16, embed_int8, hidden_size: int,
                 min_samples: int = INT8_AUTO_MIN_SAMPLES):
        self._bf16 = embed_bf16
        self._int8 = embed_int8
        self.hidden_size = hidden_size
        self.min_samples = min_samples
        self.calls: List[Tuple[int, bool]] = []

    def __call__(self, state, features, mask=None):
        use_int8 = int8_auto_policy(
            int(features.shape[-1]), self.hidden_size, self.min_samples
        )
        self.calls.append((int(features.shape[-1]), use_int8))
        return (self._int8 if use_int8 else self._bf16)(
            state, features, mask
        )


def read_pair_file(path: pathlib.Path) -> List[Tuple[str, str]]:
    pairs = []
    for line in path.read_text().splitlines():
        parts = line.strip().split(" ")
        if len(parts) == 3:
            pairs.append((parts[1], parts[2]))
        elif len(parts) == 2:
            pairs.append((parts[0], parts[1]))
    return pairs


def run_predictions(cfg: Dict) -> pathlib.Path:
    folder = pathlib.Path(cfg["predict_folder_path"])
    pair_file = pathlib.Path(cfg["pair_prediction_path"])
    pairs = read_pair_file(pair_file)
    id_list = sorted({p for pair in pairs for p in pair})
    print(f"{len(pairs)} pairs over {len(id_list)} files")

    evaluator = build_evaluator(cfg)
    task, kind = build_model_and_task(
        cfg, cfg["network"].get("explicit_num_speakers") or 2
    )
    if kind not in ("speaker", "multitask"):
        # multitask networks expose the same embed_fn contract (speaker
        # branch of the shared backbone); speech/paired have no single-
        # utterance embedding to score pairs with
        raise ValueError("predict supports speaker (or multitask) models")
    state = _init_state(cfg, task, _example_batch())
    mesh = create_mesh()
    embed = make_embed_fn(task, mesh)
    if cfg["network"].get("int8_matmuls") == "auto":
        if not hasattr(getattr(task.model, "cfg", None), "w2v2"):
            raise ValueError(
                "network.int8_matmuls=auto is only supported for "
                "wav2vec2-family networks"
            )
        import copy

        cfg_int8 = copy.deepcopy(cfg)
        cfg_int8["network"]["int8_matmuls"] = True
        task_int8, _ = build_model_and_task(
            cfg_int8, cfg["network"].get("explicit_num_speakers") or 2
        )
        embed = BucketDispatchEmbed(
            embed,
            make_embed_fn(task_int8, mesh),
            hidden_size=task.model.cfg.w2v2.hidden_size,
            min_samples=int(
                cfg["network"].get(
                    "int8_auto_min_samples", INT8_AUTO_MIN_SAMPLES
                )
            ),
        )

    # load audio (cached embeddings are reused)
    emb_dir = folder / "embeddings"
    emb_dir.mkdir(exist_ok=True, parents=True)
    todo: List[SpeakerSample] = []
    cached: Dict[str, np.ndarray] = {}
    for name in id_list:
        cache = emb_dir / (name + ".npy")
        if cache.exists():
            cached[name] = np.load(cache)
            continue
        wav = load_raw_audio(folder / name)
        wav = normalize_waveform(wav)
        todo.append(SpeakerSample(key=name, wav=wav, ground_truth=-1))

    if todo:
        print(f"computing {len(todo)} speaker embeddings")
        dl = cfg["data"]["dataloader"]
        fresh = extract_embeddings(
            embed,
            state,
            todo,
            pad_to_multiple=dl.get("test_pad_to_multiple", 16000),
            batch_size=dl.get("test_batch_size", 8),
            num_devices=mesh.shape["data"],
        )
        for s in fresh:
            out = emb_dir / (s.sample_id + ".npy")
            out.parent.mkdir(exist_ok=True, parents=True)
            np.save(out, s.embedding)
            cached[s.sample_id] = np.asarray(s.embedding)
        if isinstance(embed, BucketDispatchEmbed):
            n8 = sum(1 for _, u in embed.calls if u)
            print(
                f"int8 auto dispatch: {n8}/{len(embed.calls)} bucket "
                f"batches on int8 (threshold {embed.min_samples} samples)"
            )

    embedding_pairs = [
        (
            EmbeddingSample(a, cached[a]),
            EmbeddingSample(b, cached[b]),
        )
        for a, b in pairs
    ]
    if isinstance(evaluator, ASNormCosineEvaluator):
        # no training-embedding buffer here: the extraction set itself is
        # the impostor cohort (each side's exact twin is excluded from its
        # top-K inside _cohort_stats)
        evaluator.fit_parameters(list(cached.values()))
    scores = np.asarray(
        evaluator._compute_prediction_scores(embedding_pairs)
    )
    scores = np.clip((scores + 1) / 2, 0, 1)

    score_file = pair_file.parent / f"{pair_file.stem}_scores.txt"
    with open(score_file, "w") as f:
        for s, (a, b) in zip(scores.tolist(), pairs):
            f.write(f"{s} {a} {b}\n")
    print(f"wrote {score_file}")
    return score_file


def _example_batch():
    return {
        "features": jnp.zeros((2, 16000), jnp.float32),
        "mask": jnp.ones((2, 16000), bool),
        "labels": jnp.zeros((2,), jnp.int32),
    }
