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
from ..train.steps import make_embed_fn
from ..parallel.mesh import create_mesh
from .experiment import (
    build_evaluator,
    build_model_and_task,
    extract_embeddings,
    _init_state,
)

__all__ = ["run_predictions", "read_pair_file"]


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
