"""steps_per_dispatch: K optimizer steps per device program (lax.scan over
stacked batches) must reproduce the per-step dispatch trajectory exactly.

The reference's PL loop dispatches one step per batch — fine over PCIe,
dead time over a remote-TPU transport where every dispatch pays round-trip
latency plus a blocking metrics read. The chunked step amortizes both
(train/steps.py::make_train_step steps_per_dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from w2v2_speaker_tpu.parallel.mesh import create_mesh, shard_batch
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

from tests.test_grad_accumulation import TINY, N


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def _speaker_task():
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask

    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=TINY, stat_pooling_type="mean"),
        num_speakers=8,
    )
    return SpeakerTask(model=model, mode="ce")


def _batch(seed, bs=8):
    r = np.random.default_rng(seed)
    return {
        "features": r.normal(0, 0.3, (bs, N)).astype(np.float32),
        "mask": np.ones((bs, N), bool),
        "labels": r.integers(0, 8, bs).astype(np.int32),
    }


def _mk_state(task, example):
    params, mstate = task.init(jax.random.PRNGKey(0), example)
    return lambda: TrainState.create(
        apply_fn=task.model.apply,
        params=jax.tree.map(jnp.copy, params),
        tx=optax.sgd(1e-2),
        model_state=jax.tree.map(jnp.copy, mstate),
        rng=jax.random.PRNGKey(1),
    )


def test_chunked_matches_per_step_trajectory(mesh):
    task = _speaker_task()
    batches = [_batch(s) for s in range(4)]
    mk = _mk_state(task, batches[0])

    # per-step dispatch
    step1 = make_train_step(task, mesh)
    s1 = mk()
    losses1 = []
    for b in batches:
        s1, m = step1(s1, shard_batch(b, mesh))
        losses1.append(float(m["loss"]))

    # one chunked dispatch of K=4
    step4 = make_train_step(task, mesh, steps_per_dispatch=4)
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    s4, m4 = step4(mk(), shard_batch(stacked, mesh, stacked=True))
    losses4 = np.asarray(m4["loss"]).tolist()

    np.testing.assert_allclose(losses1, losses4, rtol=2e-5, atol=2e-6)
    deltas = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s4.params
        )
    )
    assert max(deltas) < 5e-6, f"param trajectories diverged: {max(deltas)}"
    assert int(s4.step) == 4


def test_chunked_with_accumulation_and_embeddings(mesh):
    """steps_per_dispatch composes with on-device grad accumulation and the
    centering-embedding side channel ([K, B, D] stacked)."""
    task = _speaker_task()
    batches = [_batch(s) for s in range(2)]
    mk = _mk_state(task, batches[0])

    step1 = make_train_step(
        task, mesh, accumulate_steps=2, return_embeddings=True
    )
    s1 = mk()
    embs1 = []
    for b in batches:
        s1, m = step1(s1, shard_batch(b, mesh))
        embs1.append(np.asarray(m["_embedding"]))

    step2 = make_train_step(
        task, mesh, accumulate_steps=2, return_embeddings=True,
        steps_per_dispatch=2,
    )
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    s2, m2 = step2(mk(), shard_batch(stacked, mesh, stacked=True))
    emb2 = np.asarray(m2["_embedding"])  # [K, B, D]

    assert emb2.shape[0] == 2 and emb2.shape == (2,) + embs1[0].shape
    np.testing.assert_allclose(emb2[0], embs1[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(emb2[1], embs1[1], rtol=2e-4, atol=2e-5)
    deltas = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
        )
    )
    assert max(deltas) < 5e-6


def test_run_cli_chunked_matches_per_step_objective(tmp_path):
    """End to end through run.py: trainer.steps_per_dispatch=3 must produce
    the same objective as per-step dispatch for the same seed (chunks are
    boundary-aligned, so validation/checkpoint cadence is identical)."""
    import run as run_cli
    from tests.test_runtime import _build_corpus, _common_overrides

    corpus = _build_corpus(tmp_path)

    def run(spd, tag):
        return run_cli.main(
            _common_overrides(
                corpus,
                tmp_path / tag,
                [
                    "+experiment=speaker_dummy",
                    f"trainer.steps_per_dispatch={spd}",
                ],
            )
        )

    assert run(1, "a") == run(3, "b")


def test_chunked_rejects_token_budget_tasks(tmp_path):
    """Speech/multitask token-budget batches vary shapes by design —
    steps_per_dispatch must refuse loudly, not recompile per chunk."""
    import pytest as _pytest

    import run as run_cli
    from tests.test_runtime_speech import _build_librispeech

    raw = tmp_path / "ls"
    _build_librispeech(raw)
    with _pytest.raises(ValueError, match="steps_per_dispatch"):
        run_cli.main(
            [
                "+experiment=speech_wav2vec2_ctc",
                "network.wav2vec2_size=tiny",
                "network.layerdrop=0.0",
                f"data.module.train_dir={raw}",
                f"data.module.val_clean_dir={raw}",
                "data.module.val_other_dir=null",
                "data.module.test_clean_dir=null",
                "data.module.test_other_dir=null",
                f"data.module.shards_dir={tmp_path / 'shards'}",
                "trainer=debug_trainer",
                "trainer.max_steps=2",
                "trainer.steps_per_dispatch=2",
                "trainer.precision=f32",
                f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
            ]
        )
