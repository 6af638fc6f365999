"""Tensor-parallel sharding over the 'model' mesh axis: placements land where
the rules say, the sharded train step runs, and TP results match pure-DP."""

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
from w2v2_speaker_tpu.parallel.mesh import (
    MODEL_AXIS,
    create_mesh,
    shard_batch,
)
from w2v2_speaker_tpu.parallel.tp import apply_tp_sharding, wav2vec2_tp_rules
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

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
    hidden_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
)


def _setup(mesh=None, tp=False):
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=TINY, stat_pooling_type="mean"),
        num_speakers=8,
    )
    task = SpeakerTask(model=model, mode="ce")
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            rng.normal(size=(8, 1600)).astype(np.float32)
        ),
        "mask": jnp.ones((8, 1600), bool),
        "labels": jnp.asarray(rng.integers(0, 8, size=8)),
    }
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    if tp:
        params = apply_tp_sharding(params, mesh)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(1e-2),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    return task, state, batch


def test_tp_rules_place_kernels_on_model_axis():
    mesh = create_mesh(jax.devices(), model=2)
    task, state, batch = _setup(mesh, tp=True)
    qkv = state.params["wav2vec2"]["encoder"]["layers"]["block"][
        "attention"
    ]["qkv_proj"]["kernel"]
    spec = qkv.sharding.spec
    assert MODEL_AXIS in spec
    # row-parallel out_proj shards dim 1
    out = state.params["wav2vec2"]["encoder"]["layers"]["block"][
        "attention"
    ]["out_proj"]["kernel"]
    assert out.sharding.spec[1] == MODEL_AXIS
    # norms stay replicated
    ln = state.params["wav2vec2"]["encoder"]["layer_norm"]["scale"]
    assert all(axis is None for axis in ln.sharding.spec) or len(
        ln.sharding.spec
    ) == 0


def test_tp_train_step_matches_dp():
    """One SGD step under dp=4 x tp=2 must equal the replicated-dp result."""
    mesh_tp = create_mesh(jax.devices(), model=2)
    task, state_tp, batch = _setup(mesh_tp, tp=True)
    step_tp = make_train_step(task, mesh_tp, infer_state_sharding=True)
    new_tp, metrics_tp = step_tp(state_tp, shard_batch(batch, mesh_tp))

    mesh_dp = create_mesh(jax.devices())
    task2, state_dp, _ = _setup()
    step_dp = make_train_step(task2, mesh_dp)
    new_dp, metrics_dp = step_dp(state_dp, shard_batch(batch, mesh_dp))

    assert float(metrics_tp["loss"]) == pytest.approx(
        float(metrics_dp["loss"]), rel=1e-5
    )
    # parameters after the step agree across the two parallelism layouts
    a = np.asarray(
        jax.device_get(
            new_tp.params["wav2vec2"]["feature_projection"]["projection"][
                "kernel"
            ]
        )
    )
    b = np.asarray(
        new_dp.params["wav2vec2"]["feature_projection"]["projection"][
            "kernel"
        ]
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_rules_cover_expected_patterns():
    rules = wav2vec2_tp_rules()
    patterns = [p for p, _ in rules]
    assert any("qkv_proj" in p for p in patterns)
    assert any("intermediate_dense" in p for p in patterns)
    assert any("output_dense" in p for p in patterns)
