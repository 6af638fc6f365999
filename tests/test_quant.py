"""int8 inference path (ops/quant.py, Wav2Vec2Config.int8_matmuls).

Covers: numeric accuracy of the dynamic int8 matmul, nn.Dense param-layout
compatibility (checkpoints/converter/TP rules must not change), and
end-to-end embedding quality — int8 extraction must reproduce the bf16/f32
path's cosine trial scores closely enough that verification decisions
don't move. The reference has no quantized path (torch f32 serving,
`/root/reference/src/predict.py:128-170`); this is TPU headroom on top of
parity, so the quality bar here is vs OUR full-precision path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from w2v2_speaker_tpu.ops.quant import QuantDense, int8_matmul

SR = 16000


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 256)).astype(np.float32)
    w = (rng.normal(size=(256, 128)) * 0.05).astype(np.float32)
    exact = x @ w
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.01, rel


def test_int8_matmul_batched_and_zero_rows():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 64)).astype(np.float32)
    x[0, 3] = 0.0  # zero token row must not divide by zero
    w = rng.normal(size=(64, 96)).astype(np.float32)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    exact = x @ w
    assert got.shape == exact.shape
    assert np.all(got[0, 3] == 0.0)
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.01, rel


def test_quant_dense_param_layout_matches_nn_dense():
    import flax.linen as nn

    x = jnp.ones((4, 32))
    key = jax.random.PRNGKey(0)
    ref = nn.Dense(24).init(key, x)["params"]
    got = QuantDense(features=24).init(key, x)["params"]
    assert set(ref) == set(got) == {"kernel", "bias"}
    for name in ref:
        assert ref[name].shape == got[name].shape
        np.testing.assert_array_equal(
            np.asarray(ref[name]), np.asarray(got[name])
        )


def test_wav2vec2_int8_embeddings_track_full_precision():
    """Same params, int8 vs f32 matmuls: trial-score agreement end to end."""
    from w2v2_speaker_tpu.models.wav2vec2 import Wav2Vec2Config
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )

    tiny = dict(
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        hidden_size=64,
        num_layers=3,
        num_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        layerdrop=0.0,
    )

    def build(int8):
        return Wav2Vec2SpeakerModel(
            cfg=Wav2Vec2SpeakerConfig(
                w2v2=Wav2Vec2Config(**tiny, int8_matmuls=int8),
                stat_pooling_type="mean",
                hidden_fc_layers_out=(),
                embedding_layer_idx=-1,
            ),
            num_speakers=8,
        )

    f32_model, int8_model = build(False), build(True)
    rng = np.random.default_rng(3)
    wav = rng.normal(size=(6, SR)).astype(np.float32) * 0.1
    variables = jax.jit(f32_model.init)(
        {"params": jax.random.PRNGKey(0)}, wav
    )

    def embed(model):
        out = jax.jit(
            lambda v, w: model.apply(
                v, w, method=Wav2Vec2SpeakerModel.compute_embedding
            )
        )(variables, wav)
        return np.asarray(out)

    e_full, e_int8 = embed(f32_model), embed(int8_model)
    assert e_full.shape == e_int8.shape

    def scores(e):
        n = e / np.linalg.norm(e, axis=1, keepdims=True)
        sim = n @ n.T
        return sim[np.triu_indices(len(e), k=1)]

    # all pairwise cosine trial scores move < 0.02 on the (s+1)/2 in [0,1]
    # scale — an order of magnitude under typical same/different-speaker
    # score separation, so verification decisions are unaffected
    drift = np.max(np.abs(scores(e_full) - scores(e_int8))) / 2.0
    assert drift < 0.02, drift


def test_train_driver_rejects_int8():
    import pytest

    from w2v2_speaker_tpu.runtime.experiment import run_train_eval

    with pytest.raises(ValueError, match="int8_matmuls is inference-only"):
        run_train_eval(
            {
                "seed": 0,
                "network": {"int8_matmuls": True},
                "trainer": {},
            }
        )


def test_int8_guard_allows_eval_only_flow():
    """fit_model=false (eval-only warm-start, the driver's inference flow)
    must be allowed to quality-check int8 through the test/EER pipeline."""
    import pytest

    from w2v2_speaker_tpu.runtime.experiment import _validate_int8_config

    _validate_int8_config(
        {"network": {"int8_matmuls": True}, "fit_model": False}
    )
    _validate_int8_config({"network": {}, "fit_model": True})
    with pytest.raises(ValueError, match="inference-only"):
        _validate_int8_config(
            {"network": {"int8_matmuls": True}, "fit_model": True}
        )
