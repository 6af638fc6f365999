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


def test_int8_yaml_int_one_means_true():
    """CLI/YAML `network.int8_matmuls=1` arrives as int 1 (yaml.safe_load);
    it must behave exactly like true — the training guard rejects it and
    the builder enables int8 — not silently read as false (`1 is True` is
    False even though `1 == True`)."""
    import pytest

    from w2v2_speaker_tpu.runtime.experiment import (
        _validate_int8_config,
        _w2v2_config,
    )

    with pytest.raises(ValueError, match="inference-only"):
        _validate_int8_config(
            {"network": {"int8_matmuls": 1}, "fit_model": True}
        )
    net = {
        "wav2vec2_size": "tiny",
        "int8_matmuls": 1,
        "activation_dropout": 0.0,
        "attention_dropout": 0.0,
        "feat_proj_dropout": 0.0,
        "hidden_dropout": 0.0,
        "layerdrop": 0.0,
        "mask_feature_length": 10,
        "mask_feature_prob": 0.0,
        "mask_time_length": 10,
        "mask_time_prob": 0.0,
    }
    assert _w2v2_config(net, "f32", remat=False).int8_matmuls is True
    net["int8_matmuls"] = 0
    assert _w2v2_config(net, "f32", remat=False).int8_matmuls is False


# ------------------------------------------------- int8_matmuls=auto path

def test_int8_auto_policy():
    """Encodes the measured matrix: LARGE always int8 (+23% at 3 s); BASE
    only above the bucket-length threshold (+14% at 12 s, noise at 3 s)."""
    from w2v2_speaker_tpu.ops.quant import int8_auto_policy

    assert int8_auto_policy(3 * SR, hidden_size=1024)  # LARGE, short clip
    assert not int8_auto_policy(3 * SR, 768, min_samples=6 * SR)
    assert int8_auto_policy(12 * SR, 768, min_samples=6 * SR)
    assert int8_auto_policy(6 * SR, 768, min_samples=6 * SR)  # inclusive


def test_int8_config_auto_allowed_garbage_rejected():
    """'auto' trains full precision so the train driver accepts it; the
    model config itself is built with int8 OFF; unknown values error."""
    import pytest

    from w2v2_speaker_tpu.runtime.experiment import (
        _validate_int8_config,
        _w2v2_config,
    )

    _validate_int8_config(
        {"network": {"int8_matmuls": "auto"}, "fit_model": True}
    )
    with pytest.raises(ValueError, match="true/false/auto"):
        _validate_int8_config(
            {"network": {"int8_matmuls": "yes"}, "fit_model": False}
        )
    net = {
        "wav2vec2_size": "tiny",
        "int8_matmuls": "auto",
        "activation_dropout": 0.0,
        "attention_dropout": 0.0,
        "feat_proj_dropout": 0.0,
        "hidden_dropout": 0.0,
        "layerdrop": 0.0,
        "mask_feature_length": 10,
        "mask_feature_prob": 0.0,
        "mask_time_length": 10,
        "mask_time_prob": 0.0,
    }
    assert _w2v2_config(net, "f32", remat=False).int8_matmuls is False


def test_bucket_dispatch_embed_routing():
    """Per-bucket routing + call recording (network.int8_matmuls=auto)."""
    from w2v2_speaker_tpu.runtime.predict import BucketDispatchEmbed

    base = BucketDispatchEmbed(
        lambda s, f, m=None: "bf16",
        lambda s, f, m=None: "int8",
        hidden_size=768,
        min_samples=2 * SR,
    )
    short = np.zeros((2, SR), np.float32)
    long = np.zeros((2, 3 * SR), np.float32)
    assert base(None, short) == "bf16"
    assert base(None, long) == "int8"
    assert base.calls == [(SR, False), (3 * SR, True)]

    large = BucketDispatchEmbed(
        lambda s, f, m=None: "bf16",
        lambda s, f, m=None: "int8",
        hidden_size=1024,
        min_samples=2 * SR,
    )
    assert large(None, short) == "int8"  # LARGE: every bucket


def test_predict_cli_int8_auto(tmp_path, capsys):
    """End-to-end predict with int8_matmuls=auto over a mixed-duration
    corpus: short buckets serve bf16, long buckets int8, scores valid."""
    import predict as predict_cli

    from w2v2_speaker_tpu.data.io import write_wav

    rng = np.random.default_rng(7)
    wav_dir = tmp_path / "wav"
    names = []
    # extraction pads the batch up to the mesh's data axis (8 on the test
    # mesh), so fill one full short bucket and one full long bucket
    for spk, dur_s in [(0, 1.0)] * 4 + [(1, 1.0)] * 4 + [(2, 2.5)] * 4 + [
        (3, 2.5)
    ] * 4:
        name = f"id{spk:05d}/yt0/{len(names):05d}.wav"
        p = wav_dir / name
        p.parent.mkdir(parents=True, exist_ok=True)
        wav = 0.1 * rng.normal(size=int(SR * dur_s)).astype(np.float32)
        write_wav(p, wav, SR)
        names.append(name)
    pair_file = tmp_path / "pairs.txt"
    pair_file.write_text(
        "".join(f"{names[i]} {names[i + 1]}\n" for i in range(0, 16, 2))
        + f"{names[0]} {names[8]}\n"
    )
    score_file = predict_cli.main(
        [
            "network=wav2vec2_fc",
            "network.wav2vec2_size=tiny",
            "network.layerdrop=0.0",
            "network.int8_matmuls=auto",
            f"network.int8_auto_min_samples={2 * SR}",
            "network.explicit_num_speakers=4",
            f"predict_folder_path={wav_dir}",
            f"pair_prediction_path={pair_file}",
            "data.dataloader.test_batch_size=2",
            "data.dataloader.test_pad_to_multiple=8000",
        ]
    )
    out = capsys.readouterr().out
    # both branches must have served: 1.0 s bucket (16000 < 32000) on
    # bf16, 2.5 s bucket (40000 >= 32000) on int8
    assert "int8 auto dispatch: 1/2 bucket batches on int8" in out
    lines = score_file.read_text().splitlines()
    assert len(lines) == 9
    for line in lines:
        score, f1, f2 = line.split(" ")
        assert 0.0 <= float(score) <= 1.0
