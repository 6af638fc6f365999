"""wav2vec v1 encoder + speaker heads: shapes, masking, checkpoint port,
mini training, orchestrator dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from w2v2_speaker_tpu.models.wav2vec1 import (
    Wav2Vec1Config,
    Wav2Vec1Encoder,
    Wav2Vec1FCModel,
    Wav2Vec1XVectorModel,
    fairseq_state_dict_to_flax,
)
from w2v2_speaker_tpu.models.xvector import XVectorConfig
from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
from w2v2_speaker_tpu.train.state import TrainState
from w2v2_speaker_tpu.train.steps import make_train_step

TINY = Wav2Vec1Config(
    conv_layers=((16, 10, 5), (16, 8, 4), (16, 4, 2)),
    agg_layers=3,
    agg_dim=16,
    use_aggregator=True,
)
N_SPK = 6


def _wav_batch(seed, bs=8, n=4000):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_SPK, size=bs)
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


def test_encoder_shapes_and_masking():
    enc = Wav2Vec1Encoder(cfg=TINY)
    rng = np.random.default_rng(0)
    n1, n2 = 4000, 2600
    padded = np.zeros((2, n1), np.float32)
    padded[0] = rng.normal(size=n1)
    padded[1, :n2] = rng.normal(size=n2)
    mask = np.zeros((2, n1), bool)
    mask[0], mask[1, :n2] = True, True
    variables = enc.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(padded),
        jnp.asarray(mask),
    )
    feats, fm = enc.apply(variables, jnp.asarray(padded), jnp.asarray(mask))
    assert feats.shape[-1] == 16
    # padding invariance of the short sample's valid frames
    solo, _ = enc.apply(
        variables, jnp.asarray(padded[1:2, :n2]), jnp.ones((1, n2), bool)
    )
    L = int(np.asarray(fm)[1].sum())
    np.testing.assert_allclose(
        np.asarray(feats)[1, :L], np.asarray(solo)[0, :L], rtol=2e-4,
        atol=2e-5,
    )


def test_log_compression_nonnegative():
    enc = Wav2Vec1Encoder(cfg=Wav2Vec1Config(
        conv_layers=((8, 10, 5),), use_aggregator=False, log_compression=True
    ))
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2000)),
                      jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, wav)
    feats, _ = enc.apply(variables, wav)
    assert float(feats.min()) >= 0.0  # log(1 + |x|) >= 0


def test_fairseq_checkpoint_port():
    """Round-trip: build torch layers matching the architecture, port, and
    compare the conv outputs."""
    cfg = Wav2Vec1Config(
        conv_layers=((8, 10, 5), (8, 4, 2)), use_aggregator=False,
        log_compression=True,
    )
    torch.manual_seed(0)
    sd = {}
    convs = []
    for i, (c, k, s) in enumerate(cfg.conv_layers):
        in_c = 1 if i == 0 else cfg.conv_layers[i - 1][0]
        conv = torch.nn.Conv1d(in_c, c, k, stride=s)
        norm = torch.nn.GroupNorm(1, c)
        torch.nn.init.normal_(norm.weight)
        torch.nn.init.normal_(norm.bias)
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = conv.weight
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = conv.bias
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = norm.weight
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = norm.bias
        convs.append((conv, norm))

    params = fairseq_state_dict_to_flax(sd, cfg)
    enc = Wav2Vec1Encoder(cfg=cfg)
    wav = np.random.default_rng(1).normal(size=(2, 1000)).astype(np.float32)
    got, _ = enc.apply({"params": params}, jnp.asarray(wav))

    with torch.no_grad():
        x = torch.from_numpy(wav)[:, None, :]
        for conv, norm in convs:
            x = torch.relu(norm(conv(x)))
        want = torch.log(1 + x.abs()).transpose(1, 2).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fc_model_trains():
    model = Wav2Vec1FCModel(
        cfg=TINY, stat_pooling_type="mean+std", num_speakers=N_SPK
    )
    task = SpeakerTask(model=model, mode="ce")
    batch = _wav_batch(0)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(2e-3),
        model_state=mstate, rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(task)
    l0 = None
    for i in range(15):
        state, m = step(state, _wav_batch(i))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0


def test_xvector_head_forward():
    model = Wav2Vec1XVectorModel(
        cfg=TINY,
        xvector=XVectorConfig(
            in_channels=16, tdnn_channels=(16, 32),
            tdnn_kernel_sizes=(3, 1), tdnn_dilations=(1, 1), lin_neurons=16,
        ),
        num_speakers=N_SPK,
    )
    task = SpeakerTask(model=model, mode="ce")
    batch = _wav_batch(2, bs=4)
    params, mstate = task.init(jax.random.PRNGKey(0), batch)
    loss, aux = task.loss_fn(
        params, mstate, batch, jax.random.PRNGKey(0), True
    )
    assert np.isfinite(float(loss))
    assert aux["out"]["embedding"].shape == (4, 16)


def test_orchestrator_dispatch():
    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import build_model_and_task
    import pathlib

    cfg = load_config(
        pathlib.Path(__file__).parent.parent / "config",
        "train_eval",
        ["network=wav2vec_fc", "trainer.precision=f32"],
    )
    task, kind = build_model_and_task(cfg, num_speakers=10)
    assert kind == "speaker"
    cfg2 = load_config(
        pathlib.Path(__file__).parent.parent / "config",
        "train_eval",
        ["network=wav2vec_xvector", "trainer.precision=f32"],
    )
    task2, kind2 = build_model_and_task(cfg2, num_speakers=10)
    assert kind2 == "speaker"
