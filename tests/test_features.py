"""Fbank feature extraction: DFT-as-matmul vs numpy rfft, mel matrix, shapes."""

import numpy as np
import pytest

from w2v2_speaker_tpu.data.features import (
    FbankConfig,
    log_mel_filterbank,
    mel_filterbank_matrix,
    num_frames,
)


def _numpy_fbank(wav, cfg):
    """Straightforward rfft-based computation used as the check."""
    p = cfg.n_fft // 2
    x = np.pad(wav, (p, p), mode="reflect")
    window = np.hamming(cfg.win_length)
    frames = []
    for start in range(0, len(x) - cfg.n_fft + 1, cfg.hop_length):
        frames.append(x[start : start + cfg.n_fft] * window)
    frames = np.stack(frames)
    spec = np.abs(np.fft.rfft(frames, n=cfg.n_fft, axis=-1)) ** 2
    mel = spec @ mel_filterbank_matrix(cfg)
    return np.log(mel + cfg.log_eps)


def test_fbank_matches_rfft_reference():
    cfg = FbankConfig()
    rng = np.random.default_rng(0)
    wav = rng.normal(size=16000).astype(np.float32)
    got = np.asarray(log_mel_filterbank(wav[None, :], cfg))[0]
    want = _numpy_fbank(wav, cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_shape_and_frame_count():
    cfg = FbankConfig()
    wav = np.zeros((2, 48000), dtype=np.float32)
    out = np.asarray(log_mel_filterbank(wav, cfg))
    assert out.shape == (2, num_frames(48000, cfg), cfg.n_mels)
    assert num_frames(48000, cfg) == 301  # 3 s at 16 kHz, 10 ms hop, center


def test_mel_matrix_properties():
    cfg = FbankConfig(n_mels=40)
    m = mel_filterbank_matrix(cfg)
    assert m.shape == (201, 40)
    assert (m >= 0).all()
    # every filter has support
    assert (m.sum(axis=0) > 0).all()
    # filters peak in increasing frequency order
    peaks = m.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_fbank_sensitivity_to_tone_frequency():
    cfg = FbankConfig()
    t = np.arange(16000) / 16000
    low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
    fb_low = np.asarray(log_mel_filterbank(low[None], cfg))[0].mean(axis=0)
    fb_high = np.asarray(log_mel_filterbank(high[None], cfg))[0].mean(axis=0)
    assert fb_low.argmax() < fb_high.argmax()


def test_fbank_lengths_reflects_at_true_utterance_end():
    """Padded-batch fbank with per-row lengths must bit-match the solo
    (unpadded) computation on every valid frame — the reflection must happen
    at the true utterance end, not at the zero-padded batch edge."""
    cfg = FbankConfig()
    rng = np.random.default_rng(7)
    n_pad = 24000
    lens = [24000, 17003, 9000]
    wavs = [rng.normal(size=n).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), n_pad), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    got = np.asarray(
        log_mel_filterbank(batch, cfg, lengths=np.asarray(lens))
    )
    for i, w in enumerate(wavs):
        solo = np.asarray(log_mel_filterbank(w[None], cfg))[0]
        t = num_frames(lens[i], cfg)
        assert solo.shape[0] == t
        np.testing.assert_array_equal(got[i, :t], solo)


def test_fbank_frontend_padding_invariance():
    """Frontend-level invariance: batched padded eval through FbankFrontend
    (incl. masked normalization) must reproduce the unpadded forward."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from w2v2_speaker_tpu.models.frontend import FbankFrontend

    class Probe(nn.Module):
        """Returns masked mean over frames — any frame leakage shows up."""

        @nn.compact
        def __call__(self, feats, frame_mask, train=False, labels=None):
            m = frame_mask.astype(feats.dtype)[:, :, None]
            return (feats**2 * m).sum(axis=1) / m.sum(axis=1)

        def compute_embedding(self, feats, frame_mask):
            return self(feats, frame_mask)

    model = FbankFrontend(Probe())
    rng = np.random.default_rng(3)
    lens = [16000, 11313]
    n_pad = 16000
    batch = np.zeros((2, n_pad), np.float32)
    mask = np.zeros((2, n_pad), bool)
    wavs = [rng.normal(size=n).astype(np.float32) for n in lens]
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
        mask[i, : len(w)] = True
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch), jnp.asarray(mask)
    )
    padded = np.asarray(
        model.apply(variables, jnp.asarray(batch), jnp.asarray(mask))
    )
    for i, w in enumerate(wavs):
        solo = np.asarray(
            model.apply(
                variables,
                jnp.asarray(w[None]),
                jnp.ones((1, len(w)), bool),
            )
        )[0]
        np.testing.assert_allclose(padded[i], solo, rtol=1e-5, atol=1e-6)
