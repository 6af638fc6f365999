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
