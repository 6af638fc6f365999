"""Native C++ DSP library: build, and exact parity vs scipy."""

import numpy as np
import pytest
from scipy import signal

from w2v2_speaker_tpu.utils import native

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native DSP library failed to build")
    return lib


def test_upfirdn_matches_scipy(lib):
    x = RNG.normal(size=1000).astype(np.float32)
    taps = signal.firwin(41, 0.3).astype(np.float32)
    for up, down in [(1, 1), (2, 3), (3, 2), (20, 21), (21, 20)]:
        want = signal.upfirdn(taps.astype(np.float64), x.astype(np.float64),
                              up, down)
        got = native.upfirdn(x, taps, up, down)
        assert got.shape[0] == want.shape[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_fir_same_matches_scipy(lib):
    x = RNG.normal(size=4096).astype(np.float32)
    taps = signal.firwin(255, [0.1, 0.4], pass_zero=True).astype(np.float32)
    want = signal.fftconvolve(x, taps, mode="same")
    got = native.fir_same(x, taps)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_fft_convolve_matches_scipy(lib):
    x = RNG.normal(size=5000).astype(np.float32)
    h = RNG.normal(size=700).astype(np.float32)
    want = signal.fftconvolve(x, h)
    got = native.fft_convolve(x, h)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_speed_perturb_native_matches_scipy(lib):
    from w2v2_speaker_tpu.data.augment import speed_perturb

    x = RNG.normal(size=16000).astype(np.float32)
    for factor in (0.9, 0.95, 1.05, 1.1):
        native_out = speed_perturb(x, factor)
        from fractions import Fraction

        frac = Fraction(1.0 / factor).limit_denominator(100)
        scipy_out = signal.resample_poly(
            x, frac.numerator, frac.denominator
        ).astype(np.float32)
        assert native_out.shape == scipy_out.shape
        np.testing.assert_allclose(
            native_out, scipy_out, rtol=1e-3, atol=1e-5
        )
