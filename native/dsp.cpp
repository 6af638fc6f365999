// Native host-side audio DSP for the data pipeline.
//
// The reference delegates its augmentation DSP to sox/WavAugment C++ code
// (SURVEY §2.9); this library is the equivalent native layer for the TPU
// framework's host pipeline: polyphase resampling (speed perturbation),
// same-size FIR filtering (band reject) and FFT convolution (reverb).
// Exposed as a plain C ABI consumed through ctypes
// (w2v2_speaker_tpu/utils/native.py) with numpy/scipy fallbacks, so the
// framework works without the build but feeds the TPU faster with it.
//
// Build: make -C native  (g++ -O3 -shared; no external dependencies)

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// y[k] = sum_i taps[i] * x_up[k*down - i], x upsampled by `up` with zeros.
// Matches scipy.signal.resample_poly's upfirdn core (gain `up` applied by
// the caller through the taps). Output length must be
// ceil((n*up) / down) == ((n*up) + down - 1) / down.
void w2vtpu_upfirdn(const float* x, int64_t n, const float* taps,
                    int64_t ntaps, int64_t up, int64_t down, float* y,
                    int64_t ny) {
  // polyphase decomposition: taps[j] applies to x[t] where j = k*down - t*up
  for (int64_t k = 0; k < ny; ++k) {
    const int64_t pos = k * down;  // position in upsampled stream
    // j ranges over taps with (pos - j) divisible by up
    const int64_t j0 = pos % up;  // smallest valid tap index offset
    double acc = 0.0;
    for (int64_t j = j0; j < ntaps; j += up) {
      const int64_t t = (pos - j) / up;
      if (t < 0) break;      // further j only decreases t
      if (t >= n) continue;  // leading taps outside the signal
      acc += static_cast<double>(taps[j]) * static_cast<double>(x[t]);
    }
    y[k] = static_cast<float>(acc);
  }
}

// Same-size FIR filtering: y[k] = sum_i taps[i] * x[k + center - i]
// (zero padded), matching scipy.signal.fftconvolve(x, taps, mode="same").
void w2vtpu_fir_same(const float* x, int64_t n, const float* taps,
                     int64_t ntaps, float* y) {
  const int64_t center = (ntaps - 1) / 2;
  for (int64_t k = 0; k < n; ++k) {
    const int64_t base = k + center;
    const int64_t i_lo = base >= n - 1 ? base - (n - 1) : 0;
    const int64_t i_hi = base < ntaps - 1 ? base : ntaps - 1;
    double acc = 0.0;
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      acc += static_cast<double>(taps[i]) * static_cast<double>(x[base - i]);
    }
    y[k] = static_cast<float>(acc);
  }
}

namespace {

// iterative radix-2 Cooley-Tukey (in place), n must be a power of two
void fft_inplace(std::complex<double>* a, int64_t n, bool inverse) {
  for (int64_t i = 1, j = 0; i < n; ++i) {  // bit reversal
    int64_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int64_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * M_PI / static_cast<double>(len) *
                       (inverse ? 1.0 : -1.0);
    const std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (int64_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (int64_t k = 0; k < len / 2; ++k) {
        const std::complex<double> u = a[i + k];
        const std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (inverse) {
    for (int64_t i = 0; i < n; ++i) a[i] /= static_cast<double>(n);
  }
}

}  // namespace

// Full linear convolution via FFT; y must hold n + m - 1 samples.
void w2vtpu_fft_convolve(const float* x, int64_t n, const float* h,
                         int64_t m, float* y) {
  const int64_t out = n + m - 1;
  int64_t size = 1;
  while (size < out) size <<= 1;
  std::vector<std::complex<double>> fa(size), fb(size);
  for (int64_t i = 0; i < n; ++i) fa[i] = x[i];
  for (int64_t i = 0; i < m; ++i) fb[i] = h[i];
  fft_inplace(fa.data(), size, false);
  fft_inplace(fb.data(), size, false);
  for (int64_t i = 0; i < size; ++i) fa[i] *= fb[i];
  fft_inplace(fa.data(), size, true);
  for (int64_t i = 0; i < out; ++i) {
    y[i] = static_cast<float>(fa[i].real());
  }
}

// PCM16 little-endian -> float32 in [-1, 1) (wav decode hot loop).
void w2vtpu_pcm16_to_f32(const int16_t* x, int64_t n, float* y) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) y[i] = static_cast<float>(x[i]) * kScale;
}

int w2vtpu_abi_version() { return 1; }

}  // extern "C"
