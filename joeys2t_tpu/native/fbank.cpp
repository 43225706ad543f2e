// Kaldi-compliant log-mel filterbank extraction (host-side, C++).
//
// Native equivalent of joeys2t_tpu/ops/fbank.py:fbank_numpy — the
// compute-heavy host path of data preparation (the reference relies on
// torchaudio's C++ kaldi fbank, joeynmt/helpers_for_audio.py:34-37).
// Same pipeline: snip_edges framing, DC removal, 0.97 preemphasis, povey
// window, zero-pad to a power of two, radix-2 FFT power spectrum, kaldi
// triangular mel banks (low 20 Hz), log with float32-eps floor.
//
// Built with g++ -O3 -shared -fPIC and loaded via ctypes.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kEpsilon = 1.1920928955078125e-07;  // float32 eps
constexpr double kPi = 3.14159265358979323846;

int next_power_of_2(int x) {
  int p = 1;
  while (p < x) p <<= 1;
  return p;
}

double mel_scale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

// Iterative radix-2 complex FFT, in place, size must be a power of two.
void fft(std::vector<double>& re, std::vector<double>& im) {
  const int n = static_cast<int>(re.size());
  // bit reversal
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int j = 0; j < len / 2; ++j) {
        const int a = i + j, b = i + j + len / 2;
        const double xr = re[b] * cr - im[b] * ci;
        const double xi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

struct MelState {
  int num_bins = 0;
  int padded = 0;
  double sample_rate = 0.0;
  std::vector<double> banks;  // (num_bins, padded/2 + 1) row-major
  std::vector<int> first;     // first nonzero fft bin per mel bin
  std::vector<int> last;      // one past the last nonzero fft bin
  std::vector<double> window;
};

// kaldi/torchaudio get_mel_banks, low=20Hz, high=nyquist; nyquist column 0.
void build_mel(MelState& st) {
  const int num_fft_bins = st.padded / 2;
  const double nyquist = 0.5 * st.sample_rate;
  const double low_freq = 20.0, high_freq = nyquist;
  const double fft_bin_width = st.sample_rate / st.padded;
  const double mel_low = mel_scale(low_freq);
  const double mel_high = mel_scale(high_freq);
  const double delta = (mel_high - mel_low) / (st.num_bins + 1);

  st.banks.assign(static_cast<size_t>(st.num_bins) * (num_fft_bins + 1), 0.0);
  st.first.assign(st.num_bins, num_fft_bins + 1);
  st.last.assign(st.num_bins, 0);
  for (int j = 0; j < st.num_bins; ++j) {
    const double left = mel_low + j * delta;
    const double center = mel_low + (j + 1) * delta;
    const double right = mel_low + (j + 2) * delta;
    for (int i = 0; i < num_fft_bins; ++i) {
      const double mel = mel_scale(fft_bin_width * i);
      const double up = (mel - left) / (center - left);
      const double down = (right - mel) / (right - center);
      const double v = up < down ? up : down;
      if (v > 0.0) {
        st.banks[static_cast<size_t>(j) * (num_fft_bins + 1) + i] = v;
        if (i < st.first[j]) st.first[j] = i;
        if (i + 1 > st.last[j]) st.last[j] = i + 1;
      }
    }
    if (st.first[j] > st.last[j]) st.first[j] = st.last[j] = 0;
  }
}

void build_window(MelState& st, int window_size) {
  st.window.resize(window_size);
  for (int i = 0; i < window_size; ++i) {
    st.window[i] = std::pow(
        0.5 - 0.5 * std::cos(2.0 * kPi * i / (window_size - 1)), 0.85);
  }
}

}  // namespace

extern "C" {

// snip_edges frame count for a waveform of length n.
int64_t fbank_num_frames(int64_t n, double sample_rate, double frame_length_ms,
                         double frame_shift_ms) {
  const int window_size = static_cast<int>(sample_rate * frame_length_ms * 1e-3);
  const int window_shift = static_cast<int>(sample_rate * frame_shift_ms * 1e-3);
  if (n < window_size) return 0;
  return 1 + (n - window_size) / window_shift;
}

// wav: (n,) float32 (int16-scaled). out: (max_frames, num_mel_bins) float32.
// Returns the number of frames written, or -1 if max_frames is too small.
int64_t fbank(const float* wav, int64_t n, double sample_rate,
              int32_t num_mel_bins, double frame_length_ms,
              double frame_shift_ms, float* out, int64_t max_frames) {
  const int window_size = static_cast<int>(sample_rate * frame_length_ms * 1e-3);
  const int window_shift = static_cast<int>(sample_rate * frame_shift_ms * 1e-3);
  const int padded = next_power_of_2(window_size);
  const int64_t m =
      fbank_num_frames(n, sample_rate, frame_length_ms, frame_shift_ms);
  if (m > max_frames) return -1;
  if (m == 0) return 0;

  static thread_local MelState st;
  if (st.num_bins != num_mel_bins || st.padded != padded ||
      st.sample_rate != sample_rate) {
    st.num_bins = num_mel_bins;
    st.padded = padded;
    st.sample_rate = sample_rate;
    build_mel(st);
    build_window(st, window_size);
  }

  const int num_fft_bins = padded / 2;
  std::vector<double> f0(window_size), f1(window_size), re(padded), im(padded),
      spec0(num_fft_bins + 1), spec1(num_fft_bins + 1);

  auto preprocess = [&](int64_t t, std::vector<double>& frame) {
    const float* src = wav + t * window_shift;
    double mean = 0.0;
    for (int i = 0; i < window_size; ++i) mean += src[i];
    mean /= window_size;
    for (int i = 0; i < window_size; ++i) frame[i] = src[i] - mean;
    // preemphasis with duplicated first sample, then povey window
    for (int i = window_size - 1; i > 0; --i)
      frame[i] = (frame[i] - 0.97 * frame[i - 1]) * st.window[i];
    frame[0] = (frame[0] - 0.97 * frame[0]) * st.window[0];
  };

  auto project = [&](int64_t t, const std::vector<double>& spectrum) {
    float* dst = out + t * num_mel_bins;
    for (int j = 0; j < num_mel_bins; ++j) {
      const double* bank = st.banks.data() +
                           static_cast<size_t>(j) * (num_fft_bins + 1);
      double acc = 0.0;
      for (int i = st.first[j]; i < st.last[j]; ++i)
        acc += spectrum[i] * bank[i];  // triangular filters are band-limited
      dst[j] = static_cast<float>(
          std::log(acc > kEpsilon ? acc : kEpsilon));
    }
  };

  // two real frames per complex FFT: z = f0 + i*f1, then
  // F0[k] = (Z[k] + conj(Z[N-k]))/2, F1[k] = (Z[k] - conj(Z[N-k]))/(2i)
  for (int64_t t = 0; t + 1 < m; t += 2) {
    preprocess(t, f0);
    preprocess(t + 1, f1);
    for (int i = 0; i < window_size; ++i) {
      re[i] = f0[i];
      im[i] = f1[i];
    }
    for (int i = window_size; i < padded; ++i) re[i] = im[i] = 0.0;
    fft(re, im);
    spec0[0] = re[0] * re[0];
    spec1[0] = im[0] * im[0];
    for (int i = 1; i <= num_fft_bins; ++i) {
      const double ar = 0.5 * (re[i] + re[padded - i]);
      const double ai = 0.5 * (im[i] - im[padded - i]);
      const double br = 0.5 * (im[i] + im[padded - i]);
      const double bi = 0.5 * (re[padded - i] - re[i]);
      spec0[i] = ar * ar + ai * ai;
      spec1[i] = br * br + bi * bi;
    }
    project(t, spec0);
    project(t + 1, spec1);
  }
  if (m & 1) {  // trailing odd frame: plain FFT with zero imaginary part
    const int64_t t = m - 1;
    preprocess(t, f0);
    for (int i = 0; i < window_size; ++i) re[i] = f0[i];
    for (int i = window_size; i < padded; ++i) re[i] = 0.0;
    std::memset(im.data(), 0, sizeof(double) * padded);
    fft(re, im);
    for (int i = 0; i <= num_fft_bins; ++i)
      spec0[i] = re[i] * re[i] + im[i] * im[i];
    project(t, spec0);
  }
  return m;
}

}  // extern "C"
