// PESQ-style perceptual speech quality (P.862-derived, wideband MOS-LQO).
//
// Native replacement for the reference's `pesq` pip dependency (ITU-T P.862
// C code wrapped in cython; reference tools_for_model.py:587-592, eval.py).
// This is a from-scratch C++ implementation of the P.862 pipeline:
//
//   1. level alignment of reference & degraded to a common active level,
//   2. envelope-correlation delay compensation,
//   3. Hann-framed power spectra (32 ms, 50% hop),
//   4. Bark-band integration (49 bands, Zwicker scale, computed — not the
//      ITU tables, so scores are P.862-LIKE, monotone in degradation and
//      mapped to the official P.862.2 wideband MOS-LQO range, but not
//      bit-exact against the ITU reference implementation),
//   5. Zwicker-law loudness, masked symmetric + asymmetric disturbances,
//   6. L6-over-split-second / L2-over-time aggregation,
//   7. raw = 4.5 - 0.1 D - 0.0309 DA; P.862.2 logistic map to MOS-LQO.
//
// Exported C API (ctypes): double pesq_mos(const float* ref, const float* deg,
//                                          int n, int sample_rate);
// Build: g++ -O3 -march=native -shared -fPIC -o libpesq.so pesq.cc

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <vector>
#include <cstdlib>

namespace {

using cd = std::complex<double>;

void fft(std::vector<cd>& a, bool invert) {
  const int n = static_cast<int>(a.size());
  if (n <= 1) return;
  for (int i = 1, j = 0; i < n; i++) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = 2 * M_PI / len * (invert ? -1 : 1);
    cd wlen(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      cd w(1);
      for (int j = 0; j < len / 2; j++) {
        cd u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert)
    for (cd& x : a) x /= n;
}

double bark(double f) {
  return 13.0 * std::atan(0.00076 * f) + 3.5 * std::atan((f / 7500.0) * (f / 7500.0));
}

// Terhardt absolute threshold (power units relative to internal scale).
double abs_thresh_power(double f_hz) {
  double f = std::max(f_hz, 20.0) / 1000.0;
  double thr_db = 3.64 * std::pow(f, -0.8) -
                  6.5 * std::exp(-0.6 * (f - 3.3) * (f - 3.3)) +
                  1e-3 * std::pow(f, 4.0);
  thr_db = std::min(std::max(thr_db, -10.0), 96.0);
  return std::pow(10.0, thr_db / 10.0);
}

constexpr double kSl = 1.866055e-1;
constexpr double kZwicker = 0.23;

struct BarkBands {
  std::vector<std::vector<int>> bins;  // fft bins per band
  std::vector<double> center_hz;
};

BarkBands make_bands(int nfft, int fs, int n_bands) {
  BarkBands b;
  int F = nfft / 2 + 1;
  double zmax = bark(fs / 2.0);
  b.bins.assign(n_bands, {});
  b.center_hz.assign(n_bands, 0.0);
  std::vector<double> edge(n_bands + 1);
  for (int i = 0; i <= n_bands; i++) edge[i] = zmax * i / n_bands;
  for (int k = 0; k < F; k++) {
    double f = static_cast<double>(k) * fs / nfft;
    double z = bark(f);
    int band = std::min(static_cast<int>(z / zmax * n_bands), n_bands - 1);
    b.bins[band].push_back(k);
  }
  for (int i = 0; i < n_bands; i++) {
    if (b.bins[i].empty()) {
      // guarantee non-empty bands: borrow the nearest bin
      double zc = 0.5 * (edge[i] + edge[i + 1]);
      int best = 0;
      double bd = 1e18;
      for (int k = 0; k < F; k++) {
        double d = std::abs(bark(static_cast<double>(k) * fs / nfft) - zc);
        if (d < bd) { bd = d; best = k; }
      }
      b.bins[i].push_back(best);
    }
    double s = 0;
    for (int k : b.bins[i]) s += static_cast<double>(k) * fs / nfft;
    b.center_hz[i] = s / b.bins[i].size();
  }
  return b;
}

// Active (speech) level: mean power of frames above 1/10000 of the peak frame.
double active_power(const std::vector<double>& x, int frame) {
  double peak = 0;
  std::vector<double> fp;
  for (size_t i = 0; i + frame <= x.size(); i += frame) {
    double p = 0;
    for (int j = 0; j < frame; j++) p += x[i + j] * x[i + j];
    p /= frame;
    fp.push_back(p);
    peak = std::max(peak, p);
  }
  double thr = peak * 1e-4, s = 0;
  int n = 0;
  for (double p : fp)
    if (p > thr) { s += p; n++; }
  return n ? s / n : 1e-12;
}

// Delay estimate via envelope cross-correlation (4 ms energy envelope).
int estimate_delay(const std::vector<double>& r, const std::vector<double>& d,
                   int fs) {
  int hop = fs / 250;  // 4 ms
  auto env = [&](const std::vector<double>& x) {
    std::vector<double> e;
    for (size_t i = 0; i + hop <= x.size(); i += hop) {
      double p = 0;
      for (int j = 0; j < hop; j++) p += x[i + j] * x[i + j];
      e.push_back(std::sqrt(p));
    }
    return e;
  };
  std::vector<double> er = env(r), ed = env(d);
  int n = 1;
  while (n < static_cast<int>(er.size() + ed.size())) n <<= 1;
  std::vector<cd> A(n), B(n);
  for (size_t i = 0; i < er.size(); i++) A[i] = er[i];
  for (size_t i = 0; i < ed.size(); i++) B[i] = ed[i];
  fft(A, false);
  fft(B, false);
  for (int i = 0; i < n; i++) A[i] = B[i] * std::conj(A[i]);
  fft(A, true);
  int max_lag = std::min<int>(er.size() / 2, fs / hop / 2);  // +-0.5 s
  int best = 0;
  double bv = -1e18;
  for (int lag = -max_lag; lag <= max_lag; lag++) {
    double v = A[(lag % n + n) % n].real();
    if (v > bv) { bv = v; best = lag; }
  }
  return best * hop;  // samples (deg delayed by `best` relative to ref)
}

}  // namespace

extern "C" double pesq_mos(const float* ref, const float* deg, int n,
                           int sample_rate) {
  if (n < sample_rate / 4) return 1.0;  // too short
  std::vector<double> r(ref, ref + n), d(deg, deg + n);

  // 1. level alignment to a common active level.  P.862 specifies a 79 dB SPL
  // listening level; with the Terhardt absolute threshold expressed in dB SPL
  // power units (abs_thresh_power), the matching active power is 10^7.9.
  // This calibration puts the metric on the reference scale: on the 5 shipped
  // example_CLSKD triptychs it reproduces the published All_metric.json means
  // (est 1.47 vs 1.53, mixture 1.06 vs 1.14) — see docs/PARITY.md.
  int lvl_frame = sample_rate / 50;
  double pr = active_power(r, lvl_frame), pd = active_power(d, lvl_frame);
  double target = 7.943e7;  // 79 dB SPL
  if (const char* env = std::getenv("PESQ_LEVEL_TARGET")) target = std::atof(env);
  double sr_ = std::sqrt(target / std::max(pr, 1e-14));
  double sd_ = std::sqrt(target / std::max(pd, 1e-14));
  for (double& v : r) v *= sr_;
  for (double& v : d) v *= sd_;

  // 2. delay compensation (shift deg by -delay)
  int delay = estimate_delay(r, d, sample_rate);
  if (delay > 0) d.erase(d.begin(), d.begin() + std::min<int>(delay, d.size()));
  else if (delay < 0) r.erase(r.begin(), r.begin() + std::min<int>(-delay, r.size()));
  int m = static_cast<int>(std::min(r.size(), d.size()));
  r.resize(m);
  d.resize(m);

  // 3. framed power spectra (32 ms Hann, 50% hop)
  int nfft = sample_rate > 8000 ? 512 : 256;
  int hop = nfft / 2;
  int n_frames = (m - nfft) / hop + 1;
  if (n_frames < 4) return 1.0;
  std::vector<double> win(nfft);
  for (int i = 0; i < nfft; i++)
    win[i] = 0.5 - 0.5 * std::cos(2 * M_PI * i / nfft);

  int n_bands = sample_rate > 8000 ? 49 : 42;
  BarkBands bands = make_bands(nfft, sample_rate, n_bands);
  std::vector<double> p0(n_bands);
  for (int b = 0; b < n_bands; b++) p0[b] = abs_thresh_power(bands.center_hz[b]);

  auto frame_bark = [&](const std::vector<double>& x, int t,
                        std::vector<double>& out) {
    std::vector<cd> buf(nfft);
    for (int i = 0; i < nfft; i++) buf[i] = x[t * hop + i] * win[i];
    fft(buf, false);
    for (int b = 0; b < n_bands; b++) {
      double s = 0;
      for (int k : bands.bins[b]) s += std::norm(buf[k]);
      out[b] = s * 1e4 / nfft;  // internal power scale
    }
  };

  // 4-6. loudness + disturbances per frame
  std::vector<double> D_frame(n_frames), DA_frame(n_frames), W_frame(n_frames);
  std::vector<double> br(n_bands), bd(n_bands);
  for (int t = 0; t < n_frames; t++) {
    frame_bark(r, t, br);
    frame_bark(d, t, bd);
    // per-frame gain equalization of audible power (partial compensation)
    double ar = 1e4, ad = 1e4;
    for (int b = 0; b < n_bands; b++) {
      if (br[b] > p0[b]) ar += br[b];
      if (bd[b] > p0[b]) ad += bd[b];
    }
    double g = std::min(std::max(ar / ad, 3e-4), 5.0);
    double dsym2 = 0, dasym = 0;
    for (int b = 0; b < n_bands; b++) {
      double pb = bd[b] * g;
      double lr = kSl * std::pow(p0[b] / 0.5, kZwicker) *
                  (std::pow(0.5 + 0.5 * br[b] / p0[b], kZwicker) - 1.0);
      double ld = kSl * std::pow(p0[b] / 0.5, kZwicker) *
                  (std::pow(0.5 + 0.5 * pb / p0[b], kZwicker) - 1.0);
      double mask = 0.25 * std::min(lr, ld);
      double diff = std::abs(ld - lr);
      double dd = std::max(diff - mask, 0.0);
      dsym2 += dd * dd;
      double ratio = std::pow((pb + 50.0) / (br[b] + 50.0), 1.2);
      if (ratio >= 3.0) dasym += dd * std::min(ratio, 12.0);
    }
    // loudness-based frame weight (quiet frames matter less); P.862-style
    // normalization against the total audible reference power.
    double tot = 1e4;
    for (int b = 0; b < n_bands; b++) tot += br[b];
    W_frame[t] = std::pow((tot + 1e5) / 1e7, 0.04);
    // P.862 caps the per-frame disturbances at 45 — this bounds the
    // contribution of catastrophically degraded frames and keeps the
    // heavy-degradation end of the scale compressed like the ITU metric.
    D_frame[t] = std::min(std::sqrt(dsym2 / n_bands), 45.0);
    DA_frame[t] = std::min(dasym / n_bands, 45.0);
  }

  // split-second aggregation: L6 within 20-frame windows (50% overlap),
  // then L2 over windows.
  auto aggregate = [&](const std::vector<double>& f) {
    const int win_f = 20, hop_f = 10;
    std::vector<double> ss;
    for (int s = 0; s + 1 < n_frames; s += hop_f) {
      int e = std::min(s + win_f, n_frames);
      double acc = 0;
      int c = 0;
      for (int t = s; t < e; t++) {
        double v = f[t] * W_frame[t];
        acc += std::pow(v, 6.0);
        c++;
      }
      if (c) ss.push_back(std::pow(acc / c, 1.0 / 6.0));
      if (e == n_frames) break;
    }
    double acc = 0;
    for (double v : ss) acc += v * v;
    return ss.empty() ? 0.0 : std::sqrt(acc / ss.size());
  };

  double D = aggregate(D_frame);
  double DA = aggregate(DA_frame);

  double raw = 4.5 - 0.1 * D - 0.0309 * DA;
  // P.862.2 wideband logistic mapping to MOS-LQO
  double mos = 0.999 + (4.999 - 0.999) / (1.0 + std::exp(-1.3669 * raw + 3.8224));
  return std::min(std::max(mos, 1.0), 4.64);
}

extern "C" int pesq_version() { return 11; }
