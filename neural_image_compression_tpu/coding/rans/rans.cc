// Host-side rANS entropy coder for TPU-computed distributions.
//
// The reference codebase has NO bitstream coder at all — its rate is analytic
// (-sum log p, RateDistortionLoss.py:13-17) and its per-channel CDF hooks
// (EntropyModels.py:153-184) are only used for plotting. This file provides
// the real codec: a byte-wise 32-bit rANS with 16-bit fixed-point CDFs.
//
// Split of labor (TPU-first design):
//   * TPU computes the heavy NN-side quantities: per-symbol Gaussian /
//     mixture parameters (mu, sigma, weights) and per-channel factorized CDF
//     grids.
//   * This coder derives deterministic fixed-point CDFs from those parameters
//     (identically at encode and decode time — both sides run the same code
//     on the same floats) and does the serial entropy coding the TPU cannot.
//
// Streams are LIFO: symbols are encoded in REVERSE order so they decode in
// forward (raster) order — required for the autoregressive wavefront decoder,
// which learns each pixel's parameters only after decoding its causal context.
//
// Symbol model for Gaussian/GMM paths: alphabet centered at the (mixture)
// mean c = lrint(E[y]), span d in [-R, R] with R = clamp(ceil(6*std)+2, 2, 254),
// plus an ESC symbol carrying outliers as two raw 16-bit halves.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;  // lower bound of the state interval

// ---------------------------------------------------------------------------
// rANS primitives
// ---------------------------------------------------------------------------

struct Encoder {
  uint32_t x = kRansL;
  std::vector<uint8_t> bytes;  // emitted backwards; reversed at flush

  inline void put(uint32_t cum, uint32_t freq) {
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    x = ((x / freq) << kProbBits) + (x % freq) + cum;
  }

  inline void put_raw16(uint32_t v) { put(v, 1); }  // uniform: 16 bits

  // Returns total byte length; writes into out (caller-sized).
  int flush(uint8_t* out, int cap) {
    bytes.push_back(static_cast<uint8_t>(x & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 8) & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 16) & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 24) & 0xff));
    int n = static_cast<int>(bytes.size());
    if (n > cap) return -1;
    for (int i = 0; i < n; ++i) out[i] = bytes[n - 1 - i];
    return n;
  }
};

struct Decoder {
  uint32_t x = 0;
  const uint8_t* buf = nullptr;
  int len = 0;
  int pos = 0;

  void init(const uint8_t* b, int l) {
    buf = b;
    len = l;
    pos = 0;
    x = 0;
    for (int i = 0; i < 4 && pos < len; ++i) x = (x << 8) | buf[pos++];
  }

  inline uint32_t peek() const { return x & (kProbScale - 1); }

  inline void advance(uint32_t cum, uint32_t freq) {
    x = freq * (x >> kProbBits) + (x & (kProbScale - 1)) - cum;
    while (x < kRansL && pos < len) x = (x << 8) | buf[pos++];
  }

  inline uint32_t get_raw16() {
    uint32_t v = peek();
    advance(v, 1);
    return v;
  }
};

// ---------------------------------------------------------------------------
// Deterministic per-symbol CDF construction
// ---------------------------------------------------------------------------

inline double std_normal_cdf(double v) { return 0.5 * std::erfc(-v * M_SQRT1_2); }

// Scratch for one symbol's quantized model.
struct SymbolModel {
  int c;          // alphabet center
  int R;          // span: d in [-R, R]
  int nsym;       // 2R + 2 (incl. escape, last index)
  std::vector<uint32_t> cum;  // size nsym + 1, cum[nsym] == kProbScale
};

// Builds the quantized CDF for a (mixture-of-)Gaussian symbol.
// mus/sigmas/ws point to K components (K==1: plain Gaussian, w ignored).
static void build_gaussian_model(const float* ws, const float* mus,
                                 const float* sigmas, int K, SymbolModel* m) {
  double mean = 0.0, m2 = 0.0;
  for (int k = 0; k < K; ++k) {
    double w = (K == 1) ? 1.0 : static_cast<double>(ws[k]);
    double mu = mus[k], s = sigmas[k];
    mean += w * mu;
    m2 += w * (s * s + mu * mu);
  }
  double var = m2 - mean * mean;
  double stdd = std::sqrt(var > 1e-12 ? var : 1e-12);
  int c = static_cast<int>(std::lrint(mean));
  int R = static_cast<int>(std::ceil(6.0 * stdd)) + 2;
  if (R < 2) R = 2;
  if (R > 254) R = 254;
  int nsym = 2 * R + 2;

  // mixture CDF at the 2R+2 bin edges (one erfc per edge per component),
  // then difference into the pmf — half the transcendental work of
  // evaluating upper/lower per bin.
  double edge[512];
  int n_edges = 2 * R + 2;
  for (int e = 0; e < n_edges; ++e) {
    double t = c - R - 0.5 + e;
    double acc = 0.0;
    for (int k = 0; k < K; ++k) {
      double w = (K == 1) ? 1.0 : static_cast<double>(ws[k]);
      acc += w * std_normal_cdf((t - mus[k]) / sigmas[k]);
    }
    edge[e] = acc;
  }
  double pmf[512];
  double total = 0.0;
  for (int d = -R; d <= R; ++d) {
    double p = edge[d + R + 1] - edge[d + R];
    if (p < 0.0) p = 0.0;
    pmf[d + R] = p;
    total += p;
  }
  double esc = 1.0 - total;
  if (esc < 0.0) esc = 0.0;
  pmf[nsym - 1] = esc;
  total += esc;
  if (total <= 0.0) total = 1.0;

  // Quantize: every symbol gets freq >= 1; remainder to the most likely one.
  m->c = c;
  m->R = R;
  m->nsym = nsym;
  m->cum.resize(nsym + 1);
  uint32_t budget = kProbScale - static_cast<uint32_t>(nsym);
  uint32_t acc = 0;
  int argmax = 0;
  double pmax = -1.0;
  std::vector<uint32_t> freq(nsym);
  for (int j = 0; j < nsym; ++j) {
    double p = pmf[j] / total;
    uint32_t f = 1 + static_cast<uint32_t>(p * budget);
    freq[j] = f;
    acc += f;
    if (pmf[j] > pmax) {
      pmax = pmf[j];
      argmax = j;
    }
  }
  freq[argmax] += kProbScale - acc;
  m->cum[0] = 0;
  for (int j = 0; j < nsym; ++j) m->cum[j + 1] = m->cum[j] + freq[j];
}

// Binary search: find j with cum[j] <= cf < cum[j+1].
static inline int cdf_find(const uint32_t* cum, int nsym, uint32_t cf) {
  int lo = 0, hi = nsym;
  while (hi - lo > 1) {
    int mid = (lo + hi) >> 1;
    if (cum[mid] <= cf) lo = mid;
    else hi = mid;
  }
  return lo;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// --- Gaussian / GMM stream --------------------------------------------------
// Layout of params: mus/sigmas/ws are (n, K) row-major; K==1 ws may be null.

int rans_encode_gaussian(const int32_t* sym, const float* ws, const float* mus,
                         const float* sigmas, int K, int n, uint8_t* out,
                         int cap) {
  Encoder enc;
  enc.bytes.reserve(n * 2 + 16);
  SymbolModel m;
  for (int i = n - 1; i >= 0; --i) {
    const float* w = ws ? ws + static_cast<size_t>(i) * K : nullptr;
    build_gaussian_model(w, mus + static_cast<size_t>(i) * K,
                         sigmas + static_cast<size_t>(i) * K, K, &m);
    int d = sym[i] - m.c;
    if (d >= -m.R && d <= m.R) {
      int j = d + m.R;
      enc.put(m.cum[j], m.cum[j + 1] - m.cum[j]);
    } else {
      uint32_t v = static_cast<uint32_t>(sym[i]) + 0x80000000u;
      enc.put_raw16(v & 0xffffu);          // decoded last
      enc.put_raw16((v >> 16) & 0xffffu);  // decoded second
      int j = m.nsym - 1;                  // ESC decoded first
      enc.put(m.cum[j], m.cum[j + 1] - m.cum[j]);
    }
  }
  return enc.flush(out, cap);
}

struct RansDec {
  Decoder d;
};

void* rans_dec_create(const uint8_t* buf, int len) {
  RansDec* r = new RansDec();
  r->d.init(buf, len);
  return r;
}

void rans_dec_destroy(void* p) { delete static_cast<RansDec*>(p); }

// Decode n symbols with per-symbol (mixture-)Gaussian params.
void rans_dec_gaussian(void* p, const float* ws, const float* mus,
                       const float* sigmas, int K, int n, int32_t* out) {
  Decoder& dec = static_cast<RansDec*>(p)->d;
  SymbolModel m;
  for (int i = 0; i < n; ++i) {
    const float* w = ws ? ws + static_cast<size_t>(i) * K : nullptr;
    build_gaussian_model(w, mus + static_cast<size_t>(i) * K,
                         sigmas + static_cast<size_t>(i) * K, K, &m);
    uint32_t cf = dec.peek();
    int j = cdf_find(m.cum.data(), m.nsym, cf);
    dec.advance(m.cum[j], m.cum[j + 1] - m.cum[j]);
    if (j == m.nsym - 1) {  // escape: two raw halves follow
      uint32_t hi = dec.get_raw16();
      uint32_t lo = dec.get_raw16();
      out[i] = static_cast<int32_t>(((hi << 16) | lo) - 0x80000000u);
    } else {
      out[i] = m.c + (j - m.R);
    }
  }
}

// --- Indexed-CDF stream (factorized bottleneck, per-channel tables) --------
// cdfs: (n_rows, row_len) row-major cumulative tables; row r describes
// symbols offsets[r] + k for k in [0, sizes[r]-2], with index sizes[r]-1 as
// ESC. cdfs[r][sizes[r]] == 2^16. row_len >= max(sizes)+1.

int rans_encode_indexed(const int32_t* sym, const int32_t* index, int n,
                        const uint32_t* cdfs, int row_len,
                        const int32_t* offsets, const int32_t* sizes,
                        uint8_t* out, int cap) {
  Encoder enc;
  enc.bytes.reserve(n + 16);
  for (int i = n - 1; i >= 0; --i) {
    int r = index[i];
    const uint32_t* cum = cdfs + static_cast<size_t>(r) * row_len;
    int nsym = sizes[r];
    int j = sym[i] - offsets[r];
    if (j >= 0 && j < nsym - 1) {
      enc.put(cum[j], cum[j + 1] - cum[j]);
    } else {
      uint32_t v = static_cast<uint32_t>(sym[i]) + 0x80000000u;
      enc.put_raw16(v & 0xffffu);
      enc.put_raw16((v >> 16) & 0xffffu);
      j = nsym - 1;
      enc.put(cum[j], cum[j + 1] - cum[j]);
    }
  }
  return enc.flush(out, cap);
}

void rans_dec_indexed(void* p, const int32_t* index, int n,
                      const uint32_t* cdfs, int row_len,
                      const int32_t* offsets, const int32_t* sizes,
                      int32_t* out) {
  Decoder& dec = static_cast<RansDec*>(p)->d;
  for (int i = 0; i < n; ++i) {
    int r = index[i];
    const uint32_t* cum = cdfs + static_cast<size_t>(r) * row_len;
    int nsym = sizes[r];
    uint32_t cf = dec.peek();
    int j = cdf_find(cum, nsym, cf);
    dec.advance(cum[j], cum[j + 1] - cum[j]);
    if (j == nsym - 1) {
      uint32_t hi = dec.get_raw16();
      uint32_t lo = dec.get_raw16();
      out[i] = static_cast<int32_t>(((hi << 16) | lo) - 0x80000000u);
    } else {
      out[i] = offsets[r] + j;
    }
  }
}

}  // extern "C"
