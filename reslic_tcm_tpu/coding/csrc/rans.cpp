// TPU-native LIC framework: host-side range-coding backend.
//
// Implements the rANS (range asymmetric numeral system) entropy coder and the
// deterministic pmf -> quantized-CDF converter that the reference stack gets
// from CompressAI's C++ extensions (see reference entropy_models/coder.py:10-56
// and the call sites in models/reference/tcm.py:502-635). The coding scheme is
// the public-domain ryg_rans 64-bit variant with 32-bit renormalization words,
// 16-bit probability precision and a 4-bit bypass (escape) mode for symbols
// outside a table's support — stream-format compatible with CompressAI so
// bitstreams can be exchanged at matched CDF tables.
//
// Exposed as a plain C ABI for Python ctypes (no pybind11 dependency). All
// bulk arguments are contiguous arrays, so the Python side passes numpy
// buffers directly with zero per-symbol overhead (the reference pays a
// Python-list conversion per call).

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using Rans64State = uint64_t;

constexpr uint32_t kProbBits = 16;           // entropy_coder_precision = 16
constexpr uint32_t kBypassPrecision = 4;     // bypass chunk size in bits
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;
constexpr uint64_t kRansL = 1ull << 31;      // lower bound of normalization interval

inline void rans_enc_init(Rans64State* r) { *r = kRansL; }

inline void rans_enc_put(Rans64State* r, uint32_t** pptr, uint32_t start,
                         uint32_t freq, uint32_t scale_bits) {
  uint64_t x = *r;
  uint64_t x_max = ((kRansL >> scale_bits) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = ((x / freq) << scale_bits) + (x % freq) + start;
}

inline void rans_enc_put_bits(Rans64State* r, uint32_t** pptr, uint32_t val,
                              uint32_t nbits) {
  assert(nbits <= 16);
  assert(val < (1u << nbits));
  uint64_t x = *r;
  uint32_t freq = 1 << (16 - nbits);
  uint64_t x_max = ((kRansL >> 16) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = (x << nbits) | val;
}

inline void rans_enc_flush(Rans64State* r, uint32_t** pptr) {
  uint64_t x = *r;
  *pptr -= 2;
  (*pptr)[0] = static_cast<uint32_t>(x >> 0);
  (*pptr)[1] = static_cast<uint32_t>(x >> 32);
}

// Decoder renormalization reads are bounds-checked: a malformed or
// over-consumed stream yields zero words instead of a heap over-read
// (well-formed streams never hit the clamp, so output is unchanged).
inline uint32_t next_word(uint32_t const** pptr, const uint32_t* end) {
  if (*pptr < end) {
    uint32_t w = **pptr;
    *pptr += 1;
    return w;
  }
  return 0;
}

inline void rans_dec_init(Rans64State* r, uint32_t const** pptr,
                          const uint32_t* end) {
  uint64_t x;
  x = static_cast<uint64_t>(next_word(pptr, end)) << 0;
  x |= static_cast<uint64_t>(next_word(pptr, end)) << 32;
  *r = x;
}

inline uint32_t rans_dec_get(Rans64State* r, uint32_t scale_bits) {
  return *r & ((1u << scale_bits) - 1);
}

inline void rans_dec_advance(Rans64State* r, uint32_t const** pptr,
                             const uint32_t* end, uint32_t start,
                             uint32_t freq, uint32_t scale_bits) {
  uint64_t mask = (1ull << scale_bits) - 1;
  uint64_t x = *r;
  x = freq * (x >> scale_bits) + (x & mask) - start;
  if (x < kRansL) {
    x = (x << 32) | next_word(pptr, end);
  }
  *r = x;
}

inline uint32_t rans_dec_get_bits(Rans64State* r, uint32_t const** pptr,
                                  const uint32_t* end, uint32_t n_bits) {
  uint64_t x = *r;
  uint32_t val = x & ((1u << n_bits) - 1);
  x = x >> n_bits;
  if (x < kRansL) {
    x = (x << 32) | next_word(pptr, end);
  }
  *r = x;
  return val;
}

struct RansSymbol {
  uint16_t start;
  uint16_t range;  // 0 marks a bypass chunk (value stored in start)
  bool bypass;
};

// Accumulates symbols forward; encoding happens in reverse at flush time so
// the decoder consumes them in forward order (rANS is LIFO).
struct BufferedEncoder {
  std::vector<RansSymbol> syms;

  void push(const int32_t* symbols, const int32_t* indexes, int n,
            const int32_t* cdfs, int cdf_stride, const int32_t* cdf_lengths,
            const int32_t* offsets) {
    syms.reserve(syms.size() + static_cast<size_t>(n));
    for (int i = 0; i < n; ++i) {
      const int32_t idx = indexes[i];
      const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
      const int32_t max_value = cdf_lengths[idx] - 2;
      int32_t value = symbols[i] - offsets[idx];

      uint32_t raw_val = 0;
      if (value < 0) {
        raw_val = -2 * value - 1;
        value = max_value;
      } else if (value >= max_value) {
        raw_val = 2 * (value - max_value);
        value = max_value;
      }

      syms.push_back({static_cast<uint16_t>(cdf[value]),
                      static_cast<uint16_t>(cdf[value + 1] - cdf[value]),
                      false});

      if (value == max_value) {
        // Escape: emit raw_val in 4-bit chunks, preceded by the chunk count
        // in saturating 4-bit increments.
        // 64-bit shift: n_bypass*4 can reach 32 for extreme values, which is
        // UB on a 32-bit operand (and an infinite loop on x86).
        int32_t n_bypass = 0;
        while ((static_cast<uint64_t>(raw_val) >> (n_bypass * kBypassPrecision)) != 0) {
          ++n_bypass;
        }
        int32_t val = n_bypass;
        while (val >= static_cast<int32_t>(kMaxBypassVal)) {
          syms.push_back({static_cast<uint16_t>(kMaxBypassVal), 0, true});
          val -= kMaxBypassVal;
        }
        syms.push_back({static_cast<uint16_t>(val), 0, true});
        for (int32_t j = 0; j < n_bypass; ++j) {
          const uint16_t chunk =
              (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal;
          syms.push_back({chunk, 0, true});
        }
      }
    }
  }

  // Encodes all buffered symbols; returns number of bytes written to out.
  int flush(uint8_t* out, int64_t out_capacity) {
    Rans64State rans;
    rans_enc_init(&rans);

    std::vector<uint32_t> buf(syms.size() + 2, 0xCC);
    uint32_t* ptr = buf.data() + buf.size();

    for (auto it = syms.rbegin(); it != syms.rend(); ++it) {
      const RansSymbol& sym = *it;
      if (!sym.bypass) {
        rans_enc_put(&rans, &ptr, sym.start, sym.range, kProbBits);
      } else {
        rans_enc_put_bits(&rans, &ptr, sym.start, kBypassPrecision);
      }
    }
    rans_enc_flush(&rans, &ptr);

    const int64_t nbytes =
        (buf.data() + buf.size() - ptr) * static_cast<int64_t>(sizeof(uint32_t));
    if (nbytes > out_capacity) return -1;
    std::memcpy(out, ptr, static_cast<size_t>(nbytes));
    syms.clear();
    return static_cast<int>(nbytes);
  }
};

struct StreamDecoder {
  std::vector<uint8_t> stream;
  const uint32_t* ptr = nullptr;
  const uint32_t* end = nullptr;
  Rans64State rans = 0;

  void set_stream(const uint8_t* data, int64_t n) {
    stream.assign(data, data + n);
    // Stream is word-aligned by construction (encoder emits uint32 words).
    ptr = reinterpret_cast<const uint32_t*>(stream.data());
    end = ptr + (n / static_cast<int64_t>(sizeof(uint32_t)));
    rans_dec_init(&rans, &ptr, end);
  }

  void decode(const int32_t* indexes, int n, const int32_t* cdfs,
              int cdf_stride, const int32_t* cdf_lengths,
              const int32_t* offsets, int32_t* out) {
    for (int i = 0; i < n; ++i) {
      const int32_t idx = indexes[i];
      const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
      const int32_t max_value = cdf_lengths[idx] - 2;
      const int32_t offset = offsets[idx];

      const uint32_t cum_freq = rans_dec_get(&rans, kProbBits);

      // Linear scan for the bucket; CDF rows are short (<< 100 entries).
      int32_t s = 0;
      const int32_t cdf_len = cdf_lengths[idx];
      while (s < cdf_len - 1 &&
             static_cast<uint32_t>(cdf[s + 1]) <= cum_freq) {
        ++s;
      }

      rans_dec_advance(&rans, &ptr, end, cdf[s], cdf[s + 1] - cdf[s],
                       kProbBits);

      int32_t value = s;
      if (value == max_value) {
        // Bypass-decode the raw value.
        int32_t val = rans_dec_get_bits(&rans, &ptr, end, kBypassPrecision);
        int32_t n_bypass = val;
        while (val == static_cast<int32_t>(kMaxBypassVal)) {
          val = rans_dec_get_bits(&rans, &ptr, end, kBypassPrecision);
          n_bypass += val;
        }
        uint32_t raw_val = 0;
        for (int32_t j = 0; j < n_bypass && j * kBypassPrecision < 32; ++j) {
          val = rans_dec_get_bits(&rans, &ptr, end, kBypassPrecision);
          raw_val |= static_cast<uint32_t>(val) << (j * kBypassPrecision);
        }
        value = static_cast<int32_t>(raw_val >> 1);
        if (raw_val & 1) {
          value = -value - 1;
        } else {
          value += max_value;
        }
      }
      out[i] = value + offset;
    }
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// pmf -> quantized CDF (deterministic mass-stealing; ryg_rans-derived scheme,
// identical semantics to CompressAI's _CXX.pmf_to_quantized_cdf so tables and
// therefore bitstreams match at equal float pmfs).
// pmf: n floats (the last entry is the tail mass bin). cdf_out: n+1 uint32.
// ---------------------------------------------------------------------------
int pmf_to_quantized_cdf(const float* pmf, int n, int precision,
                         uint32_t* cdf_out) {
  if (n <= 0 || precision <= 0 || precision > 24) return -1;
  std::vector<uint32_t> cdf(static_cast<size_t>(n) + 1);
  cdf[0] = 0;
  for (int i = 0; i < n; ++i) {
    const float p = pmf[i];
    if (!(p >= 0.f) || p != p) return -2;  // negative or NaN
    cdf[i + 1] =
        static_cast<uint32_t>(std::lround(p * static_cast<float>(1 << precision)));
  }

  uint64_t total = 0;
  for (int i = 0; i <= n; ++i) total += cdf[i];
  if (total == 0) return -3;

  for (int i = 0; i <= n; ++i) {
    cdf[i] = static_cast<uint32_t>(
        ((static_cast<uint64_t>(1) << precision) * cdf[i]) / total);
  }
  for (int i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = 1u << precision;

  for (int i = 0; i < n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      // Steal frequency from the lowest-frequency symbol with freq > 1.
      uint32_t best_freq = ~0u;
      int best_steal = -1;
      for (int j = 0; j < n; ++j) {
        const uint32_t freq = cdf[j + 1] - cdf[j];
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best_steal = j;
        }
      }
      if (best_steal == -1) return -4;
      if (best_steal < i) {
        for (int j = best_steal + 1; j <= i; ++j) cdf[j]--;
      } else {
        for (int j = i + 1; j <= best_steal; ++j) cdf[j]++;
      }
    }
  }

  std::memcpy(cdf_out, cdf.data(), (static_cast<size_t>(n) + 1) * sizeof(uint32_t));
  return 0;
}

// --------------------------- one-shot interfaces ---------------------------

int rans_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                             int n, const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths, const int32_t* offsets,
                             uint8_t* out, int64_t out_capacity) {
  BufferedEncoder enc;
  enc.push(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths, offsets);
  return enc.flush(out, out_capacity);
}

int rans_decode_with_indexes(const uint8_t* stream, int64_t nbytes,
                             const int32_t* indexes, int n, const int32_t* cdfs,
                             int cdf_stride, const int32_t* cdf_lengths,
                             const int32_t* offsets, int32_t* out) {
  StreamDecoder dec;
  dec.set_stream(stream, nbytes);
  dec.decode(indexes, n, cdfs, cdf_stride, cdf_lengths, offsets, out);
  return 0;
}

// --------------------------- stateful interfaces ---------------------------
// Buffered encoder: accumulate per-slice symbol batches (the channel-AR
// models call this once per slice: reference tcm.py:527-565), then flush one
// stream.

void* rans_encoder_new() { return new BufferedEncoder(); }

void rans_encoder_free(void* h) { delete static_cast<BufferedEncoder*>(h); }

void rans_encoder_push(void* h, const int32_t* symbols, const int32_t* indexes,
                       int n, const int32_t* cdfs, int cdf_stride,
                       const int32_t* cdf_lengths, const int32_t* offsets) {
  static_cast<BufferedEncoder*>(h)->push(symbols, indexes, n, cdfs, cdf_stride,
                                         cdf_lengths, offsets);
}

int rans_encoder_flush(void* h, uint8_t* out, int64_t out_capacity) {
  return static_cast<BufferedEncoder*>(h)->flush(out, out_capacity);
}

// Streaming decoder: set the stream once, then decode slice by slice while
// the model computes the next slice's (mu, sigma) on device
// (reference tcm.py:604-628).

void* rans_decoder_new() { return new StreamDecoder(); }

void rans_decoder_free(void* h) { delete static_cast<StreamDecoder*>(h); }

void rans_decoder_set_stream(void* h, const uint8_t* data, int64_t n) {
  static_cast<StreamDecoder*>(h)->set_stream(data, n);
}

void rans_decoder_decode_stream(void* h, const int32_t* indexes, int n,
                                const int32_t* cdfs, int cdf_stride,
                                const int32_t* cdf_lengths,
                                const int32_t* offsets, int32_t* out) {
  static_cast<StreamDecoder*>(h)->decode(indexes, n, cdfs, cdf_stride,
                                         cdf_lengths, offsets, out);
}

}  // extern "C"
