// Native SLOW5/BLOW5 signal codec: zig-zag delta + StreamVByte (svb-zd)
// and zlib record compression, single-pass C++ replacing the numpy
// implementation in ../slow5.py for large-scale export (the reference
// delegates this work to pyslow5's C core; this library is the equivalent
// native component for the TPU build).
//
// Build: g++ -O3 -march=native -shared -fPIC slow5_codec.cc -o libslow5codec.so -lz

#include <cmath>
#include <cstdint>
#include <cstring>
#include <zlib.h>

extern "C" {

// Upper bound for the svb-zd encoding of n int16 samples.
size_t svb_zd_max_size(size_t n) { return (n + 3) / 4 + n * 4; }

// Encode int16 signal -> zig-zag deltas -> StreamVByte.
// out must have room for svb_zd_max_size(n) bytes. Returns bytes written.
size_t svb_zd_encode(const int16_t* sig, size_t n, uint8_t* out) {
  if (n == 0) return 0;
  size_t n_ctrl = (n + 3) / 4;
  uint8_t* ctrl = out;
  uint8_t* data = out + n_ctrl;
  std::memset(ctrl, 0, n_ctrl);

  int32_t prev = 0;
  for (size_t i = 0; i < n; ++i) {
    int32_t d = (int32_t)sig[i] - prev;
    prev = sig[i];
    uint32_t zz = ((uint32_t)d << 1) ^ (uint32_t)(d >> 31);
    unsigned code;
    if (zz < (1u << 8)) code = 0;
    else if (zz < (1u << 16)) code = 1;
    else if (zz < (1u << 24)) code = 2;
    else code = 3;
    ctrl[i >> 2] |= code << ((i & 3) * 2);
    for (unsigned b = 0; b <= code; ++b) {
      *data++ = (uint8_t)(zz & 0xFF);
      zz >>= 8;
    }
  }
  return (size_t)(data - out);
}

// Decode svb-zd back to int16. Returns samples decoded (== n on success).
size_t svb_zd_decode(const uint8_t* in, size_t n_bytes, size_t n,
                     int16_t* out) {
  if (n == 0) return 0;
  size_t n_ctrl = (n + 3) / 4;
  if (n_bytes < n_ctrl) return 0;
  const uint8_t* ctrl = in;
  const uint8_t* data = in + n_ctrl;
  const uint8_t* end = in + n_bytes;
  int32_t acc = 0;
  for (size_t i = 0; i < n; ++i) {
    unsigned code = (ctrl[i >> 2] >> ((i & 3) * 2)) & 3;
    if (data + code + 1 > end) return i;
    uint32_t zz = 0;
    for (unsigned b = 0; b <= code; ++b) zz |= (uint32_t)(*data++) << (8 * b);
    int32_t d = (int32_t)(zz >> 1) ^ -(int32_t)(zz & 1);
    acc += d;
    out[i] = (int16_t)acc;
  }
  return n;
}

// ---------------------------------------------------------------------------
// D2H wire-format decoders (runtime/wire.py fallbacks replicate these in
// numpy; byte-for-byte parity is asserted by tests/test_wire.py). The wire
// formats themselves are documented in runtime/predict.py.

// Delta tiers (8/12 bit): narrow first-differences + exact int16 exception
// residuals -> (B, T) int16 signal. `stream` is (B, T) int8 raw deltas for
// bits=8, or (B, 3*T/2) uint8 little-endian 12-bit fields biased by 2048
// for bits=12 (see runtime/predict._pack_wire). Exception slots hold
// (position, residual); unused slots are (0, 0) so an unconditional add is
// exact. Accumulation is int32 (the signal fits int16 by wire contract);
// the final cast wraps like numpy's astype(int16).
void delta_wire_unpack(const uint8_t* stream, const uint8_t* exc_pos,
                       const int16_t* exc_val, size_t B, size_t T, size_t E,
                       int bits, int16_t* out) {
  // Dense per-row residual scratch; exc positions are uint8 (< 256).
  int32_t corr[256];
  std::memset(corr, 0, sizeof(corr));
  for (size_t r = 0; r < B; ++r) {
    const uint8_t* ep = exc_pos + r * E;
    const int16_t* ev = exc_val + r * E;
    for (size_t e = 0; e < E; ++e) corr[ep[e]] += (int32_t)ev[e];
    int32_t acc = 0;
    int16_t* o = out + r * T;
    if (bits == 8) {
      const int8_t* s = (const int8_t*)stream + r * T;
      for (size_t t = 0; t < T; ++t) {
        acc += (int32_t)s[t] + corr[t];
        o[t] = (int16_t)acc;
      }
    } else {  // 12-bit: 3 bytes -> two values, biased by 2048
      const uint8_t* s = stream + r * (3 * T / 2);
      for (size_t t = 0; t < T; t += 2) {
        uint32_t b0 = s[0], b1 = s[1], b2 = s[2];
        s += 3;
        acc += (int32_t)(b0 | ((b1 & 0xF) << 8)) - 2048 + corr[t];
        o[t] = (int16_t)acc;
        acc += (int32_t)((b1 >> 4) | (b2 << 4)) - 2048 + corr[t + 1];
        o[t + 1] = (int16_t)acc;
      }
    }
    for (size_t e = 0; e < E; ++e) corr[ep[e]] = 0;  // cheap per-row reset
  }
}

// Event tier: per-event sufficient statistics + 4-bit within-event deltas
// -> digitised int16 samples, front-compacted per row into flat_out with
// per-row counts. Gaussian noise (if any) is supplied by the caller in
// `gauss` (threefry bits drawn host-side, runtime/wire.EventWireDecoder).
// noise_mode: 0 = none, 1 = static sigma, 2 = per-event sampled sigma.
// Float math mirrors the numpy fallback operation-for-operation (same f32
// order) so outputs are bit-identical. Returns total samples written.
size_t event_wire_decode(const uint8_t* stream,   // (B, T/2) packed nibbles
                         const int16_t* levels,   // (B, K+1)
                         const uint8_t* sigma_q,  // (B, K)
                         const uint8_t* ends,     // (B, K) non-decreasing
                         const uint8_t* exc_pos,  // (B, E)
                         const int16_t* exc_val,  // (B, E)
                         const float* gauss,      // (B, T) or NULL
                         const int32_t* read_idx, // (B,)
                         size_t B, size_t T, size_t K, size_t E,
                         int noise_mode, float sigma_scale, float sigma_tail,
                         float static_sigma, float offset_mean,
                         int16_t* flat_out, int32_t* counts) {
  size_t pos = 0;
  for (size_t r = 0; r < B; ++r) {
    const uint8_t* s = stream + r * (T / 2);
    const int16_t* lv = levels + r * (K + 1);
    const uint8_t* sq = sigma_q + r * K;
    const uint8_t* en = ends + r * K;
    const float* g = gauss ? gauss + r * T : nullptr;
    const bool row_live = read_idx[r] >= 0;

    int32_t corr[256];  // exc positions are uint8; caller enforces T <= 256
    std::memset(corr, 0, sizeof(corr));
    {
      const uint8_t* ep = exc_pos + r * E;
      const int16_t* ev = exc_val + r * E;
      for (size_t e = 0; e < E; ++e) corr[ep[e]] += (int32_t)ev[e];
    }

    size_t seg = 0;      // current segment id = #ends <= t
    int32_t C = 0;       // running cumsum of deltas
    int32_t Cstart = 0;  // cumsum at the current segment's start frame
    int32_t n_keep = 0;
    for (size_t t = 0; t < T; ++t) {
      while (seg < K && (size_t)en[seg] <= t) ++seg;
      // A segment's start frame is its predecessor's end (0 for seg 0);
      // ends are non-decreasing and t advances by 1, so a segment change
      // lands exactly on t == ends[seg-1] == start frame.
      const bool is_start = (seg == 0) ? (t == 0) : ((size_t)en[seg - 1] == t);
      int32_t nib = (t & 1) ? (s[t >> 1] >> 4) : (s[t >> 1] & 0xF);
      int32_t d = is_start ? 0 : (nib - 8 + corr[t]);
      C += d;
      if (is_start) Cstart = C;
      int32_t clean = (int32_t)lv[seg] + C - Cstart;
      float out_f;
      if (noise_mode == 0) {
        out_f = clean > 0 ? (float)clean : 0.0f;
      } else {
        float sigma = (noise_mode == 2)
                          ? (seg < K ? (float)sq[seg] * sigma_scale
                                     : sigma_tail)
                          : static_sigma;
        float noisy = g[t] * sigma;
        noisy += (float)clean;
        out_f = clean > 0 ? noisy : 0.0f;
        if (out_f < 0.0f) out_f = 0.0f;
      }
      if (out_f != 0.0f && row_live) {
        // nearbyintf under the default FE_TONEAREST = round-half-to-even,
        // matching np.rint and the device digitisation.
        flat_out[pos++] =
            (int16_t)(int32_t)std::nearbyintf(out_f - offset_mean);
        ++n_keep;
      }
    }
    counts[r] = n_keep;
  }
  return pos;
}

// zlib compress (deflate, zlib wrapper). Returns compressed size or 0.
size_t zlib_compress_buf(const uint8_t* in, size_t n, uint8_t* out,
                         size_t cap, int level) {
  uLongf out_len = (uLongf)cap;
  if (compress2(out, &out_len, in, (uLong)n, level) != Z_OK) return 0;
  return (size_t)out_len;
}

size_t zlib_compress_bound(size_t n) { return (size_t)compressBound((uLong)n); }

}  // extern "C"
