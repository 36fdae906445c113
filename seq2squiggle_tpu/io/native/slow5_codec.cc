// Native SLOW5/BLOW5 signal codec: zig-zag delta + StreamVByte (svb-zd)
// and zlib record compression, single-pass C++ replacing the numpy
// implementation in ../slow5.py for large-scale export (the reference
// delegates this work to pyslow5's C core; this library is the equivalent
// native component for the TPU build).
//
// Build: g++ -O3 -march=native -shared -fPIC slow5_codec.cc -o libslow5codec.so -lz

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

// zstd record compression for the batch encoder: compiled in only when
// the build found zstd headers + library (build.py tries -DS2S_HAVE_ZSTD
// -lzstd first and retries without on failure). Callers must check
// blow5_have_zstd() before requesting method 3.
#ifdef S2S_HAVE_ZSTD
#include <zstd.h>
#endif

// The ULP-tier decode walk is split into a scalar integer symbol pass and
// an explicit 16-lane AVX-512 f32 pass (bf16 expand, noise multiply-add,
// digitise, vpcompressw front-compaction) when the toolchain/host support
// it; the monolithic scalar loop remains as the portable fallback and the
// differential-test oracle (tests/test_wire.py pins both against numpy).
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__) \
    && defined(__AVX512VBMI2__)
#include <immintrin.h>
#define S2S_ULP_SIMD 1
#endif

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

// Rounded digitised sample -> int16 with the shared boundary contract
// (runtime/wire.saturate_i16): NaN -> 0, +/-inf and out-of-range clamp to
// the int16 edges. Replaces the old (int16_t)(int32_t)nearbyintf(...) cast,
// which was undefined behavior on NaN/huge inputs from a corrupted wire
// buffer.
static inline int16_t saturate_i16(float v) {
  if (!(v == v)) return 0;  // NaN
  if (v >= 32767.0f) return 32767;
  if (v <= -32768.0f) return -32768;
  return (int16_t)(int32_t)v;
}

// Event tier: per-event sufficient statistics + 4-bit within-event deltas
// -> digitised int16 samples, front-compacted per row into flat_out with
// per-row counts. Gaussian noise (if any) is supplied by the caller in
// `gauss` (threefry bits drawn host-side, runtime/wire.EventWireDecoder).
// noise_mode: 0 = none, 1 = static sigma, 2 = per-event sampled sigma.
// Float math mirrors the numpy fallback operation-for-operation (same f32
// order) so outputs are bit-identical; fp-contract is pinned off so gcc
// cannot fuse g*sigma + clean into an FMA with different rounding.
// Returns total samples written.
__attribute__((optimize("-ffp-contract=off")))
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
        flat_out[pos++] = saturate_i16(std::nearbyintf(out_f - offset_mean));
        ++n_keep;
      }
    }
    counts[r] = n_keep;
  }
  return pos;
}

// ---- split ULP decode, pass 1: serial integer symbol walk ------------
// Rebuilds one row's bf16 bit ordinals (and, for sampled noise, the
// per-frame sigma fill) from the 2-bit symbol stream. First decodes the
// row's event levels from the anchor + i8 deltas (-128 = zero level,
// -127 = escape: exact u16 from the batch-flat lvl_esc buffer), then
// iterates SEGMENTS instead of re-deriving the segment id per frame:
// segment k spans [en[k-1], en[k]) (0 / T at the edges), its start frame
// takes lv[k] verbatim (consuming a possible escape, as the packer's
// stream order demands), and in-segment frames accumulate deltas. The
// flat-buffer cursors (ei nibbles, wi wide slots, li level escapes)
// persist ACROSS rows — rows consume the buffers strictly in row-major
// order, which is how the per-row offsets dropped off the wire. Returns
// false on a buffer bounds violation (device overflow -> caller
// recomputes the batch raw).
// 2-bit symbol -> int8 delta LUT, one byte's 4 symbols packed into a u32
// (symbol 0 -> 0, 1 -> +1, 2 -> -1, 3 -> escape sentinel -128 — a value
// an inline delta can never take, so the patch scan below is exact).
static uint32_t g_sym_lut[256];
static bool g_sym_lut_ready = false;

static void sym_lut_init() {
  for (int b = 0; b < 256; ++b) {
    uint32_t v = 0;
    for (int j = 0; j < 4; ++j) {
      const int sym = (b >> (2 * j)) & 3;
      const int8_t d = (sym == 3) ? (int8_t)-128
                                  : (int8_t)((sym == 1) - (sym == 2));
      v |= ((uint32_t)(uint8_t)d) << (8 * j);
    }
    g_sym_lut[b] = v;
  }
  g_sym_lut_ready = true;  // idempotent; a racing re-init writes same values
}

static bool ulp_row_rebuild(const uint8_t* s, uint16_t lvl0,
                            const int8_t* lvl_d, const uint8_t* en,
                            const uint8_t* sq, const uint8_t* esc,
                            size_t esc_end, const uint8_t* wide_bytes,
                            size_t wide_end, const uint16_t* lvl_esc,
                            size_t lvl_end, size_t T, size_t K, size_t* ei_io,
                            size_t* wi_io, size_t* li_io, uint16_t* ord,
                            float* sigma_f, float sigma_scale_pa,
                            float sigma_tail_pa) {
  if (K > 256) return false;
  uint16_t lv[257];
  {
    size_t li = *li_io;
    lv[0] = lvl0;
    int32_t prev = (lvl0 != 0) ? (int32_t)lvl0 : 0;
    for (size_t e = 1; e <= K; ++e) {
      const int32_t d8 = (int32_t)lvl_d[e - 1];
      int32_t v;
      if (d8 == -128) {
        v = 0;
      } else if (d8 == -127) {
        if (li >= lvl_end) return false;
        v = (int32_t)lvl_esc[li++];
      } else {
        v = prev + d8;
      }
      lv[e] = (uint16_t)v;
      if (v != 0) prev = v;
    }
    *li_io = li;
  }
  size_t ei = *ei_io, wi = *wi_io;
  if (!g_sym_lut_ready) sym_lut_init();
  // Pass 1a: branch-free LUT expansion of the whole row's symbols to int8
  // deltas, then patch the rare escapes (~10/row Poisson) in frame order —
  // cursor order on the flat side buffers is part of the wire contract.
  // This replaces the old per-frame shift/mask/branch walk (the decode
  // thread's hottest serial loop at 303 batches x 2048 rows x 250 frames).
  int8_t d8v[256 + 4];
  const size_t W = (T + 3) / 4;
  for (size_t i = 0; i < W; ++i) std::memcpy(d8v + 4 * i, &g_sym_lut[s[i]], 4);
  int32_t dv[256];
  for (size_t t = 0; t < T; ++t) dv[t] = d8v[t];  // widen; auto-vectorizes
  for (size_t t = 0; t < T; ++t) {
    if (d8v[t] == -128) {
      if (ei >= esc_end) return false;
      const uint8_t nb =
          (ei & 1) ? (esc[ei >> 1] >> 4) : (esc[ei >> 1] & 0xF);
      ++ei;
      if (nb == 8) {  // wide-jump marker
        // wi is a BYTE offset into the global buffer (a shard's slot
        // span starts at shard*B_s bytes, not 4-byte aligned there).
        if (wi >= wide_end) return false;
        std::memcpy(&dv[t], wide_bytes + wi, 4);
        wi += 4;
      } else {
        dv[t] = (int32_t)nb - 8;
      }
    }
  }
  // Pass 1b: per-segment cumsum; the start frame takes lv[seg] verbatim
  // (its delta was still expanded above, so escape consumption matches
  // the packer's stream order exactly).
  size_t start = 0;
  for (size_t seg = 0; seg <= K; ++seg) {
    size_t end = (seg < K) ? (size_t)en[seg] : T;
    if (end > T) end = T;
    if (end < start) end = start;  // defensive: ends are non-decreasing
    if (sigma_f) {
      const float sv = (seg < K) ? (float)sq[seg] * sigma_scale_pa
                                 : sigma_tail_pa;
      for (size_t t = start; t < end; ++t) sigma_f[t] = sv;
    }
    if (start < end) {
      int32_t cur = (int32_t)lv[seg];
      ord[start] = (uint16_t)cur;
      for (size_t t = start + 1; t < end; ++t) {
        cur += dv[t];
        ord[t] = (uint16_t)cur;
      }
    }
    start = end;
  }
  *ei_io = ei;
  *wi_io = wi;
  return true;
}

#ifdef S2S_ULP_SIMD
// ---- split ULP decode, pass 2: 16-lane f32 pipeline ------------------
// ord bits -> f32 -> x scale -> (+ noise, clamp) -> digitise -> saturate
// -> vpcompressw front-compaction. Bit-parity notes vs the scalar path:
//   * mul+add instead of FMA (the scalar path pins fp-contract off);
//   * maxps(0, pn) == `if (pn < 0) pn = 0` including NaN (maxps returns
//     src2 on NaN) and -0.0 (returns src2 on equal);
//   * _CMP_NEQ_UQ == scalar `!=` (true for NaN);
//   * clamp-to-[int16]-then-cvtps_epi32 (round-half-even) == nearbyintf-
//     then-saturate for every finite value; NaN lanes are masked to 0,
//     matching saturate_i16.
// ord/sigma_f come from 16-lane-padded stack buffers (over-read safe);
// the gauss row is loaded with a tail mask.
static size_t ulp_row_f32_simd(const uint16_t* ord, const float* sigma_f,
                               const float* g, size_t T, int noise_mode,
                               float static_sigma, float scale_s, float dig,
                               float rng, float offset_mean, int16_t* out) {
  const __m512 vzero = _mm512_setzero_ps();
  const __m512 vscale = _mm512_set1_ps(scale_s);
  const __m512 vdig = _mm512_set1_ps(dig);
  const __m512 vrng = _mm512_set1_ps(rng);
  const __m512 voff = _mm512_set1_ps(offset_mean);
  const __m512 vlo = _mm512_set1_ps(-32768.0f);
  const __m512 vhi = _mm512_set1_ps(32767.0f);
  const __m512 vsig = _mm512_set1_ps(static_sigma);
  size_t pos = 0;
  for (size_t t = 0; t < T; t += 16) {
    const __mmask16 lanes = (T - t >= 16)
                                ? (__mmask16)0xFFFF
                                : (__mmask16)((1u << (T - t)) - 1);
    const __m256i o16 = _mm256_loadu_si256((const __m256i*)(ord + t));
    const __m512i o32 = _mm512_cvtepu16_epi32(o16);
    const __m512 p = _mm512_mul_ps(
        _mm512_castsi512_ps(_mm512_slli_epi32(o32, 16)), vscale);
    __m512 pn;
    if (noise_mode == 0) {
      pn = p;
    } else {
      const __m512 gv = _mm512_maskz_loadu_ps(lanes, g + t);
      const __m512 sv =
          (noise_mode == 1) ? vsig : _mm512_loadu_ps(sigma_f + t);
      const __mmask16 nz = _mm512_cmp_ps_mask(p, vzero, _CMP_NEQ_UQ);
      pn = _mm512_mask_add_ps(p, nz, p, _mm512_mul_ps(gv, sv));
      pn = _mm512_max_ps(vzero, pn);
    }
    const __mmask16 keep =
        _mm512_mask_cmp_ps_mask(lanes, pn, vzero, _CMP_NEQ_UQ);
    const __m512 x = _mm512_sub_ps(
        _mm512_div_ps(_mm512_mul_ps(pn, vdig), vrng), voff);
    const __mmask16 notnan = _mm512_cmp_ps_mask(x, x, _CMP_ORD_Q);
    const __m512 xc = _mm512_min_ps(vhi, _mm512_max_ps(vlo, x));
    const __m512i vi = _mm512_maskz_cvtps_epi32(notnan, xc);
    const __m256i v16 = _mm512_cvtsepi32_epi16(vi);
    _mm256_mask_compressstoreu_epi16(out + pos, keep, v16);
    pos += (size_t)__builtin_popcount((unsigned)keep);
  }
  return pos;
}
#endif  // S2S_ULP_SIMD

// ---- split ULP decode, pass 2: portable scalar fallback --------------
// The float chain, operation for operation, of the numpy oracle
// (runtime/wire.EventWireDecoder._decode_ulp); fp-contract pinned off so
// gcc cannot fuse p + g*sigma into an FMA with different rounding.
__attribute__((optimize("-ffp-contract=off")))
static size_t ulp_row_f32_scalar(const uint16_t* ord, const float* sigma_f,
                                 const float* g, size_t T, int noise_mode,
                                 float static_sigma, float scale_s, float dig,
                                 float rng, float offset_mean, int16_t* out) {
  size_t pos = 0;
  for (size_t t = 0; t < T; ++t) {
    const uint32_t ub = ((uint32_t)ord[t]) << 16;
    float f;
    std::memcpy(&f, &ub, 4);
    const float p = f * scale_s;  // exact bf16 pred -> pA
    float pn;
    if (noise_mode == 0) {
      pn = p;
    } else {
      const float sigma = (noise_mode == 1) ? static_sigma : sigma_f[t];
      pn = (p != 0.0f) ? p + g[t] * sigma : p;
      if (pn < 0.0f) pn = 0.0f;
    }
    if (pn != 0.0f) {
      out[pos++] =
          saturate_i16(std::nearbyintf((pn * dig) / rng - offset_mean));
    }
  }
  return pos;
}

// ULP event tier (wire_bits=2): bf16 event levels + 2-bit ULP deltas ->
// digitised int16 samples, front-compacted with per-row counts. The stream
// carries four 2-bit symbols per byte (0=+0, 1=+1 ULP, 2=-1 ULP,
// 3=escape); escapes consume 4-bit nibbles from the BATCH-FLAT `esc`
// buffer (nibble value 8 marks a wide jump whose exact i32 value sits in
// the batch-flat `wide` byte buffer); event levels decode from a u16
// anchor + i8 deltas with escapes in the batch-flat `lvl_esc` buffer.
// No per-row offsets exist on the wire: rows consume each flat buffer
// strictly in row-major order, so the decoder's running cursors ARE the
// offsets, resetting at shard boundaries (under device data-parallelism
// the flat buffers are per-shard: B_s rows, cap_esc_s nibbles /
// cap_wide_s i32 slots / cap_lvl_s u16 slots each). The rebuilt ordinal
// IS the bf16 bit pattern of the decoder output, so this replays the
// device's digitisation chain on exact values (see
// runtime/predict._pack_event_wire_ulp). Returns total samples written,
// or SIZE_MAX if a cursor leaves its shard's buffer (device overflow ->
// caller recomputes the batch raw).
size_t ulp_event_wire_decode(
    const uint8_t* stream,    // (B, ceil(T/4)) packed 2-bit symbols
    const uint16_t* lvl0,     // (B,) raw bf16 bits of event 0
    const int8_t* lvl_d,      // (B, K) level deltas / markers
    const uint8_t* sigma_q,   // (B, K) quarter-ADC-count stdevs
    const uint8_t* ends,      // (B, K) non-decreasing boundaries
    const uint8_t* esc,       // batch-flat packed 4-bit escape deltas
    const uint16_t* lvl_esc,  // batch-flat escaped levels (u16)
    const uint8_t* wide,      // batch-flat wide-jump i32 slots (bytes)
    const float* gauss,       // (B, T) or NULL
    const int32_t* read_idx,  // (B,)
    size_t B, size_t T, size_t K, size_t B_s, size_t cap_esc_s,
    size_t cap_wide_s, size_t cap_lvl_s, int noise_mode,
    float sigma_scale_pa, float sigma_tail_pa, float static_sigma,
    float scale_s, float dig, float rng, float offset_mean,
    int16_t* flat_out, int32_t* counts) {
  const size_t W = (T + 3) / 4;
  if (T > 256) return (size_t)-1;  // caller enforces T <= 255
  size_t pos = 0;
  uint16_t ord_buf[256 + 16];  // 16-lane over-read padding
  float sigma_buf[256 + 16];
  size_t ei = 0, wi = 0, li = 0;  // running flat-buffer cursors
  size_t esc_end = 0, wide_end = 0, lvl_end = 0;
  for (size_t r = 0; r < B; ++r) {
    if (r % B_s == 0) {  // shard boundary: rebase the cursors
      const size_t shard = r / B_s;
      ei = shard * cap_esc_s;
      esc_end = ei + cap_esc_s;
      wi = shard * B_s;  // byte offset of the shard's wide slots
      wide_end = wi + cap_wide_s * 4;
      li = shard * cap_lvl_s;
      lvl_end = li + cap_lvl_s;
    }
    const bool ok = ulp_row_rebuild(
        stream + r * W, lvl0[r], lvl_d + r * K, ends + r * K,
        sigma_q + r * K, esc, esc_end, wide, wide_end, lvl_esc, lvl_end, T,
        K, &ei, &wi, &li, ord_buf,
        noise_mode == 2 ? sigma_buf : nullptr, sigma_scale_pa,
        sigma_tail_pa);
    if (!ok) return (size_t)-1;
    if (read_idx[r] < 0) {  // padding row: nothing exported
      counts[r] = 0;
      continue;
    }
    const float* g = gauss ? gauss + r * T : nullptr;
#ifdef S2S_ULP_SIMD
    const size_t n =
        ulp_row_f32_simd(ord_buf, sigma_buf, g, T, noise_mode, static_sigma,
                         scale_s, dig, rng, offset_mean, flat_out + pos);
#else
    const size_t n =
        ulp_row_f32_scalar(ord_buf, sigma_buf, g, T, noise_mode, static_sigma,
                           scale_s, dig, rng, offset_mean, flat_out + pos);
#endif
    counts[r] = (int32_t)n;
    pos += n;
  }
  return pos;
}

// ---------------------------------------------------------------------------
// Threefry-2x32 standard-normal fill, replicating jax.random's key chain
// (sampling.py: fold_in(fold_in(fold_in(base, read_idx), chunk_off), 2)
// then normal(key, (T,))) so the host regenerates the event tier's noise
// without a JAX dispatch. Integer bits are bit-exact with jax.random.bits
// (asserted by tests/test_wire.py); the uniform->normal map uses the same
// single-precision erfinv polynomial XLA lowers to, so values agree with
// jax.random.normal to float rounding (<= 1 ULP observed).

static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}

// One Threefry-2x32-20 block: (x0, x1) under key (k0, k1).
static inline void threefry2x32(uint32_t k0, uint32_t k1, uint32_t& x0,
                                uint32_t& x1) {
  const uint32_t k2 = k0 ^ k1 ^ 0x1BD11BDAu;
  static const int R0[4] = {13, 15, 26, 6};
  static const int R1[4] = {17, 29, 16, 24};
  x0 += k0;
  x1 += k1;
  const uint32_t ks[3] = {k0, k1, k2};
  for (int g = 0; g < 5; ++g) {
    const int* R = (g % 2 == 0) ? R0 : R1;
    for (int i = 0; i < 4; ++i) {
      x0 += x1;
      x1 = rotl32(x1, R[i]);
      x1 ^= x0;
    }
    x0 += ks[(g + 1) % 3];
    x1 += ks[(g + 2) % 3] + (uint32_t)(g + 1);
  }
}

// jax.random.fold_in: new key = threefry2x32(key, [hi(data)=0, lo(data)]).
static inline void fold_in(uint32_t k0, uint32_t k1, uint32_t data,
                           uint32_t& o0, uint32_t& o1) {
  uint32_t x0 = 0, x1 = data;
  threefry2x32(k0, k1, x0, x1);
  o0 = x0;
  o1 = x1;
}

// XLA's single-precision erfinv (9-term Giles polynomial).
static inline float erfinv_f32(float x) {
  float w = -std::log1p(-x * x);
  float p;
  if (w < 5.0f) {
    w -= 2.5f;
    p = 2.81022636e-08f;
    p = 3.43273939e-07f + p * w;
    p = -3.5233877e-06f + p * w;
    p = -4.39150654e-06f + p * w;
    p = 0.00021858087f + p * w;
    p = -0.00125372503f + p * w;
    p = -0.00417768164f + p * w;
    p = 0.246640727f + p * w;
    p = 1.50140941f + p * w;
  } else {
    w = std::sqrt(w) - 3.0f;
    p = -0.000200214257f;
    p = 0.000100950558f + p * w;
    p = 0.00134934322f + p * w;
    p = -0.00367342844f + p * w;
    p = 0.00573950773f + p * w;
    p = -0.0076224613f + p * w;
    p = 0.00943887047f + p * w;
    p = 1.00167406f + p * w;
    p = 2.83297682f + p * w;
  }
  return p * x;
}

// bits -> uniform in [lo, 1) -> normal, exactly jax.random.normal's chain:
// f = bitcast(bits >> 9 | 0x3f800000) - 1  in [0, 1)
// u = max(lo, f * (1 - lo) + lo)           with lo = nextafter(-1, 0)
// n = sqrt(2) * erfinv(u)
static inline float bits_to_normal(uint32_t bits) {
  union {
    uint32_t u;
    float f;
  } cvt;
  cvt.u = (bits >> 9) | 0x3f800000u;
  const float f = cvt.f - 1.0f;
  const float lo = -0.99999994f;  // nextafterf(-1, 0)
  float u = f * (1.0f - lo) + lo;
  if (u < lo) u = lo;
  return 1.4142135f * erfinv_f32(u);
}

// Vector-friendly natural log for x in (0, 2]: exponent/mantissa split +
// atanh series (log m = 2*atanh((m-1)/(m+1)); |s| <= 0.172 so four terms
// reach float precision). Relative error ~1e-7 — noise values agree with
// jax.random.normal to ~1e-5 absolute, far inside the event tier's
// 1-ADC-count contract. All elementwise int/float ops, so gcc
// auto-vectorizes it inside the blocked loop below (libm logf would not).
static inline float vec_logf(float x) {
  uint32_t xi;
  std::memcpy(&xi, &x, 4);  // memcpy bitcasts optimize out and vectorize
  // Branchless split x = m * 2^e with m in [sqrt(0.5), sqrt(2)): bias the
  // exponent cut at sqrt(0.5) (0x3F3504F3) instead of 1.0 (control flow
  // here would block SIMD if-conversion of the caller's loop).
  const int e = ((int)(xi - 0x3F3504F3u)) >> 23;
  xi -= (uint32_t)e << 23;
  float m;
  std::memcpy(&m, &xi, 4);
  const float s = (m - 1.0f) / (m + 1.0f);
  const float t = s * s;
  const float p = 1.0f + t * (0.33333333f + t * (0.2f + t * 0.14285714f));
  return 2.0f * s * p + (float)e * 0.69314718f;
}

// Explicit 16-lane vector types (one AVX-512 zmm register each). All
// arithmetic below is elementwise, so the whole block — threefry rounds,
// uniform map, log, and the erfinv polynomial — stays in registers with
// no lane inserts or stack round trips.
typedef uint32_t v16u __attribute__((vector_size(64)));
typedef int32_t v16i __attribute__((vector_size(64)));
typedef float v16f __attribute__((vector_size(64)));

static inline v16f vbitcast_f(v16u x) {
  v16f r;
  std::memcpy(&r, &x, sizeof(r));
  return r;
}

static inline v16u vbitcast_u(v16f x) {
  v16u r;
  std::memcpy(&r, &x, sizeof(r));
  return r;
}

// vec_logf, 16 lanes at a time (same operations, same rounding).
static inline v16f vlog_v16(v16f x) {
  v16u xi = vbitcast_u(x);
  const v16i e = (v16i)(xi - 0x3F3504F3u) >> 23;
  xi -= (v16u)(e << 23);
  const v16f m = vbitcast_f(xi);
  const v16f s = (m - 1.0f) / (m + 1.0f);
  const v16f t = s * s;
  const v16f p = 1.0f + t * (0.33333333f + t * (0.2f + t * 0.14285714f));
  return 2.0f * s * p + __builtin_convertvector(e, v16f) * 0.69314718f;
}

// Fill (B, T) float32 with the per-chunk standard normals of
// runtime/wire.EventWireDecoder. Key chain per row r:
//   k = fold_in(fold_in(fold_in(base, read_idx[r]), chunk_off[r]), 2)
// then T draws via jax's PARTITIONABLE bits layout (the default since
// jax 0.4.x: _threefry_random_bits_partitionable): the i-th 32-bit word
// is o0 ^ o1 of threefry2x32(key, hi(i)=0, lo(i)=i).
//
// The counter loop runs in explicit 16-lane vector registers end to end;
// only w and u spill (for the rare w >= 5 scalar fixup, ~2 draws in 10k).
// One 16-lane block of standard normals for counters [base, base+16) under
// key (k0, k1) — the vector body shared by threefry_normal_fill and the
// fused ULP decode (ulp_event_wire_decode_fused). The rare w >= 5 far-tail
// fixup (|u| > ~0.9998, ~2 draws in 10k) is applied to all 16 lanes.
static inline v16f threefry_normal16(uint32_t k0, uint32_t k1,
                                     const uint32_t* ks, uint32_t base) {
  constexpr size_t L = 16;
  static const int R0[4] = {13, 15, 26, 6};
  static const int R1[4] = {17, 29, 16, 24};
  const v16u IOTA = {0, 1, 2,  3,  4,  5,  6,  7,
                     8, 9, 10, 11, 12, 13, 14, 15};
  v16u v0 = IOTA ^ IOTA;  // zero vector
  v0 += k0;
  v16u v1 = IOTA + (base + k1);
  for (int g = 0; g < 5; ++g) {
    const int* R = (g % 2 == 0) ? R0 : R1;
    for (int i = 0; i < 4; ++i) {
      v0 += v1;
      v1 = (v1 << R[i]) | (v1 >> (32 - R[i]));
      v1 ^= v0;
    }
    v0 += ks[(g + 1) % 3];
    v1 += ks[(g + 2) % 3] + (uint32_t)(g + 1);
  }
  const v16u bits = ((v0 ^ v1) >> 9) | 0x3F800000u;
  const float lo = -0.99999994f;  // nextafterf(-1, 0)
  const v16f f = vbitcast_f(bits) - 1.0f;
  v16f u = f * (1.0f - lo) + lo;
  u = (u < lo) ? (f * 0.0f + lo) : u;  // lanewise select
  const v16f w = -vlog_v16(1.0f - u * u);
  const v16f wp = w - 2.5f;
  v16f p = wp * 0.0f + 2.81022636e-08f;
  p = 3.43273939e-07f + p * wp;
  p = -3.5233877e-06f + p * wp;
  p = -4.39150654e-06f + p * wp;
  p = 0.00021858087f + p * wp;
  p = -0.00125372503f + p * wp;
  p = -0.00417768164f + p * wp;
  p = 0.246640727f + p * wp;
  p = 1.50140941f + p * wp;
  v16f res = 1.4142135f * p * u;
  // Far-tail check: one mask compare on AVX-512, else a compare spill.
#ifdef S2S_ULP_SIMD
  __m512 wv;
  std::memcpy(&wv, &w, sizeof(wv));
  const bool any =
      _mm512_cmp_ps_mask(wv, _mm512_set1_ps(5.0f), _CMP_GE_OQ) != 0;
#else
  const v16i big = w >= 5.0f;
  int any_i = 0;
  for (size_t j = 0; j < L; ++j) any_i |= big[j];
  const bool any = any_i != 0;
#endif
  if (any) {
    float wt[L], ut[L], rt[L];
    std::memcpy(wt, &w, sizeof(wt));
    std::memcpy(ut, &u, sizeof(ut));
    std::memcpy(rt, &res, sizeof(rt));
    for (size_t j = 0; j < L; ++j) {
      if (wt[j] >= 5.0f) {
        float ws = std::sqrt(wt[j]) - 3.0f;
        float q = -0.000200214257f;
        q = 0.000100950558f + q * ws;
        q = 0.00134934322f + q * ws;
        q = -0.00367342844f + q * ws;
        q = 0.00573950773f + q * ws;
        q = -0.0076224613f + q * ws;
        q = 0.00943887047f + q * ws;
        q = 1.00167406f + q * ws;
        q = 2.83297682f + q * ws;
        rt[j] = 1.4142135f * q * ut[j];
      }
    }
    std::memcpy(&res, rt, sizeof(rt));
  }
  return res;
}

// Per-row fill: T draws under one folded key (threefry_normal16 blocks;
// surplus tail-lane draws are not stored).
static inline void threefry_row_fill(uint32_t k0, uint32_t k1,
                                     const uint32_t* ks, size_t T,
                                     float* o) {
  constexpr size_t L = 16;
  for (size_t base = 0; base < T; base += L) {
    const size_t n = (T - base < L) ? (T - base) : L;
    const v16f res = threefry_normal16(k0, k1, ks, (uint32_t)base);
    float rt[L];
    std::memcpy(rt, &res, sizeof(rt));
    for (size_t j = 0; j < n; ++j) o[base + j] = rt[j];
  }
}

void threefry_normal_fill(uint32_t base_k0, uint32_t base_k1,
                          const int32_t* read_idx, const int32_t* chunk_off,
                          size_t B, size_t T, float* out) {
  for (size_t r = 0; r < B; ++r) {
    uint32_t k0, k1;
    fold_in(base_k0, base_k1, (uint32_t)read_idx[r], k0, k1);
    fold_in(k0, k1, (uint32_t)chunk_off[r], k0, k1);
    fold_in(k0, k1, 2u, k0, k1);
    const uint32_t k2 = k0 ^ k1 ^ 0x1BD11BDAu;
    const uint32_t ks[3] = {k0, k1, k2};
    threefry_row_fill(k0, k1, ks, T, out + r * T);
  }
}

#ifdef S2S_ULP_SIMD
// Fused ULP pass 2: identical float chain to ulp_row_f32_simd, but the
// threefry normals are generated in registers per 16-lane block instead of
// read from a precomputed (B, T) buffer — the buffer's write+read memory
// traffic and the separate fill pass disappear. Noise values are IDENTICAL
// to threefry_normal_fill's (same threefry_normal16 blocks).
static size_t ulp_row_f32_simd_keyed(const uint16_t* ord,
                                     const float* sigma_f, uint32_t k0,
                                     uint32_t k1, const uint32_t* ks,
                                     size_t T, int noise_mode,
                                     float static_sigma, float scale_s,
                                     float dig, float rng, float offset_mean,
                                     int16_t* out) {
  const __m512 vzero = _mm512_setzero_ps();
  const __m512 vscale = _mm512_set1_ps(scale_s);
  const __m512 vdig = _mm512_set1_ps(dig);
  const __m512 vrng = _mm512_set1_ps(rng);
  const __m512 voff = _mm512_set1_ps(offset_mean);
  const __m512 vlo = _mm512_set1_ps(-32768.0f);
  const __m512 vhi = _mm512_set1_ps(32767.0f);
  const __m512 vsig = _mm512_set1_ps(static_sigma);
  size_t pos = 0;
  for (size_t t = 0; t < T; t += 16) {
    const __mmask16 lanes = (T - t >= 16)
                                ? (__mmask16)0xFFFF
                                : (__mmask16)((1u << (T - t)) - 1);
    const __m256i o16 = _mm256_loadu_si256((const __m256i*)(ord + t));
    const __m512i o32 = _mm512_cvtepu16_epi32(o16);
    const __m512 p = _mm512_mul_ps(
        _mm512_castsi512_ps(_mm512_slli_epi32(o32, 16)), vscale);
    __m512 pn;
    if (noise_mode == 0) {
      pn = p;
    } else {
      const v16f gr = threefry_normal16(k0, k1, ks, (uint32_t)t);
      __m512 gv;
      std::memcpy(&gv, &gr, sizeof(gv));
      const __m512 sv =
          (noise_mode == 1) ? vsig : _mm512_loadu_ps(sigma_f + t);
      const __mmask16 nz = _mm512_cmp_ps_mask(p, vzero, _CMP_NEQ_UQ);
      pn = _mm512_mask_add_ps(p, nz, p, _mm512_mul_ps(gv, sv));
      pn = _mm512_max_ps(vzero, pn);
    }
    const __mmask16 keep =
        _mm512_mask_cmp_ps_mask(lanes, pn, vzero, _CMP_NEQ_UQ);
    const __m512 x = _mm512_sub_ps(
        _mm512_div_ps(_mm512_mul_ps(pn, vdig), vrng), voff);
    const __mmask16 notnan = _mm512_cmp_ps_mask(x, x, _CMP_ORD_Q);
    const __m512 xc = _mm512_min_ps(vhi, _mm512_max_ps(vlo, x));
    const __m512i vi = _mm512_maskz_cvtps_epi32(notnan, xc);
    const __m256i v16 = _mm512_cvtsepi32_epi16(vi);
    _mm256_mask_compressstoreu_epi16(out + pos, keep, v16);
    pos += (size_t)__builtin_popcount((unsigned)keep);
  }
  return pos;
}
#endif  // S2S_ULP_SIMD

// ULP decode with FUSED noise regeneration: same wire semantics as
// ulp_event_wire_decode, but instead of a caller-supplied gauss buffer it
// takes the base threefry key words + per-row chunk offsets and draws each
// row's normals inside the f32 pass (in registers on AVX-512 hosts, via a
// stack row buffer otherwise). This is the production path of
// runtime/wire.EventWireDecoder when the native library is present.
size_t ulp_event_wire_decode_fused(
    const uint8_t* stream, const uint16_t* lvl0, const int8_t* lvl_d,
    const uint8_t* sigma_q, const uint8_t* ends, const uint8_t* esc,
    const uint16_t* lvl_esc, const uint8_t* wide, uint32_t base_k0,
    uint32_t base_k1, const int32_t* chunk_off, const int32_t* read_idx,
    size_t B, size_t T, size_t K, size_t B_s, size_t cap_esc_s,
    size_t cap_wide_s, size_t cap_lvl_s, int noise_mode,
    float sigma_scale_pa, float sigma_tail_pa, float static_sigma,
    float scale_s, float dig, float rng, float offset_mean,
    int16_t* flat_out, int32_t* counts) {
  const size_t W = (T + 3) / 4;
  if (T > 256) return (size_t)-1;  // caller enforces T <= 255
  size_t pos = 0;
  uint16_t ord_buf[256 + 16];
  float sigma_buf[256 + 16];
#ifndef S2S_ULP_SIMD
  float g_buf[256 + 16];
#endif
  size_t ei = 0, wi = 0, li = 0;  // running flat-buffer cursors
  size_t esc_end = 0, wide_end = 0, lvl_end = 0;
  for (size_t r = 0; r < B; ++r) {
    if (r % B_s == 0) {  // shard boundary: rebase the cursors
      const size_t shard = r / B_s;
      ei = shard * cap_esc_s;
      esc_end = ei + cap_esc_s;
      wi = shard * B_s;  // byte offset of the shard's wide slots
      wide_end = wi + cap_wide_s * 4;
      li = shard * cap_lvl_s;
      lvl_end = li + cap_lvl_s;
    }
    const bool ok = ulp_row_rebuild(
        stream + r * W, lvl0[r], lvl_d + r * K, ends + r * K,
        sigma_q + r * K, esc, esc_end, wide, wide_end, lvl_esc, lvl_end, T,
        K, &ei, &wi, &li, ord_buf,
        noise_mode == 2 ? sigma_buf : nullptr, sigma_scale_pa,
        sigma_tail_pa);
    if (!ok) return (size_t)-1;
    if (read_idx[r] < 0) {
      counts[r] = 0;
      continue;
    }
    uint32_t k0 = 0, k1 = 0;
    uint32_t ks[3] = {0, 0, 0};
    if (noise_mode != 0) {
      fold_in(base_k0, base_k1, (uint32_t)read_idx[r], k0, k1);
      fold_in(k0, k1, (uint32_t)chunk_off[r], k0, k1);
      fold_in(k0, k1, 2u, k0, k1);
      ks[0] = k0;
      ks[1] = k1;
      ks[2] = k0 ^ k1 ^ 0x1BD11BDAu;
    }
#ifdef S2S_ULP_SIMD
    const size_t n = ulp_row_f32_simd_keyed(
        ord_buf, sigma_buf, k0, k1, ks, T, noise_mode, static_sigma, scale_s,
        dig, rng, offset_mean, flat_out + pos);
#else
    if (noise_mode != 0) threefry_row_fill(k0, k1, ks, T, g_buf);
    const size_t n =
        ulp_row_f32_scalar(ord_buf, sigma_buf, g_buf, T, noise_mode,
                           static_sigma, scale_s, dig, rng, offset_mean,
                           flat_out + pos);
#endif
    counts[r] = (int32_t)n;
    pos += n;
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

int blow5_have_zstd() {
#ifdef S2S_HAVE_ZSTD
  return 1;
#else
  return 0;
#endif
}

// ---------------------------------------------------------------------------
// Whole-flush BLOW5 record encoder: assemble + svb-zd + compress + frame
// every record of a flush in ONE native call, replacing the per-record
// Python loop in io/slow5.py (struct.pack + ctypes svb call + zstd call
// per record — measured ~1.2 s of host CPU per 10k-read bench flush
// cycle, dominated by Python/ctypes churn rather than compression).
// Record layout and field semantics are identical to _encode_record /
// _press_record in io/slow5.py (the parity oracle — byte-for-byte for
// zlib/none, decoded-equal for zstd where frame params may differ):
//   u16 rid_len; rid; u32 read_group=0; f64 digitisation, offset, range,
//   sampling_rate; u64 len_raw_signal (blob BYTE length under svb-zd,
//   sample count otherwise); signal blob (u64 sample count + svb-zd
//   stream) or raw int16; u64 chan_len; chan; f64 median_before;
//   i32 read_number; u8 start_mux=0; u64 start_time.
// Framing: u32 compressed record length before each record.
//
// signals: all reads' int16 samples concatenated; sample_off: (n+1) i64
// prefix offsets. rid_bytes/rid_off: same layout for the ASCII read ids.
// Per-read doubles/ints are parallel arrays; digitisation/range/rate and
// the channel string are per-file constants. record_press: 0=none,
// 1=zlib, 3=zstd; signal_press: 0=raw, 2=svb-zd. Returns total bytes
// written to out, or SIZE_MAX on any error (cap overflow, bad method,
// zstd requested without S2S_HAVE_ZSTD) — the caller falls back to the
// Python per-record path.
size_t blow5_encode_batch(
    const int16_t* signals, const int64_t* sample_off,
    const uint8_t* rid_bytes, const int64_t* rid_off,
    const double* offset_vals, const double* median_befores,
    const int32_t* read_numbers, const uint64_t* start_times,
    const uint8_t* chan, size_t chan_len, size_t n,
    double digitisation, double range_val, double sampling_rate,
    int record_press, int signal_press, int level,
    uint8_t* out, size_t out_cap) {
  if (record_press != 0 && record_press != 1 && record_press != 3)
    return (size_t)-1;
  if (signal_press != 0 && signal_press != 2) return (size_t)-1;
#ifndef S2S_HAVE_ZSTD
  if (record_press == 3) return (size_t)-1;
#endif

  // Per-record scratch for the uncompressed record, grown to the batch max.
  size_t rec_cap = 0;
  for (size_t i = 0; i < n; ++i) {
    const size_t nsig = (size_t)(sample_off[i + 1] - sample_off[i]);
    const size_t rid_len = (size_t)(rid_off[i + 1] - rid_off[i]);
    const size_t sig_bytes =
        (signal_press == 2) ? (16 + svb_zd_max_size(nsig)) : (8 + 2 * nsig);
    const size_t r = 2 + rid_len + 36 + sig_bytes + 8 + chan_len + 21;
    if (r > rec_cap) rec_cap = r;
  }
  uint8_t* rec = (uint8_t*)std::malloc(rec_cap ? rec_cap : 1);
  if (!rec) return (size_t)-1;

#ifdef S2S_HAVE_ZSTD
  ZSTD_CCtx* cctx = nullptr;
  if (record_press == 3) {
    cctx = ZSTD_createCCtx();
    if (!cctx) {
      std::free(rec);
      return (size_t)-1;
    }
  }
#endif

  size_t pos = 0;
  bool ok = true;
  for (size_t i = 0; i < n && ok; ++i) {
    const size_t nsig = (size_t)(sample_off[i + 1] - sample_off[i]);
    const size_t rid_len = (size_t)(rid_off[i + 1] - rid_off[i]);
    if (rid_len > 0xFFFF) {
      // Would truncate in the u16 length prefix: bail to the per-record
      // Python path, which raises via struct.pack('<H', ...).
      ok = false;
      break;
    }
    uint8_t* p = rec;
    const uint16_t rl16 = (uint16_t)rid_len;
    std::memcpy(p, &rl16, 2);
    p += 2;
    std::memcpy(p, rid_bytes + rid_off[i], rid_len);
    p += rid_len;
    const uint32_t rg = 0;
    std::memcpy(p, &rg, 4);
    p += 4;
    std::memcpy(p, &digitisation, 8);
    p += 8;
    std::memcpy(p, &offset_vals[i], 8);
    p += 8;
    std::memcpy(p, &range_val, 8);
    p += 8;
    std::memcpy(p, &sampling_rate, 8);
    p += 8;
    const int16_t* sig = signals + sample_off[i];
    if (signal_press == 2) {
      // u64 blob_len; blob = u64 sample count + svb-zd stream
      uint8_t* blob_len_at = p;
      p += 8;
      const uint64_t cnt = (uint64_t)nsig;
      std::memcpy(p, &cnt, 8);
      p += 8;
      const size_t svb_n = svb_zd_encode(sig, nsig, p);
      p += svb_n;
      const uint64_t blob_len = 8 + (uint64_t)svb_n;
      std::memcpy(blob_len_at, &blob_len, 8);
    } else {
      const uint64_t cnt = (uint64_t)nsig;
      std::memcpy(p, &cnt, 8);
      p += 8;
      std::memcpy(p, sig, 2 * nsig);
      p += 2 * nsig;
    }
    const uint64_t cl = (uint64_t)chan_len;
    std::memcpy(p, &cl, 8);
    p += 8;
    std::memcpy(p, chan, chan_len);
    p += chan_len;
    std::memcpy(p, &median_befores[i], 8);
    p += 8;
    std::memcpy(p, &read_numbers[i], 4);
    p += 4;
    *p++ = 0;  // start_mux
    std::memcpy(p, &start_times[i], 8);
    p += 8;
    const size_t rec_n = (size_t)(p - rec);

    if (pos + 4 > out_cap) {
      ok = false;
      break;
    }
    uint8_t* dst = out + pos + 4;
    const size_t dst_cap = out_cap - pos - 4;
    size_t comp_n;
    if (record_press == 0) {
      if (rec_n > dst_cap) {
        ok = false;
        break;
      }
      std::memcpy(dst, rec, rec_n);
      comp_n = rec_n;
    } else if (record_press == 1) {
      uLongf out_len = (uLongf)dst_cap;
      if (compress2(dst, &out_len, rec, (uLong)rec_n, level) != Z_OK) {
        ok = false;
        break;
      }
      comp_n = (size_t)out_len;
    } else {
#ifdef S2S_HAVE_ZSTD
      const size_t zn =
          ZSTD_compressCCtx(cctx, dst, dst_cap, rec, rec_n, level);
      if (ZSTD_isError(zn)) {
        ok = false;
        break;
      }
      comp_n = zn;
#else
      ok = false;
      break;
#endif
    }
    const uint32_t frame = (uint32_t)comp_n;
    std::memcpy(out + pos, &frame, 4);
    pos += 4 + comp_n;
  }

#ifdef S2S_HAVE_ZSTD
  if (cctx) ZSTD_freeCCtx(cctx);
#endif
  std::free(rec);
  return ok ? pos : (size_t)-1;
}

}  // extern "C"
