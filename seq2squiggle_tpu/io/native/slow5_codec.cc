// Native SLOW5/BLOW5 signal codec: zig-zag delta + StreamVByte (svb-zd)
// and zlib record compression, single-pass C++ replacing the numpy
// implementation in ../slow5.py for large-scale export (the reference
// delegates this work to pyslow5's C core; this library is the equivalent
// native component for the TPU build).
//
// Build: g++ -O3 -march=native -shared -fPIC slow5_codec.cc -o libslow5codec.so -lz

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

// zlib compress (deflate, zlib wrapper). Returns compressed size or 0.
size_t zlib_compress_buf(const uint8_t* in, size_t n, uint8_t* out,
                         size_t cap, int level) {
  uLongf out_len = (uLongf)cap;
  if (compress2(out, &out_len, in, (uLong)n, level) != Z_OK) return 0;
  return (size_t)out_len;
}

size_t zlib_compress_bound(size_t n) { return (size_t)compressBound((uLong)n); }

}  // extern "C"
