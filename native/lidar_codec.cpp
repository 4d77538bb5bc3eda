// LiDAR point-cloud codec — the laszip role of the reference data path.
//
// The reference stores LiDAR sweeps as .laz (laszip via laspy,
// data_agent.py:359-369; ~5x over raw, docs/engineering.md:62). This image
// ships no laszip, so the legacy exporter wrote raw .npy. This codec
// restores compressed storage natively: points are quantized to a fixed
// grid, delta-coded in scan order per axis, zigzag-mapped and LEB128
// varint-packed — scan-ordered sweeps delta to 1-2 bytes/axis vs 4-byte
// floats. C ABI for ctypes (no pybind11 in the image).
//
// Layout: [int64 n][float scale][3 x float offset][payload: for each axis
// x,y,z: n varints of zigzag(delta)].

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline uint32_t zigzag(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

inline int32_t unzigzag(uint32_t v) {
  return static_cast<int32_t>(v >> 1) ^ -static_cast<int32_t>(v & 1);
}

inline int64_t put_varint(uint8_t* out, int64_t cap, int64_t pos,
                          uint32_t v) {
  while (v >= 0x80) {
    if (pos >= cap) return -1;
    out[pos++] = static_cast<uint8_t>(v) | 0x80;
    v >>= 7;
  }
  if (pos >= cap) return -1;
  out[pos++] = static_cast<uint8_t>(v);
  return pos;
}

}  // namespace

extern "C" {

// Returns compressed byte count, or -1 if out_cap too small.
int64_t lzc_compress(const float* pts, int64_t n, float scale,
                     uint8_t* out, int64_t out_cap) {
  const int64_t header = 8 + 4 + 12;
  if (out_cap < header) return -1;
  float off[3] = {0.f, 0.f, 0.f};
  for (int a = 0; a < 3; ++a) {
    float m = n ? pts[a] : 0.f;
    for (int64_t i = 0; i < n; ++i) m = std::fmin(m, pts[3 * i + a]);
    off[a] = m;
  }
  std::memcpy(out, &n, 8);
  std::memcpy(out + 8, &scale, 4);
  std::memcpy(out + 12, off, 12);
  int64_t pos = header;
  const float inv = 1.0f / scale;
  for (int a = 0; a < 3; ++a) {
    int32_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
      int32_t q = static_cast<int32_t>(
          std::lround((pts[3 * i + a] - off[a]) * inv));
      pos = put_varint(out, out_cap, pos, zigzag(q - prev));
      if (pos < 0) return -1;
      prev = q;
    }
  }
  return pos;
}

// Returns point count, or -1 on malformed input / small buffer.
int64_t lzc_decompress(const uint8_t* in, int64_t in_len, float* out,
                       int64_t out_cap_pts) {
  const int64_t header = 8 + 4 + 12;
  if (in_len < header) return -1;
  int64_t n;
  float scale, off[3];
  std::memcpy(&n, in, 8);
  std::memcpy(&scale, in + 8, 4);
  std::memcpy(off, in + 12, 12);
  if (n < 0 || n > out_cap_pts) return -1;
  int64_t pos = header;
  for (int a = 0; a < 3; ++a) {
    int32_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
      uint32_t v = 0;
      int shift = 0;
      while (true) {
        if (pos >= in_len || shift > 28) return -1;
        uint8_t b = in[pos++];
        v |= static_cast<uint32_t>(b & 0x7f) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
      }
      prev += unzigzag(v);
      out[3 * i + a] = prev * scale + off[a];
    }
  }
  return n;
}

}  // extern "C"
