// Native EXR scanline-block decoder for the dataset-conversion hot path.
//
// The Python fallback (learned_hologram_gan_tpu/data/exr.py) walks scanline
// blocks with per-line numpy slicing and python-level zlib calls; converting
// the MIT-CGH-4K corpus that way is CPU-bound.  This translation unit decodes
// *all* blocks of a single-part scanline EXR body in one C call:
//
//   - inflate (zlib) for ZIP/ZIPS payloads, raw passthrough otherwise
//   - the EXR post-deflate reorder: delta-decode then de-interleave halves
//   - scatter each channel's scanlines (HALF/FLOAT/UINT) into a dense
//     float32 (num_channels, height, width) output, channels in file order
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).  The
// Python side parses the header (cheap) and hands this function the raw file
// bytes plus the offset table.
//
// Build: tools/build_native.sh  ->  native/libexr_decode.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

// IEEE half -> float (scalar; the image's halves are few MB at most).
static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      uint32_t m = mant;
      do {
        ++e;
        m <<= 1;
      } while ((m & 0x400) == 0);
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3ff) << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (mant << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof f);
  return f;
}

// EXR ZIP post-inflate reorder: predictor decode, then de-interleave.
static void unpredict_interleave(std::vector<uint8_t>& buf,
                                 std::vector<uint8_t>& tmp) {
  const size_t n = buf.size();
  uint8_t* d = buf.data();
  int prev = d[0];
  for (size_t i = 1; i < n; ++i) {
    prev = (prev + (int)d[i] - 128) & 0xff;
    d[i] = (uint8_t)prev;
  }
  tmp.resize(n);
  const size_t half = (n + 1) / 2;
  const uint8_t* s1 = d;
  const uint8_t* s2 = d + half;
  uint8_t* o = tmp.data();
  for (size_t i = 0; i < half; ++i) {
    o[2 * i] = s1[i];
    if (2 * i + 1 < n) o[2 * i + 1] = s2[i];
  }
  buf.swap(tmp);
}

}  // namespace

extern "C" {

// Decode every scanline block of a single-part scanline EXR.
//
//  file, file_len : the whole file's bytes
//  offsets        : num_blocks chunk offsets (from the EXR offset table)
//  num_blocks     : number of scanline blocks
//  block_lines    : scanlines per block (1 for NONE/ZIPS, 16 for ZIP)
//  compressed     : 0 = NONE, 1 = ZIP/ZIPS (zlib)
//  y_min, height, width
//  num_channels   : channels in file order
//  pixel_types    : per channel, 0 = UINT, 1 = HALF, 2 = FLOAT
//  out            : float32 [num_channels, height, width]
//
// Returns 0 on success, negative error codes otherwise.
int exr_decode_blocks(const uint8_t* file, int64_t file_len,
                      const uint64_t* offsets, int32_t num_blocks,
                      int32_t block_lines, int32_t compressed, int32_t y_min,
                      int32_t height, int32_t width, int32_t num_channels,
                      const int32_t* pixel_types, float* out) {
  std::vector<size_t> ch_bytes(num_channels);
  size_t line_pitch = 0;
  for (int c = 0; c < num_channels; ++c) {
    const size_t elem =
        pixel_types[c] == 1 ? 2 : 4;  // HALF = 2 bytes, UINT/FLOAT = 4
    ch_bytes[c] = elem * (size_t)width;
    line_pitch += ch_bytes[c];
  }

  std::vector<uint8_t> inflated;
  std::vector<uint8_t> tmp;

  for (int b = 0; b < num_blocks; ++b) {
    const uint64_t off = offsets[b];
    if (off + 8 > (uint64_t)file_len) return -1;
    int32_t y, size;
    std::memcpy(&y, file + off, 4);
    std::memcpy(&size, file + off + 4, 4);
    if (off + 8 + (uint64_t)size > (uint64_t)file_len) return -2;
    const uint8_t* payload = file + off + 8;

    const int lines_here =
        std::min<int>(block_lines, y_min + height - y);
    const size_t expect = line_pitch * (size_t)lines_here;

    const uint8_t* data = payload;
    if (compressed && (size_t)size < expect) {
      inflated.resize(expect);
      uLongf dest_len = (uLongf)expect;
      if (uncompress(inflated.data(), &dest_len, payload, (uLong)size) != Z_OK ||
          dest_len != expect)
        return -3;
      unpredict_interleave(inflated, tmp);
      data = inflated.data();
    } else if ((size_t)size != expect) {
      return -4;
    }

    size_t pos = 0;
    for (int line = 0; line < lines_here; ++line) {
      const int row = y - y_min + line;
      for (int c = 0; c < num_channels; ++c) {
        float* dst = out + ((size_t)c * height + row) * (size_t)width;
        const uint8_t* src = data + pos;
        if (pixel_types[c] == 1) {  // HALF
          const uint16_t* h = (const uint16_t*)src;
          for (int x = 0; x < width; ++x) dst[x] = half_to_float(h[x]);
        } else if (pixel_types[c] == 2) {  // FLOAT
          std::memcpy(dst, src, 4 * (size_t)width);
        } else {  // UINT
          const uint32_t* u = (const uint32_t*)src;
          for (int x = 0; x < width; ++x) dst[x] = (float)u[x];
        }
        pos += ch_bytes[c];
      }
    }
  }
  return 0;
}

}  // extern "C"
