// TIFF-variant LZW codec (MSB-first codes, early width change).
//
// Native fast path for floodsr-tpu raster I/O: the reference stack delegates
// this work to GDAL's C++ core via rasterio (reference:
// floodsr/preprocessing.py:247-282); this library plays that role here.
// Exposed through ctypes (floodsr_tpu/io/native.py); the pure-Python twin in
// floodsr_tpu/io/tiff.py is the behavioral reference.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kClear = 256;
constexpr int kEoi = 257;
constexpr int kFirst = 258;
constexpr int kMaxCode = 4094;  // encoder resets before table overflows

}  // namespace

extern "C" {

// Decode `src` into `dst` (capacity `dst_cap`). Returns bytes written or <0
// on error (-1 corrupt stream, -2 output overflow).
long long fsr_lzw_decode(const unsigned char* src, long long src_len,
                         unsigned char* dst, long long dst_cap) {
  // Table entries are (prefix_code, suffix_byte, length); strings are
  // materialized by walking prefixes backwards.
  std::vector<int> prefix(4096);
  std::vector<unsigned char> suffix(4096);
  std::vector<int> length(4096);
  for (int i = 0; i < 256; ++i) {
    prefix[i] = -1;
    suffix[i] = static_cast<unsigned char>(i);
    length[i] = 1;
  }
  int next_code = kFirst;
  int width = 9;

  long long out_pos = 0;
  long long bitpos = 0;
  const long long nbits = src_len * 8;
  int prev_code = -1;

  auto emit = [&](int code) -> long long {
    // Write the string for `code` at out_pos; returns its length or -2.
    const int len = length[code];
    if (out_pos + len > dst_cap) return -2;
    long long w = out_pos + len - 1;
    int c = code;
    while (c >= 0) {
      dst[w--] = suffix[c];
      c = prefix[c];
    }
    out_pos += len;
    return len;
  };

  while (bitpos + width <= nbits) {
    const long long byte_idx = bitpos >> 3;
    uint32_t chunk = 0;
    for (int k = 0; k < 4; ++k) {
      chunk <<= 8;
      if (byte_idx + k < src_len) chunk |= src[byte_idx + k];
    }
    const int shift = 32 - static_cast<int>(bitpos & 7) - width;
    const int code = (chunk >> shift) & ((1u << width) - 1u);
    bitpos += width;

    if (code == kEoi) break;
    if (code == kClear) {
      next_code = kFirst;
      width = 9;
      prev_code = -1;
      continue;
    }
    if (prev_code < 0) {
      if (code >= 256) return -1;
      if (emit(code) < 0) return -2;
      prev_code = code;
    } else if (code < next_code) {
      if (next_code < 4096) {
        prefix[next_code] = prev_code;
        // suffix = first byte of table[code]
        int c = code;
        while (prefix[c] >= 0) c = prefix[c];
        suffix[next_code] = suffix[c];
        length[next_code] = length[prev_code] + 1;
        ++next_code;
      }
      if (emit(code) < 0) return -2;
      prev_code = code;
    } else if (code == next_code && next_code < 4096) {
      // KwKwK case: entry = prev + prev[0]
      int c = prev_code;
      while (prefix[c] >= 0) c = prefix[c];
      prefix[next_code] = prev_code;
      suffix[next_code] = suffix[c];
      length[next_code] = length[prev_code] + 1;
      ++next_code;
      if (emit(code) < 0) return -2;
      prev_code = code;
    } else {
      return -1;
    }
    // TIFF early change (libtiff convention): widen at 2^width - 1 entries.
    if (next_code == (1 << width) - 1 && width < 12) ++width;
  }
  return out_pos;
}

long long fsr_lzw_encode_bound(long long src_len) {
  // Worst case ~1.5 bytes/input byte plus control codes; be generous.
  return src_len + (src_len >> 1) + 64;
}

// Encode `src` into `dst` (capacity `dst_cap`). Returns bytes written or <0.
long long fsr_lzw_encode(const unsigned char* src, long long src_len,
                         unsigned char* dst, long long dst_cap) {
  // Hash table keyed on (code << 8 | byte); open addressing.
  constexpr int kHashBits = 14;
  constexpr int kHashSize = 1 << kHashBits;
  std::vector<int> hash_key(kHashSize);
  std::vector<int16_t> hash_val(kHashSize);

  auto reset_table = [&]() {
    std::memset(hash_key.data(), 0xFF, kHashSize * sizeof(int));
  };

  uint64_t bitbuf = 0;
  int bitcnt = 0;
  long long out_pos = 0;
  auto emit = [&](int code, int width) -> bool {
    bitbuf = (bitbuf << width) | static_cast<unsigned>(code);
    bitcnt += width;
    while (bitcnt >= 8) {
      bitcnt -= 8;
      if (out_pos >= dst_cap) return false;
      dst[out_pos++] = static_cast<unsigned char>((bitbuf >> bitcnt) & 0xFF);
    }
    return true;
  };

  reset_table();
  int next_code = kFirst;
  int width = 9;
  if (!emit(kClear, width)) return -2;

  long long i = 0;
  if (src_len == 0) {
    if (!emit(kEoi, width)) return -2;
  } else {
    int w = src[i++];
    for (; i < src_len; ++i) {
      const int c = src[i];
      const int key = (w << 8) | c;
      // probe
      uint32_t h = (static_cast<uint32_t>(key) * 2654435761u) >> (32 - kHashBits);
      int found = -1;
      while (hash_key[h] != -1) {
        if (hash_key[h] == key) {
          found = hash_val[h];
          break;
        }
        h = (h + 1) & (kHashSize - 1);
      }
      if (found >= 0) {
        w = found;
        continue;
      }
      if (!emit(w, width)) return -2;
      hash_key[h] = key;
      hash_val[h] = static_cast<int16_t>(next_code);
      ++next_code;
      // Encoder is one entry ahead of the decoder; widen at 2^width.
      if (next_code == (1 << width) && width < 12) ++width;
      if (next_code == kMaxCode) {
        if (!emit(kClear, width)) return -2;
        reset_table();
        next_code = kFirst;
        width = 9;
      }
      w = c;
    }
    if (!emit(w, width)) return -2;
    if (!emit(kEoi, width)) return -2;
  }
  if (bitcnt > 0) {
    if (out_pos >= dst_cap) return -2;
    dst[out_pos++] = static_cast<unsigned char>((bitbuf << (8 - bitcnt)) & 0xFF);
  }
  return out_pos;
}

}  // extern "C"
