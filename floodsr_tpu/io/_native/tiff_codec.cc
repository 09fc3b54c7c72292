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
//
// Table entries reference ALREADY-DECODED output (libtiff-style): every LZW
// table string equals a previously-emitted string plus one byte, and decode
// emissions are back-to-back, so entry `next_code` created between two
// emissions is exactly the contiguous dst range [prev_emit_start,
// prev_emit_start + prev_len + 1). Emission is then a forward copy from dst
// into dst (sequential reads, no prefix-chain walking). Entries recorded
// before a Clear keep valid offsets but are never referenced again.
long long fsr_lzw_decode(const unsigned char* src, long long src_len,
                         unsigned char* dst, long long dst_cap) {
  long long off[4096];
  int len[4096];

  int next_code = kFirst;
  int width = 9;
  long long out_pos = 0;
  int prev_code = -1;
  long long prev_start = 0;
  int prev_len = 0;

  // Rolling MSB-first bit buffer.
  uint64_t bitbuf = 0;
  int bits = 0;
  long long in_pos = 0;

  for (;;) {
    while (bits < width && in_pos < src_len) {
      bitbuf = (bitbuf << 8) | src[in_pos++];
      bits += 8;
    }
    if (bits < width) break;  // stream exhausted without EOI
    bits -= width;
    const int code = static_cast<int>(bitbuf >> bits) & ((1 << width) - 1);

    if (code == kEoi) break;
    if (code == kClear) {
      next_code = kFirst;
      width = 9;
      prev_code = -1;
      continue;
    }

    const long long emit_start = out_pos;
    if (prev_code < 0) {
      if (code >= 256) return -1;
      if (out_pos >= dst_cap) return -2;
      dst[out_pos++] = static_cast<unsigned char>(code);
    } else {
      // Record the new entry FIRST: its bytes are prev emission + the first
      // byte of this emission, contiguous at prev_start. For the KwKwK case
      // (code == next_code) the entry's final byte is produced by this very
      // copy, which the forward byte loop handles.
      const bool have_entry = next_code < 4096;
      if (have_entry) {
        off[next_code] = prev_start;
        len[next_code] = prev_len + 1;
      }
      if (code < 256) {
        if (out_pos >= dst_cap) return -2;
        dst[out_pos++] = static_cast<unsigned char>(code);
      } else if (code < next_code + (have_entry ? 1 : 0) && code >= kFirst) {
        const long long src_off = off[code];
        const int n = len[code];
        if (out_pos + n > dst_cap) return -2;
        if (src_off + n <= out_pos) {
          std::memcpy(dst + out_pos, dst + src_off, static_cast<size_t>(n));
        } else {
          for (int k = 0; k < n; ++k) dst[out_pos + k] = dst[src_off + k];
        }
        out_pos += n;
      } else {
        return -1;  // corrupt: code beyond the table
      }
      if (have_entry) ++next_code;
    }
    prev_code = code;
    prev_start = emit_start;
    prev_len = static_cast<int>(out_pos - emit_start);
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
    // Endgame early-change: the decoder adds its deferred entry on this
    // final code (reaching next_code) and widens when that is 2^width - 1;
    // EOI must follow at the new width (mirrors the Python twin).
    if (next_code == (1 << width) - 1 && width < 12) ++width;
    if (!emit(kEoi, width)) return -2;
  }
  if (bitcnt > 0) {
    if (out_pos >= dst_cap) return -2;
    dst[out_pos++] = static_cast<unsigned char>((bitbuf << (8 - bitcnt)) & 0xFF);
  }
  return out_pos;
}

}  // extern "C"
