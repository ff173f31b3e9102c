// Minimal FLAC encoder for the ST-eval `use_audio_input` path: 16-bit mono
// streams, VERBATIM subframes (CONSTANT for silent blocks).  Produces fully
// spec-conformant FLAC files (sync codes, UTF-8 frame numbers, CRC-8 header
// and CRC-16 frame checksums) that any libsndfile/ffmpeg consumer — e.g. a
// fairseq install reading the flac.zip manifest — decodes bit-exactly.
//
// Replaces the reference's soundfile flac writes
// (lib/eval_scripts/prepare_custom_dataset.py:104-125) without a libsndfile
// dependency.  VERBATIM trades file size for zero-dependency correctness;
// segments are short (seconds), so zip size is not on any hot path.
//
// Format reference: https://xiph.org/flac/format.html

#include <cstdint>
#include <cstring>

namespace {

constexpr long kBlockSize = 4096;

inline void put_u16be(uint8_t* p, uint32_t v) {
  p[0] = (v >> 8) & 0xff;
  p[1] = v & 0xff;
}

inline void put_u24be(uint8_t* p, uint32_t v) {
  p[0] = (v >> 16) & 0xff;
  p[1] = (v >> 8) & 0xff;
  p[2] = v & 0xff;
}

uint8_t crc8(const uint8_t* data, long n) {
  // poly x^8 + x^2 + x + 1 (0x07), init 0
  uint8_t crc = 0;
  for (long i = 0; i < n; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? static_cast<uint8_t>((crc << 1) ^ 0x07)
                         : static_cast<uint8_t>(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* data, long n) {
  // poly x^16 + x^15 + x^2 + 1 (0x8005), init 0
  uint16_t crc = 0;
  for (long i = 0; i < n; ++i) {
    crc ^= static_cast<uint16_t>(data[i]) << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? static_cast<uint16_t>((crc << 1) ^ 0x8005)
                           : static_cast<uint16_t>(crc << 1);
  }
  return crc;
}

// FLAC's extended-UTF-8 coding of the frame number; returns bytes written.
int put_utf8(uint8_t* p, uint64_t v) {
  if (v < 0x80) {
    p[0] = static_cast<uint8_t>(v);
    return 1;
  }
  int n = 2;
  for (uint64_t lim = 0x800; v >= lim && n < 7; lim <<= 5) ++n;
  for (int i = n - 1; i > 0; --i) {
    p[i] = 0x80 | (v & 0x3f);
    v >>= 6;
  }
  p[0] = static_cast<uint8_t>((0xff << (8 - n)) & 0xff) |
         static_cast<uint8_t>(v);
  return n;
}

}  // namespace

extern "C" {

// Upper bound on the encoded size for n samples (Python sizes its buffer
// with this before calling w2v_encode_flac).
long w2v_flac_bound(long n) {
  const long frames = n / kBlockSize + 1;
  return 42 + frames * 24 + n * 2;
}

// Encode n 16-bit mono samples at sample_rate into out (capacity out_cap).
// Returns bytes written, or -1 if the buffer is too small.
long w2v_encode_flac(const int16_t* samples, long n, int sample_rate,
                     uint8_t* out, long out_cap) {
  if (out_cap < w2v_flac_bound(n)) return -1;
  uint8_t* p = out;

  // stream marker + STREAMINFO (last-metadata flag set, type 0, length 34)
  std::memcpy(p, "fLaC", 4);
  p += 4;
  p[0] = 0x80;  // last-metadata-block | STREAMINFO
  put_u24be(p + 1, 34);
  p += 4;
  uint8_t* si = p;
  std::memset(si, 0, 34);
  put_u16be(si + 0, kBlockSize);  // min blocksize
  put_u16be(si + 2, kBlockSize);  // max blocksize (last frame may be short)
  // min/max framesize: 0 = unknown
  // 20 bits sample rate | 3 bits channels-1 | 5 bits bps-1 | 36 bits total
  const uint64_t total = static_cast<uint64_t>(n);
  si[10] = (sample_rate >> 12) & 0xff;
  si[11] = (sample_rate >> 4) & 0xff;
  si[12] = static_cast<uint8_t>(((sample_rate & 0xf) << 4) | (0 /*ch-1*/ << 1) |
                                ((15 /*bps-1*/ >> 4) & 0x1));
  si[13] = static_cast<uint8_t>(((15 & 0xf) << 4) |
                                ((total >> 32) & 0xf));
  si[14] = (total >> 24) & 0xff;
  si[15] = (total >> 16) & 0xff;
  si[16] = (total >> 8) & 0xff;
  si[17] = total & 0xff;
  // bytes 18..33: MD5 of unencoded audio; 0 = unknown (legal)
  p += 34;

  uint64_t frame_idx = 0;
  for (long pos = 0; pos < n || (n == 0 && frame_idx == 0);
       pos += kBlockSize, ++frame_idx) {
    const long bs = (n - pos < kBlockSize) ? (n - pos) : kBlockSize;
    if (bs <= 0) break;
    uint8_t* fstart = p;
    // header: sync(14) 0 blocking(0) | blocksize code 0111 (16-bit follows)
    // | sample-rate code 0000 (STREAMINFO) | channel 0000 | size 100 | 0
    p[0] = 0xff;
    p[1] = 0xf8;  // sync end, reserved 0, fixed blocking
    p[2] = 0x70;  // 0111 0000
    p[3] = 0x08;  // 0000 100 0
    p += 4;
    p += put_utf8(p, frame_idx);
    put_u16be(p, static_cast<uint32_t>(bs - 1));
    p += 2;
    const uint8_t c8 = crc8(fstart, p - fstart);
    *p++ = c8;

    // one mono subframe, byte-aligned throughout for 16-bit samples
    bool constant = true;
    for (long i = 1; i < bs && constant; ++i)
      constant = samples[pos + i] == samples[pos];
    if (constant) {
      *p++ = 0x00;  // CONSTANT (type 000000), no wasted bits
      put_u16be(p, static_cast<uint16_t>(samples[pos]));
      p += 2;
    } else {
      *p++ = 0x02;  // VERBATIM (type 000001), no wasted bits
      for (long i = 0; i < bs; ++i) {
        put_u16be(p, static_cast<uint16_t>(samples[pos + i]));
        p += 2;
      }
    }
    const uint16_t c16 = crc16(fstart, p - fstart);
    put_u16be(p, c16);
    p += 2;
  }
  return static_cast<long>(p - out);
}

}  // extern "C"
