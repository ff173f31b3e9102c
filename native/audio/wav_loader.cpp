// libw2vaudio — native wav decoding with random-access window reads.
//
// Backs the framework's data loader (wav2vecsegmenter_tpu/data/audio.py) the
// way torchaudio's sox_io C++ backend backs the reference's
// (lib/dataset.py:248-250): header parse once, seek straight to the window,
// one memcpy-scale int16->float32 conversion.  Called from Python worker
// threads via ctypes — pure C ABI, no global state, releases the GIL for the
// duration of the read.

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct WavHeader {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;      // byte offset of data chunk payload
  uint32_t data_bytes = 0;
};

bool parse_header(FILE* f, WavHeader* h) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0)
    return false;
  if (std::fread(&riff_size, 4, 1, f) != 1) return false;
  if (std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4) != 0)
    return false;

  // walk chunks
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1)
      return false;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      unsigned char buf[16];
      if (size < 16 || std::fread(buf, 1, 16, f) != 16) return false;
      h->format = buf[0] | (buf[1] << 8);
      h->channels = buf[2] | (buf[3] << 8);
      std::memcpy(&h->sample_rate, buf + 4, 4);
      h->bits = buf[14] | (buf[15] << 8);
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
    } else if (std::memcmp(id, "data", 4) == 0) {
      h->data_offset = std::ftell(f);
      h->data_bytes = size;
      return h->format != 0;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

}  // namespace

extern "C" {

// returns 0 on success
int w2v_wav_info(const char* path, long* num_frames, int* sample_rate,
                 int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  WavHeader h;
  bool ok = parse_header(f, &h);
  std::fclose(f);
  if (!ok || h.bits == 0 || h.channels == 0) return 2;
  *num_frames = h.data_bytes / (h.bits / 8) / h.channels;
  *sample_rate = static_cast<int>(h.sample_rate);
  *channels = h.channels;
  return 0;
}

// Read num_frames mono float32 samples starting at frame offset; for
// multi-channel audio only the FIRST channel is kept (the reference takes
// waveform[0], lib/dataset.py:257).  Returns frames read, or -1 on error.
long w2v_read_window(const char* path, long offset, long num_frames,
                     float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavHeader h;
  if (!parse_header(f, &h)) {
    std::fclose(f);
    return -1;
  }
  const int bytes_per_sample = h.bits / 8;
  const long total = h.data_bytes / bytes_per_sample / h.channels;
  if (offset < 0) offset = 0;
  if (num_frames < 0 || offset + num_frames > total)
    num_frames = total - offset;
  if (num_frames <= 0) {
    std::fclose(f);
    return 0;
  }
  std::fseek(f, h.data_offset +
             offset * bytes_per_sample * h.channels, SEEK_SET);

  const long n_vals = num_frames * h.channels;
  long produced = 0;
  if (h.bits == 16 && h.format == 1) {
    static thread_local int16_t buf[1 << 16];
    long remaining = n_vals;
    long frame_pos = 0;
    const int ch = h.channels;
    while (remaining > 0) {
      long take = remaining < (1 << 16) ? remaining : (1 << 16);
      take -= take % ch;
      long got = static_cast<long>(std::fread(buf, 2, take, f));
      if (got <= 0) break;
      got -= got % ch;
      if (ch == 1) {
        for (long i = 0; i < got; ++i)
          out[frame_pos + i] = buf[i] * (1.0f / 32768.0f);
        frame_pos += got;
      } else {
        for (long i = 0; i < got; i += ch)
          out[frame_pos++] = buf[i] * (1.0f / 32768.0f);
      }
      remaining -= got;
    }
    produced = (ch == 1) ? frame_pos : frame_pos;
  } else {
    std::fclose(f);
    return -2;  // unsupported encoding; python fallback handles it
  }
  std::fclose(f);
  return produced;
}

}  // extern "C"
