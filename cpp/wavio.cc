// Native host-side audio IO for the input pipeline.
//
// The reference decodes audio per-utterance in Python via torchaudio
// (Predictor/data_handler/loader.py:5-17). Here the batch-assembly hot
// path — N wav files decoded, downmixed, normalised and written into a
// padded (B, S) float32 batch — runs as multithreaded C++ behind a ctypes
// boundary so the Python host loop never touches sample data.
//
// Supports canonical PCM16 RIFF/WAVE files (the AISHELL-1 format):
// header parsed manually (chunk walk), multi-channel downmixed by mean,
// samples scaled to [-1, 1) by 1/32768 (matching data/batching.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread wavio.cc -o libwavio.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t audio_format;
  uint16_t num_channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits_per_sample;
};
#pragma pack(pop)

// Returns samples written (after downmix), or negative error code.
//   -1 open failed, -2 bad header, -3 unsupported format
int read_one(const char* path, float* out, long max_samples, int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  RiffHeader rh;
  if (fread(&rh, sizeof(rh), 1, f) != 1 || memcmp(rh.riff, "RIFF", 4) ||
      memcmp(rh.wave, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  FmtChunk fmt{};
  bool have_fmt = false;
  long n_written = 0;
  ChunkHeader ch;
  while (fread(&ch, sizeof(ch), 1, f) == 1) {
    if (!memcmp(ch.id, "fmt ", 4)) {
      uint32_t to_read = ch.size < sizeof(fmt) ? ch.size : sizeof(fmt);
      if (fread(&fmt, to_read, 1, f) != 1) break;
      if (ch.size > to_read) fseek(f, ch.size - to_read, SEEK_CUR);
      have_fmt = true;
    } else if (!memcmp(ch.id, "data", 4)) {
      if (!have_fmt || fmt.bits_per_sample != 16 || fmt.audio_format != 1 ||
          fmt.num_channels == 0) {
        fclose(f);
        return -3;
      }
      if (sample_rate) *sample_rate = (int)fmt.sample_rate;
      const int nch = fmt.num_channels;
      long frames = (long)(ch.size / (2 * nch));
      if (frames > max_samples) frames = max_samples;
      std::vector<int16_t> buf(4096 * nch);
      const float scale = 1.0f / (32768.0f * (float)nch);
      long remaining = frames;
      while (remaining > 0) {
        long chunk = remaining < 4096 ? remaining : 4096;
        size_t got = fread(buf.data(), 2 * nch, (size_t)chunk, f);
        if (got == 0) break;
        for (size_t i = 0; i < got; ++i) {
          int32_t acc = 0;
          for (int c = 0; c < nch; ++c) acc += buf[i * nch + c];
          out[n_written++] = (float)acc * scale;
        }
        remaining -= (long)got;
      }
      fclose(f);
      return (int)n_written;
    } else {
      fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  return -2;
}

// int16 variant: raw PCM16 copy (no scaling — the device converts with
// x/32768, halving host->device wire bytes). Mono is a straight copy
// (bit-exact vs the float path); multi-channel downmixes by rounded mean
// (≤1 LSB from the float path's exact mean — AISHELL is mono).
int read_one_i16(const char* path, int16_t* out, long max_samples,
                 int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  RiffHeader rh;
  if (fread(&rh, sizeof(rh), 1, f) != 1 || memcmp(rh.riff, "RIFF", 4) ||
      memcmp(rh.wave, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  FmtChunk fmt{};
  bool have_fmt = false;
  long n_written = 0;
  ChunkHeader ch;
  while (fread(&ch, sizeof(ch), 1, f) == 1) {
    if (!memcmp(ch.id, "fmt ", 4)) {
      uint32_t to_read = ch.size < sizeof(fmt) ? ch.size : sizeof(fmt);
      if (fread(&fmt, to_read, 1, f) != 1) break;
      if (ch.size > to_read) fseek(f, ch.size - to_read, SEEK_CUR);
      have_fmt = true;
    } else if (!memcmp(ch.id, "data", 4)) {
      if (!have_fmt || fmt.bits_per_sample != 16 || fmt.audio_format != 1 ||
          fmt.num_channels == 0) {
        fclose(f);
        return -3;
      }
      if (sample_rate) *sample_rate = (int)fmt.sample_rate;
      const int nch = fmt.num_channels;
      long frames = (long)(ch.size / (2 * nch));
      if (frames > max_samples) frames = max_samples;
      if (nch == 1) {
        n_written = (long)fread(out, 2, (size_t)frames, f);
      } else {
        std::vector<int16_t> buf(4096 * nch);
        long remaining = frames;
        while (remaining > 0) {
          long chunk = remaining < 4096 ? remaining : 4096;
          size_t got = fread(buf.data(), 2 * nch, (size_t)chunk, f);
          if (got == 0) break;
          for (size_t i = 0; i < got; ++i) {
            int32_t acc = 0;
            for (int c = 0; c < nch; ++c) acc += buf[i * nch + c];
            // round-half-away mean
            int32_t m = acc >= 0 ? (acc + nch / 2) / nch : -((-acc + nch / 2) / nch);
            out[n_written++] = (int16_t)m;
          }
          remaining -= (long)got;
        }
      }
      fclose(f);
      return (int)n_written;
    } else {
      fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  return -2;
}

}  // namespace

extern "C" {

// Decode one wav into out[max_samples]; returns sample count or <0 on error.
int wavio_read(const char* path, float* out, long max_samples,
               int* sample_rate) {
  return read_one(path, out, max_samples, sample_rate);
}

// Decode n wavs into a zero-padded (n, stride) float32 batch in parallel.
// lengths[i] receives the sample count (or <0 error code) per file.
// Rows are pre-zeroed here, so callers can reuse buffers.
void wavio_read_batch(const char** paths, int n, float* out, long stride,
                      int* lengths, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + (long)i * stride;
      memset(row, 0, sizeof(float) * (size_t)stride);
      lengths[i] = read_one(paths[i], row, stride, nullptr);
    }
  };
  std::vector<std::thread> threads;
  int spawn = num_threads < n ? num_threads : n;
  threads.reserve((size_t)spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// int16 batch decode: raw PCM16 rows, zero-padded. Same contract as
// wavio_read_batch but without the float conversion — feeds the int16
// wire format (device scales by 1/32768).
void wavio_read_batch_i16(const char** paths, int n, int16_t* out,
                          long stride, int* lengths, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int16_t* row = out + (long)i * stride;
      memset(row, 0, sizeof(int16_t) * (size_t)stride);
      lengths[i] = read_one_i16(paths[i], row, stride, nullptr);
    }
  };
  std::vector<std::thread> threads;
  int spawn = num_threads < n ? num_threads : n;
  threads.reserve((size_t)spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
