// Native runtime for whisper_diarize_tpu.
//
// The reference delegates its data loading and alignment hot loops to native
// code (hound for WAV I/O, whisper.cpp's C++ DTW; SURVEY.md §2.4). This
// library is the TPU build's native runtime counterpart, exposed to Python
// via ctypes (no pybind11 in the image):
//
//   * strict RIFF/WAVE PCM16 reader with the same validation rules as
//     src/audio.rs:10-20 (mono, integer PCM, 16 kHz, 16-bit),
//   * i16 <-> f32 PCM conversion (whisper.cpp convention: /32768),
//   * full monotonic DTW (DP + backtrack) over a cost matrix — the host
//     fallback when the Pallas/XLA path is not available, and the backtrack
//     engine for the device-computed cost matrix,
//   * banded DTW with the band geometry of the reference's memory model
//     (src/utils.rs:18-23: band 96/128/160 by length).
//
// Build: `make -C native` -> libwdt_native.so, loaded by
// whisper_diarize_tpu/native.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// WAV I/O
// ---------------------------------------------------------------------------

// Error codes for wav_read.
enum WavError {
  WAV_OK = 0,
  WAV_IO = -1,
  WAV_BAD_RIFF = -2,
  WAV_NOT_MONO = -3,
  WAV_NOT_INT_PCM = -4,
  WAV_BAD_RATE = -5,
  WAV_BAD_BITS = -6,
  WAV_NO_DATA = -7,
};

// Parse header only; returns sample count via *n_samples (0 on error).
int wav_info(const char* path, int64_t* n_samples) {
  *n_samples = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return WAV_IO;
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) != 0 ||
      memcmp(hdr + 8, "WAVE", 4) != 0) {
    fclose(f);
    return WAV_BAD_RIFF;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  int64_t data_bytes = -1;
  bool have_fmt = false;
  uint8_t chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      uint8_t fmt[16];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) {
        fclose(f);
        return WAV_BAD_RIFF;
      }
      memcpy(&format, fmt + 0, 2);
      memcpy(&channels, fmt + 2, 2);
      memcpy(&rate, fmt + 4, 4);
      memcpy(&bits, fmt + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      data_bytes = size;
      break;  // data payload follows
    } else {
      fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    }
  }
  fclose(f);
  if (!have_fmt || data_bytes < 0) return WAV_NO_DATA;
  if (channels != 1) return WAV_NOT_MONO;
  if (format != 1) return WAV_NOT_INT_PCM;  // 1 = integer PCM
  if (rate != 16000) return WAV_BAD_RATE;
  if (bits != 16) return WAV_BAD_BITS;
  *n_samples = data_bytes / 2;
  return WAV_OK;
}

// Read samples into caller-allocated buffer (length from wav_info).
int wav_read(const char* path, int16_t* out, int64_t n_samples) {
  FILE* f = fopen(path, "rb");
  if (!f) return WAV_IO;
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12) {
    fclose(f);
    return WAV_BAD_RIFF;
  }
  uint8_t chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "data", 4) == 0) {
      int64_t want = std::min<int64_t>(n_samples, size / 2);
      size_t got = fread(out, 2, (size_t)want, f);
      fclose(f);
      return got == (size_t)want ? WAV_OK : WAV_IO;
    }
    fseek(f, (size + 1) & ~1u, SEEK_CUR);
  }
  fclose(f);
  return WAV_NO_DATA;
}

int wav_write(const char* path, const int16_t* samples, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return WAV_IO;
  uint32_t data_bytes = (uint32_t)(n * 2);
  uint32_t riff_size = 36 + data_bytes;
  uint16_t fmt16 = 1, ch = 1, bits = 16, block = 2;
  uint32_t rate = 16000, byterate = 32000, fmtsize = 16;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_size, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  fwrite(&fmtsize, 4, 1, f);
  fwrite(&fmt16, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&byterate, 4, 1, f);
  fwrite(&block, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);
  fwrite(samples, 2, (size_t)n, f);
  fclose(f);
  return WAV_OK;
}

// ---------------------------------------------------------------------------
// PCM conversion (whisper.cpp convention)
// ---------------------------------------------------------------------------

void pcm_i16_to_f32(const int16_t* in, float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] / 32768.0f;
}

void pcm_f32_to_i16(const float* in, int16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = std::max(-1.0f, std::min(v, 1.0f - 1.0f / 32768.0f));
    out[i] = (int16_t)(v * 32768.0f);
  }
}

// ---------------------------------------------------------------------------
// DTW (monotonic, steps: diag / up / left)
// ---------------------------------------------------------------------------

// Full DP + backtrack. x is row-major [n, m]. Path written in forward order
// into ti/tj (each sized n + m); returns the path length, or -1 on error.
int64_t dtw_full(const float* x, int64_t n, int64_t m, int32_t* ti,
                 int32_t* tj) {
  if (n <= 0 || m <= 0) return -1;
  std::vector<float> cost((size_t)n * m);
  // row 0: only "left" moves
  cost[0] = x[0];
  for (int64_t j = 1; j < m; ++j) cost[j] = cost[j - 1] + x[j];
  for (int64_t i = 1; i < n; ++i) {
    const float* xr = x + i * m;
    float* cr = &cost[(size_t)i * m];
    const float* cp = &cost[(size_t)(i - 1) * m];
    cr[0] = xr[0] + cp[0];
    for (int64_t j = 1; j < m; ++j) {
      float best = std::min(cp[j], std::min(cp[j - 1], cr[j - 1]));
      cr[j] = xr[j] + best;
    }
  }
  // backtrack (ties prefer diagonal, then up, then left)
  std::vector<int32_t> rti, rtj;
  rti.reserve(n + m);
  rtj.reserve(n + m);
  int64_t i = n - 1, j = m - 1;
  rti.push_back((int32_t)i);
  rtj.push_back((int32_t)j);
  while (i > 0 || j > 0) {
    if (i == 0) {
      --j;
    } else if (j == 0) {
      --i;
    } else {
      float diag = cost[(size_t)(i - 1) * m + (j - 1)];
      float up = cost[(size_t)(i - 1) * m + j];
      float left = cost[(size_t)i * m + (j - 1)];
      float mn = std::min(diag, std::min(up, left));
      if (mn == diag) {
        --i;
        --j;
      } else if (mn == up) {
        --i;
      } else {
        --j;
      }
    }
    rti.push_back((int32_t)i);
    rtj.push_back((int32_t)j);
  }
  int64_t len = (int64_t)rti.size();
  for (int64_t k = 0; k < len; ++k) {
    ti[k] = rti[(size_t)(len - 1 - k)];
    tj[k] = rtj[(size_t)(len - 1 - k)];
  }
  return len;
}

// Band width by frame count — the reference's memory-model geometry
// (src/utils.rs:18-23): <=15000 frames -> 96, <=45000 -> 128, else 160.
int32_t dtw_band_for_frames(int64_t num_frames) {
  if (num_frames <= 15000) return 96;
  if (num_frames <= 45000) return 128;
  return 160;
}

// Banded DTW around the main diagonal (Sakoe-Chiba): out-of-band cells are
// +inf. Same outputs as dtw_full; band <= 0 selects the reference band.
int64_t dtw_banded(const float* x, int64_t n, int64_t m, int32_t band,
                   int32_t* ti, int32_t* tj) {
  if (n <= 0 || m <= 0) return -1;
  if (band <= 0) band = dtw_band_for_frames(m);
  const float INF = std::numeric_limits<float>::infinity();
  std::vector<float> cost((size_t)n * m, INF);
  double slope = n > 1 ? (double)(m - 1) / (double)(n - 1) : (double)m;
  cost[0] = x[0];
  for (int64_t j = 1; j < std::min<int64_t>(m, band + 1); ++j)
    cost[j] = cost[j - 1] + x[j];
  for (int64_t i = 1; i < n; ++i) {
    int64_t center = (int64_t)(slope * i);
    int64_t lo = std::max<int64_t>(0, center - band);
    int64_t hi = std::min<int64_t>(m - 1, center + band);
    const float* xr = x + i * m;
    float* cr = &cost[(size_t)i * m];
    const float* cp = &cost[(size_t)(i - 1) * m];
    for (int64_t j = lo; j <= hi; ++j) {
      float best = cp[j];
      if (j > 0) {
        best = std::min(best, cp[j - 1]);
        best = std::min(best, cr[j - 1]);
      }
      if (best == INF) continue;
      cr[j] = xr[j] + best;
    }
  }
  if (!(cost[(size_t)(n - 1) * m + (m - 1)] < INF)) {
    // band too narrow to connect: fall back to the full DP
    return dtw_full(x, n, m, ti, tj);
  }
  std::vector<int32_t> rti, rtj;
  int64_t i = n - 1, j = m - 1;
  rti.push_back((int32_t)i);
  rtj.push_back((int32_t)j);
  while (i > 0 || j > 0) {
    float diag = (i > 0 && j > 0) ? cost[(size_t)(i - 1) * m + (j - 1)] : INF;
    float up = (i > 0) ? cost[(size_t)(i - 1) * m + j] : INF;
    float left = (j > 0) ? cost[(size_t)i * m + (j - 1)] : INF;
    float mn = std::min(diag, std::min(up, left));
    if (mn == diag && i > 0 && j > 0) {
      --i;
      --j;
    } else if (mn == up && i > 0) {
      --i;
    } else {
      --j;
    }
    rti.push_back((int32_t)i);
    rtj.push_back((int32_t)j);
  }
  int64_t len = (int64_t)rti.size();
  for (int64_t k = 0; k < len; ++k) {
    ti[k] = rti[(size_t)(len - 1 - k)];
    tj[k] = rtj[(size_t)(len - 1 - k)];
  }
  return len;
}

}  // extern "C"
