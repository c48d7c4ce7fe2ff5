// Native data-loader core: WAV batch ingest + length-bucketing batcher.
//
// Role in the stack: the reference leans on fairseq's cythonized
// batch_by_size and libsndfile for these (SURVEY.md 2.9) — here they are a
// small C-ABI library consumed via ctypes.  The batcher is the CPU hot spot
// when epoch-planning millions of utterances; the WAV reader feeds the
// host->device pipeline without Python-loop overhead.
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// batch_by_size: fairseq semantics — sort indices by size (stable), fill
// batches while max_len_in_batch * (count+1) <= max_tokens and count <
// max_sentences (0 = unlimited).
//
// Returns number of batches. Outputs:
//   out_indices: the sorted item indices, concatenated per batch
//   out_offsets: batch b covers out_indices[out_offsets[b] .. out_offsets[b+1])
// Caller allocates out_indices[n] and out_offsets[n+1].
// ---------------------------------------------------------------------------
int64_t batch_by_size(const int64_t* sizes, int64_t n, int64_t max_tokens,
                      int64_t max_sentences, int64_t* out_indices,
                      int64_t* out_offsets) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return sizes[a] < sizes[b]; });

  int64_t nb = 0;
  int64_t pos = 0;
  int64_t cur_start = 0;
  int64_t cur_max = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t idx = order[i];
    int64_t sz = sizes[idx];
    int64_t new_max = std::max(cur_max, sz);
    int64_t count = pos - cur_start;
    bool overflow = count > 0 && (new_max * (count + 1) > max_tokens ||
                                  (max_sentences > 0 && count >= max_sentences));
    if (overflow) {
      out_offsets[++nb] = pos;
      cur_start = pos;
      cur_max = sz;
    } else {
      cur_max = new_max;
    }
    out_indices[pos++] = idx;
  }
  if (pos > cur_start) out_offsets[++nb] = pos;
  return nb;
}

// ---------------------------------------------------------------------------
// WAV reading (PCM 16/24/32-bit and IEEE float, mono-mixed).
// read_wav: parses the RIFF chunks of `path`, writes up to max_samples floats
// into out.  Returns sample count (or -1 on error); *sample_rate set.
// ---------------------------------------------------------------------------
static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int64_t read_wav(const char* path, float* out, int64_t max_samples,
                 int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return -1;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  int64_t written = 0;
  uint8_t chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t csize = rd_u32(chunk + 4);
    if (!memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> buf(csize);
      if (fread(buf.data(), 1, csize, f) != csize) break;
      fmt = rd_u16(&buf[0]);
      channels = rd_u16(&buf[2]);
      sr = rd_u32(&buf[4]);
      bits = rd_u16(&buf[14]);
    } else if (!memcmp(chunk, "data", 4)) {
      if (!channels || !bits) break;
      int64_t bytes_per_frame = (int64_t)channels * bits / 8;
      int64_t frames = csize / bytes_per_frame;
      std::vector<uint8_t> buf(csize);
      size_t got = fread(buf.data(), 1, csize, f);
      frames = (int64_t)got / bytes_per_frame;
      int64_t limit = std::min(frames, max_samples);
      const uint8_t* p = buf.data();
      for (int64_t i = 0; i < limit; ++i) {
        float acc = 0.f;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* s = p + i * bytes_per_frame + c * bits / 8;
          float v = 0.f;
          if (fmt == 3 && bits == 32) {  // IEEE float
            float fv;
            memcpy(&fv, s, 4);
            v = fv;
          } else if (bits == 16) {
            int16_t iv = (int16_t)rd_u16(s);
            v = (float)iv / 32768.f;
          } else if (bits == 32) {
            int32_t iv = (int32_t)rd_u32(s);
            v = (float)iv / 2147483648.f;
          } else if (bits == 24) {
            int32_t iv = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                                   (uint32_t)s[2] << 24) >> 8;
            v = (float)iv / 8388608.f;
          } else if (bits == 8) {
            v = ((float)s[0] - 128.f) / 128.f;
          }
          acc += v;
        }
        out[i] = acc / channels;
      }
      written = limit;
      break;
    } else {
      fseek(f, csize + (csize & 1), SEEK_CUR);
      continue;
    }
  }
  fclose(f);
  *sample_rate = (int32_t)sr;
  return written;
}

// ---------------------------------------------------------------------------
// read_wav_batch: read n files, zero-padded into out[n, max_samples]
// (row-major).  lengths[i] receives each file's true sample count (-1 on
// error).  Single-threaded (this host has one core); the layout is ready for
// one host->device transfer.
// ---------------------------------------------------------------------------
void read_wav_batch(const char** paths, int64_t n, float* out,
                    int64_t max_samples, int64_t* lengths,
                    int32_t* sample_rates) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = out + i * max_samples;
    memset(row, 0, sizeof(float) * max_samples);
    lengths[i] = read_wav(paths[i], row, max_samples, &sample_rates[i]);
  }
}

// ---------------------------------------------------------------------------
// collate_tokens: fairseq-style padded token batch with optional
// EOS-shifted copy (move_eos_to_beginning) in one pass.
//   tokens: concatenated [total]; offsets: [n+1]
//   out/out_prev: [n, max_len] filled with pad_id
// ---------------------------------------------------------------------------
void collate_tokens(const int64_t* tokens, const int64_t* offsets, int64_t n,
                    int64_t max_len, int64_t pad_id, int64_t eos_id,
                    int64_t* out, int64_t* out_prev) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = offsets[i], end = offsets[i + 1];
    int64_t len = std::min(end - start, max_len);
    int64_t* row = out + i * max_len;
    int64_t* prev = out_prev ? out_prev + i * max_len : nullptr;
    for (int64_t j = 0; j < max_len; ++j) row[j] = pad_id;
    for (int64_t j = 0; j < len; ++j) row[j] = tokens[start + j];
    if (prev) {
      for (int64_t j = 0; j < max_len; ++j) prev[j] = pad_id;
      prev[0] = eos_id;
      for (int64_t j = 1; j < len; ++j) prev[j] = tokens[start + j - 1];
    }
  }
}

}  // extern "C"
