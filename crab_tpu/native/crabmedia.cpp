// crabmedia — native host data plane for crab_tpu.
//
// Replaces the reference's C++ media dependencies (librosa/soxr audio
// loading, decord frame handling — SURVEY.md §2.4) with a small,
// dependency-free library: RIFF/WAV parsing (PCM 8/16/24/32 + float32,
// any channel count), mono mixdown, and polyphase windowed-sinc
// resampling. Exposed through a C ABI consumed via ctypes
// (crab_tpu/native/binding.py).
//
// Build: g++ -O3 -march=native -shared -fPIC crabmedia.cpp -o libcrabmedia.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <dlfcn.h>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(n);
  size_t got = fread(buf.data(), 1, n, f);
  fclose(f);
  return got == (size_t)n;
}

uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

// Parse RIFF/WAVE; mixdown to mono float (mean over channels, matching
// librosa mono=True).
bool parse_wav(const std::vector<uint8_t>& buf, Wav* out) {
  if (buf.size() < 44) return false;
  if (memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return false;
  size_t pos = 12;
  int channels = 0, bits = 0, fmt = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= buf.size()) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t sz = rd32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (!memcmp(hdr, "fmt ", 4) && sz >= 16) {
      fmt = rd16(body);
      channels = rd16(body + 2);
      out->sample_rate = (int)rd32(body + 4);
      bits = rd16(body + 14);
      if (fmt == 0xFFFE && sz >= 40) fmt = rd16(body + 24);  // extensible
    } else if (!memcmp(hdr, "data", 4)) {
      data = body;
      data_len = sz;
      if (pos + 8 + data_len > buf.size()) data_len = buf.size() - pos - 8;
    }
    pos += 8 + sz + (sz & 1);
  }
  if (!data || channels <= 0 || out->sample_rate <= 0) return false;

  size_t bytes_per = bits / 8;
  size_t frames = data_len / (bytes_per * channels);
  out->samples.resize(frames);
  const float inv_ch = 1.0f / channels;
  for (size_t i = 0; i < frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = data + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        v = (float)(int16_t)rd16(s) / 32768.f;
      } else if (bits == 32) {
        v = (float)(int32_t)rd32(s) / 2147483648.f;
      } else if (bits == 24) {
        int32_t iv = ((int32_t)s[0] << 8) | ((int32_t)s[1] << 16) |
                     ((int32_t)s[2] << 24);
        v = (float)(iv >> 8) / 8388608.f;
      } else if (bits == 8) {
        v = ((float)s[0] - 128.f) / 128.f;
      }
      acc += v;
    }
    out->samples[i] = acc * inv_ch;
  }
  return true;
}

double bessel_i0(double x) {
  // modified Bessel function of the first kind, order 0 (series)
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Polyphase windowed-sinc resampler (kaiser beta=8, 32-tap half-width per
// rate unit) — same design as crab_tpu/media/audio.py's numpy fallback.
std::vector<float> resample(const std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out) return x;
  int g = 1;
  {
    int a = sr_in, b = sr_out;
    while (b) { int t = a % b; a = b; b = t; }
    g = a;
  }
  const int up = sr_out / g, down = sr_in / g;
  const int max_rate = up > down ? up : down;
  const int half = 32 * max_rate;
  const double cutoff = 1.0 / max_rate;
  const int ntaps = 2 * half + 1;
  std::vector<double> h(ntaps);
  const double beta = 8.0, denom = bessel_i0(beta);
  for (int i = 0; i < ntaps; ++i) {
    double n = i - half;
    double sinc = (n == 0) ? 1.0 : sin(M_PI * cutoff * n) / (M_PI * cutoff * n);
    double r = n / half;
    double w = bessel_i0(beta * sqrt(1.0 - r * r > 0 ? 1.0 - r * r : 0.0)) / denom;
    h[i] = cutoff * sinc * w * up;
  }
  const long out_len = (long)ceil((double)x.size() * sr_out / sr_in);
  std::vector<float> y(out_len);
  // y[m] = sum_k x[k] * h[m*down - k*up + half]  (polyphase evaluation)
  for (long m = 0; m < out_len; ++m) {
    const long center = m * down;  // position in upsampled grid
    long k_lo = (center - half + up - 1) / up;
    long k_hi = (center + half) / up;
    if (k_lo < 0) k_lo = 0;
    if (k_hi >= (long)x.size()) k_hi = (long)x.size() - 1;
    double acc = 0.0;
    for (long k = k_lo; k <= k_hi; ++k) {
      long tap = center - k * up + half;
      acc += (double)x[k] * h[tap];
    }
    y[m] = (float)acc;
  }
  return y;
}

// ---------------------------------------------------------------------------
// MPEG audio (.mp3) decode via the system codec (libmpg123), loaded with
// dlopen so the library stays dependency-free at build time. The AVVP /
// AVE / AVQA splits ship .mp3 audio (``dataset/unified_dataset.py:204,247``);
// the reference decodes them through librosa->audioread->mad. Falls back
// cleanly (crab_has_mp3()==0) when the codec is absent.
// ---------------------------------------------------------------------------

struct Mpg123Api {
  void* dl = nullptr;
  int (*init)() = nullptr;
  void* (*make)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, unsigned char*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*destroy)(void*) = nullptr;
  bool ok = false;
};

enum {
  CRAB_MPG123_OK = 0,
  CRAB_MPG123_DONE = -12,
  CRAB_MPG123_NEW_FORMAT = -11,
  CRAB_MPG123_ENC_FLOAT_32 = 0x200,
};

const Mpg123Api& mpg123_api() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    const char* names[] = {"libmpg123.so.0", "libmpg123.so"};
    for (const char* n : names) {
      a.dl = dlopen(n, RTLD_NOW | RTLD_LOCAL);
      if (a.dl) break;
    }
    if (!a.dl) return a;
    auto sym = [&](const char* s) { return dlsym(a.dl, s); };
    a.init = (int (*)())sym("mpg123_init");
    a.make = (void* (*)(const char*, int*))sym("mpg123_new");
    a.open = (int (*)(void*, const char*))sym("mpg123_open");
    a.getformat = (int (*)(void*, long*, int*, int*))sym("mpg123_getformat");
    a.format_none = (int (*)(void*))sym("mpg123_format_none");
    a.format = (int (*)(void*, long, int, int))sym("mpg123_format");
    a.read = (int (*)(void*, unsigned char*, size_t, size_t*))sym("mpg123_read");
    a.close = (int (*)(void*))sym("mpg123_close");
    a.destroy = (void (*)(void*))sym("mpg123_delete");
    a.ok = a.init && a.make && a.open && a.getformat && a.format_none &&
           a.format && a.read && a.close && a.destroy;
    if (a.ok && a.init() != CRAB_MPG123_OK) a.ok = false;
    return a;
  }();
  return api;
}

// Decode any mpg123-supported stream to mono float at its native rate.
bool decode_mpeg(const char* path, Wav* out) {
  const Mpg123Api& api = mpg123_api();
  if (!api.ok) return false;
  int err = 0;
  void* h = api.make(nullptr, &err);
  if (!h) return false;
  bool good = false;
  long rate = 0;
  int channels = 0, enc = 0;
  do {
    // probe the stream's native rate/channels, then REOPEN with the
    // output locked to float32 — format changes set after open don't
    // retroactively apply to the already-negotiated stream.
    if (api.open(h, path) != CRAB_MPG123_OK) break;
    if (api.getformat(h, &rate, &channels, &enc) != CRAB_MPG123_OK) break;
    api.close(h);
    if (rate <= 0 || channels <= 0) break;
    api.format_none(h);
    if (api.format(h, rate, channels, CRAB_MPG123_ENC_FLOAT_32) !=
        CRAB_MPG123_OK)
      break;
    if (api.open(h, path) != CRAB_MPG123_OK) break;
    std::vector<unsigned char> buf(1 << 16);
    std::vector<float> interleaved;
    for (;;) {
      size_t done = 0;
      int rc = api.read(h, buf.data(), buf.size(), &done);
      if (done) {
        const float* f = (const float*)buf.data();
        interleaved.insert(interleaved.end(), f, f + done / sizeof(float));
      }
      if (rc == CRAB_MPG123_DONE) {
        good = true;
        break;
      }
      if (rc == CRAB_MPG123_NEW_FORMAT) {
        if (api.getformat(h, &rate, &channels, &enc) != CRAB_MPG123_OK) break;
        continue;
      }
      if (rc != CRAB_MPG123_OK) break;
    }
    if (!good || interleaved.empty()) {
      good = false;
      break;
    }
    out->sample_rate = (int)rate;
    size_t frames = interleaved.size() / channels;
    out->samples.resize(frames);
    const float inv_ch = 1.0f / channels;
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += interleaved[i * channels + c];
      out->samples[i] = acc * inv_ch;
    }
  } while (false);
  api.close(h);
  api.destroy(h);
  return good;
}

}  // namespace

extern "C" {

// Load a WAV file as mono float32 at target_sr. duration<=0 means full.
// Returns 0 on success; caller frees *out with crab_free.
int crab_load_wav(const char* path, int target_sr, double duration,
                  float** out, long* out_len) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  Wav wav;
  if (!parse_wav(buf, &wav)) return 2;
  if (duration > 0) {
    size_t maxn = (size_t)(duration * wav.sample_rate);
    if (wav.samples.size() > maxn) wav.samples.resize(maxn);
  }
  std::vector<float> res = resample(wav.samples, wav.sample_rate, target_sr);
  *out_len = (long)res.size();
  *out = (float*)malloc(res.size() * sizeof(float));
  if (!*out) return 3;
  memcpy(*out, res.data(), res.size() * sizeof(float));
  return 0;
}

// Load ANY supported audio file (RIFF/WAV natively, MPEG audio via the
// system codec) as mono float32 at target_sr. Returns 0 on success,
// 1 = unreadable file, 2 = undecodable, 3 = OOM.
int crab_load_audio(const char* path, int target_sr, double duration,
                    float** out, long* out_len) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  Wav wav;
  bool is_wav =
      buf.size() >= 12 && !memcmp(buf.data(), "RIFF", 4) &&
      !memcmp(buf.data() + 8, "WAVE", 4);
  if (is_wav) {
    if (!parse_wav(buf, &wav)) return 2;
  } else {
    buf.clear();
    buf.shrink_to_fit();
    if (!decode_mpeg(path, &wav)) return 2;
  }
  if (duration > 0) {
    size_t maxn = (size_t)(duration * wav.sample_rate);
    if (wav.samples.size() > maxn) wav.samples.resize(maxn);
  }
  std::vector<float> res = resample(wav.samples, wav.sample_rate, target_sr);
  *out_len = (long)res.size();
  *out = (float*)malloc(res.size() * sizeof(float));
  if (!*out) return 3;
  memcpy(*out, res.data(), res.size() * sizeof(float));
  return 0;
}

// 1 when the MPEG codec path is usable on this host.
int crab_has_mp3() { return mpg123_api().ok ? 1 : 0; }

void crab_free(float* p) { free(p); }

int crab_version() { return 2; }

}  // extern "C"
