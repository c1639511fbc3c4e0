// SMSUT-TPU native data runtime: PNG slice cache + batch gather.
//
// The reference's data path is PIL decode in forked DataLoader workers
// (`/root/reference/data_loader/baseLoader.py:52-62`).  This host exposes a
// single CPU, so per-sample Python overhead is pure loss; this library keeps
// every decoded slice in one contiguous aligned buffer and serves batch
// gathers (index list -> packed uint8 [B,H,W] block, or normalized float32
// in [-1,1]) with zero Python in the loop.
//
// Scope: 8-bit grayscale, non-interlaced PNGs (exactly what toPngAndSplit
// emits).  Decoding = zlib inflate + per-row unfilter.
//
// Build: native/build.sh  ->  native/libslicecache.so  (ctypes binding in
// smsut_tpu/data/native_cache.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Cache {
  int64_t h = 0, w = 0;
  std::vector<uint8_t> data;  // n_slices * h * w
  int64_t count = 0;
  std::string error;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8-bit grayscale non-interlaced PNG into out (h*w); returns 0 on
// success, sets *oh/*ow.
int decode_png(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
               int64_t* oh, int64_t* ow, std::string* err) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, kSig, 8) != 0) {
    *err = "not a PNG";
    return 1;
  }
  size_t pos = 8;
  int64_t h = 0, w = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* payload = buf + pos + 8;
    if (pos + 12 + clen > len) break;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(payload);
      h = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + clen);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (bit_depth != 8 || color_type != 0 || interlace != 0) {
    *err = "unsupported PNG (need 8-bit grayscale non-interlaced)";
    return 1;
  }

  const size_t stride = size_t(w);
  std::vector<uint8_t> raw((stride + 1) * size_t(h));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    *err = "zlib inflate failed";
    return 1;
  }

  out->resize(stride * size_t(h));
  std::vector<uint8_t> prev(stride, 0);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* line = src + 1;
    uint8_t* dst = out->data() + size_t(y) * stride;
    switch (filter) {
      case 0:
        memcpy(dst, line, stride);
        break;
      case 1:  // sub
        dst[0] = line[0];
        for (size_t x = 1; x < stride; ++x) dst[x] = line[x] + dst[x - 1];
        break;
      case 2:  // up
        for (size_t x = 0; x < stride; ++x) dst[x] = line[x] + prev[x];
        break;
      case 3:  // average
        dst[0] = line[0] + prev[0] / 2;
        for (size_t x = 1; x < stride; ++x)
          dst[x] = line[x] + uint8_t((int(dst[x - 1]) + int(prev[x])) / 2);
        break;
      case 4:  // paeth
        dst[0] = line[0] + uint8_t(paeth(0, prev[0], 0));
        for (size_t x = 1; x < stride; ++x)
          dst[x] = line[x] +
                   uint8_t(paeth(dst[x - 1], prev[x], prev[x - 1]));
        break;
      default:
        *err = "bad PNG filter";
        return 1;
    }
    memcpy(prev.data(), dst, stride);
  }
  *oh = h;
  *ow = w;
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size_t(n));
  size_t got = fread(out->data(), 1, size_t(n), f);
  fclose(f);
  return got == size_t(n) ? 0 : 1;
}

}  // namespace

extern "C" {

// Create a cache from `n` PNG paths (all same HxW).  Returns handle or null.
void* slicecache_create(const char** paths, int64_t n) {
  auto* c = new Cache();
  for (int64_t i = 0; i < n; ++i) {
    std::vector<uint8_t> buf, img;
    if (read_file(paths[i], &buf)) {
      c->error = std::string("read failed: ") + paths[i];
      return c;  // error queried via slicecache_error
    }
    int64_t h = 0, w = 0;
    if (decode_png(buf.data(), buf.size(), &img, &h, &w, &c->error)) return c;
    if (c->count == 0) {
      c->h = h;
      c->w = w;
      c->data.reserve(size_t(n) * size_t(h) * size_t(w));
    } else if (h != c->h || w != c->w) {
      c->error = "slice size mismatch";
      return c;
    }
    c->data.insert(c->data.end(), img.begin(), img.end());
    c->count++;
  }
  return c;
}

const char* slicecache_error(void* handle) {
  auto* c = static_cast<Cache*>(handle);
  return c->error.empty() ? nullptr : c->error.c_str();
}

int64_t slicecache_count(void* handle) { return static_cast<Cache*>(handle)->count; }
int64_t slicecache_height(void* handle) { return static_cast<Cache*>(handle)->h; }
int64_t slicecache_width(void* handle) { return static_cast<Cache*>(handle)->w; }

// Gather `b` slices by index into out_u8 [b, h, w] (packed, C-order).
void slicecache_gather_u8(void* handle, const int64_t* idx, int64_t b,
                          uint8_t* out_u8) {
  auto* c = static_cast<Cache*>(handle);
  const size_t sz = size_t(c->h) * size_t(c->w);
  for (int64_t i = 0; i < b; ++i)
    memcpy(out_u8 + size_t(i) * sz, c->data.data() + size_t(idx[i]) * sz, sz);
}

// Gather + ToTensor + Normalize(0.5, 0.5): out_f32 [b, h, w] in [-1, 1].
void slicecache_gather_f32(void* handle, const int64_t* idx, int64_t b,
                           float* out_f32) {
  auto* c = static_cast<Cache*>(handle);
  const size_t sz = size_t(c->h) * size_t(c->w);
  static float lut[256];
  static bool lut_init = false;
  if (!lut_init) {
    for (int v = 0; v < 256; ++v) lut[v] = (float(v) / 255.0f - 0.5f) / 0.5f;
    lut_init = true;
  }
  for (int64_t i = 0; i < b; ++i) {
    const uint8_t* src = c->data.data() + size_t(idx[i]) * sz;
    float* dst = out_f32 + size_t(i) * sz;
    for (size_t k = 0; k < sz; ++k) dst[k] = lut[src[k]];
  }
}

void slicecache_destroy(void* handle) { delete static_cast<Cache*>(handle); }

}  // extern "C"
