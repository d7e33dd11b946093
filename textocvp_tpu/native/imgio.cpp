// Native host-side image decode + resize for the data pipeline.
//
// The reference delegates image IO to PIL/decord on the host
// (/root/reference/src/data/CLIPort.py:100-106, Cater.py:132-147). On a TPU
// VM the host pipeline must keep up with chips consuming thousands of frames
// per second (SURVEY.md §7 hard part 5); this module removes the Python/PIL
// overhead from the hot decode path:
//
//   * PNG decode via libpng's simplified API (always expanded to RGBA8, the
//     alpha channel dropped afterwards — byte-identical to PIL's
//     Image.convert("RGB") semantics, which drops alpha without compositing).
//   * Bilinear resize that is BIT-EXACT with PIL's Image.BILINEAR resample
//     for uint8 images: the same triangle filter, the same 22-bit fixed-point
//     coefficient quantisation, the same horizontal-then-vertical pass order
//     with a uint8 intermediate (see Pillow's src/libImaging/Resample.c).
//     Bit-exactness means enabling the native path cannot change training or
//     eval numerics relative to the PIL path (asserted in
//     tests/test_native_imgio.py).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All entry points release no Python state and may be called from multiple
// threads concurrently (ctypes drops the GIL during the call).

#include <png.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // PIL's PRECISION_BITS for 8bpc

inline uint8_t clip8(int64_t in) {
  // PIL: clip8(ss) with ss pre-initialised to 1 << (PRECISION_BITS - 1).
  int64_t v = in >> kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

inline double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  if (x < 1.0) return 1.0 - x;
  return 0.0;
}

// Mirror of Pillow's precompute_coeffs (Resample.c) for the triangle filter
// with support 1.0, in0 = 0, in1 = in_size (no box cropping).
struct Coeffs {
  int ksize = 0;
  std::vector<int> bounds;  // 2 * out_size: (xmin, xcount) per output pixel
  std::vector<int> kk;      // out_size * ksize fixed-point weights
};

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  const double filterscale_raw = static_cast<double>(in_size) / out_size;
  const double filterscale = filterscale_raw < 1.0 ? 1.0 : filterscale_raw;
  const double support = 1.0 * filterscale;  // bilinear support == 1.0
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.bounds.resize(2 * static_cast<size_t>(out_size));
  c.kk.resize(static_cast<size_t>(out_size) * c.ksize);
  std::vector<double> w(static_cast<size_t>(c.ksize));

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * filterscale_raw;
    double ww = 0.0;
    const double ss = 1.0 / filterscale;
    // Round the half-open interval the same way Pillow does.
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      const double val = bilinear_filter((x + xmin - center + 0.5) * ss);
      w[static_cast<size_t>(x)] = val;
      ww += val;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) w[static_cast<size_t>(x)] /= ww;
    }
    int* kk_row = &c.kk[static_cast<size_t>(xx) * c.ksize];
    for (int x = 0; x < xmax; ++x) {
      const double v = w[static_cast<size_t>(x)] * (1 << kPrecisionBits);
      kk_row[x] = static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
    }
    for (int x = xmax; x < c.ksize; ++x) kk_row[x] = 0;
    c.bounds[2 * static_cast<size_t>(xx) + 0] = xmin;
    c.bounds[2 * static_cast<size_t>(xx) + 1] = xmax;
  }
  return c;
}

// Horizontal resample of an RGB8 image: (h, in_w, 3) -> (h, out_w, 3).
void resample_horizontal(const uint8_t* in, int h, int in_w, uint8_t* out,
                         int out_w, const Coeffs& c) {
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* in_row = in + static_cast<size_t>(yy) * in_w * 3;
    uint8_t* out_row = out + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = c.bounds[2 * static_cast<size_t>(xx) + 0];
      const int xmax = c.bounds[2 * static_cast<size_t>(xx) + 1];
      const int* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
      int64_t ss0 = 1 << (kPrecisionBits - 1);
      int64_t ss1 = ss0, ss2 = ss0;
      for (int x = 0; x < xmax; ++x) {
        const uint8_t* px = in_row + static_cast<size_t>(x + xmin) * 3;
        ss0 += static_cast<int64_t>(px[0]) * k[x];
        ss1 += static_cast<int64_t>(px[1]) * k[x];
        ss2 += static_cast<int64_t>(px[2]) * k[x];
      }
      out_row[xx * 3 + 0] = clip8(ss0);
      out_row[xx * 3 + 1] = clip8(ss1);
      out_row[xx * 3 + 2] = clip8(ss2);
    }
  }
}

// Vertical resample of an RGB8 image: (in_h, w, 3) -> (out_h, w, 3).
void resample_vertical(const uint8_t* in, int in_h, int w, uint8_t* out,
                       int out_h, const Coeffs& c) {
  for (int yy = 0; yy < out_h; ++yy) {
    const int ymin = c.bounds[2 * static_cast<size_t>(yy) + 0];
    const int ymax = c.bounds[2 * static_cast<size_t>(yy) + 1];
    const int* k = &c.kk[static_cast<size_t>(yy) * c.ksize];
    uint8_t* out_row = out + static_cast<size_t>(yy) * w * 3;
    for (int xx = 0; xx < w * 3; ++xx) {
      int64_t ss = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y) {
        ss += static_cast<int64_t>(
                  in[static_cast<size_t>(y + ymin) * w * 3 + xx]) *
              k[y];
      }
      out_row[xx] = clip8(ss);
    }
  }
}

}  // namespace

extern "C" {

// Probe the dimensions of an in-memory PNG. Returns 0 on success.
int imgio_png_size(const uint8_t* buf, size_t len, int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return 1;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  png_image_free(&image);
  return 0;
}

// Decode an in-memory PNG to tightly-packed RGB8 (h*w*3 bytes, caller
// allocated). Alpha (if present) is DROPPED, not composited — matching
// PIL Image.convert("RGB"). Returns 0 on success.
//
// Returns 4 (caller should fall back to PIL) for PNGs where libpng's
// simplified API would COLOR-CONVERT rather than just unpack: 16-bit
// sources (scaled 16->8 differently from PIL) and files tagged with a
// non-sRGB colorspace (gAMA/cHRM/iCCP — libpng converts toward sRGB, PIL
// returns the raw bytes). Bailing out preserves the bit-exact-with-PIL
// invariant for every file the native path does handle.
int imgio_decode_png_rgb(const uint8_t* buf, size_t len, uint8_t* out,
                         int h, int w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return 1;
  if (static_cast<int>(image.height) != h ||
      static_cast<int>(image.width) != w) {
    png_image_free(&image);
    return 2;
  }
  if ((image.format & PNG_FORMAT_FLAG_LINEAR) != 0 ||
      (image.flags & PNG_IMAGE_FLAG_COLORSPACE_NOT_sRGB) != 0) {
    png_image_free(&image);
    return 4;
  }
  // Always expand to RGBA so libpng never composites alpha away itself.
  image.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return 3;
  }
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    out[i * 3 + 0] = rgba[i * 4 + 0];
    out[i * 3 + 1] = rgba[i * 4 + 1];
    out[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return 0;
}

// PIL-BILINEAR-bit-exact resize of an RGB8 image.
int imgio_resize_bilinear_rgb(const uint8_t* in, int in_h, int in_w,
                              uint8_t* out, int out_h, int out_w) {
  if (in_h <= 0 || in_w <= 0 || out_h <= 0 || out_w <= 0) return 1;
  if (in_h == out_h && in_w == out_w) {
    std::memcpy(out, in, static_cast<size_t>(in_h) * in_w * 3);
    return 0;
  }
  // Pillow: horizontal pass first (into a uint8 intermediate), then vertical.
  const uint8_t* src = in;
  std::vector<uint8_t> tmp;
  int cur_w = in_w;
  if (out_w != in_w) {
    const Coeffs ch = precompute_coeffs(in_w, out_w);
    tmp.resize(static_cast<size_t>(in_h) * out_w * 3);
    resample_horizontal(src, in_h, in_w, tmp.data(), out_w, ch);
    src = tmp.data();
    cur_w = out_w;
  }
  if (out_h != in_h) {
    const Coeffs cv = precompute_coeffs(in_h, out_h);
    resample_vertical(src, in_h, cur_w, out, out_h, cv);
  } else {
    std::memcpy(out, src, static_cast<size_t>(out_h) * cur_w * 3);
  }
  return 0;
}

// Fused decode + resize: PNG bytes -> RGB8 at (out_h, out_w).
int imgio_decode_png_rgb_resized(const uint8_t* buf, size_t len, int out_h,
                                 int out_w, uint8_t* out) {
  int h = 0, w = 0;
  if (imgio_png_size(buf, len, &h, &w) != 0) return 1;
  std::vector<uint8_t> full(static_cast<size_t>(h) * w * 3);
  int rc = imgio_decode_png_rgb(buf, len, full.data(), h, w);
  if (rc != 0) return rc;
  return imgio_resize_bilinear_rgb(full.data(), h, w, out, out_h, out_w);
}

}  // extern "C"
