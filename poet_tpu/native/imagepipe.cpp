// Native host-side image pipeline: PNG/JPEG decode + batched float conversion.
//
// Why this exists: the input pipeline is the host-side bottleneck of the
// framework — the reference feeds its GPUs through torch DataLoader's C++
// worker pool (data_utils/data_prefetcher.py, pin_memory H2D streams); the
// TPU equivalent must likewise not be bottlenecked by Python image decode.
// PIL decode + float conversion measured ~34 ms/image of host CPU per
// 480x640 PNG (scripts/bench_loader.py); this library decodes with libpng/
// libjpeg directly, converts uint8 -> float32 [0,1] in the same pass, writes
// straight into the caller-provided batch buffer, and parallelizes across a
// std::thread pool entirely outside the GIL.
//
// Decode semantics match PIL's Image.convert("RGB"/"RGBA") on the formats
// the datasets contain (8/16-bit gray / palette / RGB / RGBA PNG, baseline +
// progressive JPEG): palette is expanded, 16-bit is stripped to 8, grayscale
// is replicated to 3 channels, and for RGB output an alpha channel is
// DROPPED (PIL convert("RGB") does not composite), for RGBA output a
// missing alpha is filled with 255.
//
// Built on demand by poet_tpu/native/__init__.py with
//   g++ -O3 -shared -fPIC imagepipe.cpp -lpng -ljpeg -lz
// and driven through ctypes (no pybind dependency).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// PNG from memory
// ---------------------------------------------------------------------------

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "read past end of buffer");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

bool is_png(const uint8_t* blob, size_t n) {
  return n >= 8 && png_sig_cmp(blob, 0, 8) == 0;
}

bool is_jpeg(const uint8_t* blob, size_t n) {
  return n >= 3 && blob[0] == 0xFF && blob[1] == 0xD8 && blob[2] == 0xFF;
}

// Decode one PNG into `out` (h*w*channels uint8, channels in {3, 4}).
// Returns 0 on success, -1 decode error, -2 size mismatch.
int decode_png(const uint8_t* blob, size_t size, uint8_t* out, int h, int w,
               int channels) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  std::vector<png_bytep> rows;  // declared before setjmp (longjmp clobbers)
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  MemReader reader{blob, size, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);

  png_uint_32 iw = png_get_image_width(png, info);
  png_uint_32 ih = png_get_image_height(png, info);
  if (static_cast<int>(iw) != w || static_cast<int>(ih) != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (channels == 3) {
    png_set_strip_alpha(png);
  } else {
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  }
  png_set_interlace_handling(png);
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(w) * channels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  rows.resize(h);
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// probe PNG header only
int probe_png(const uint8_t* blob, size_t size, int* h, int* w, int* c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  MemReader reader{blob, size, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  *w = static_cast<int>(png_get_image_width(png, info));
  *h = static_cast<int>(png_get_image_height(png, info));
  int color_type = png_get_color_type(png, info);
  *c = (color_type & PNG_COLOR_MASK_ALPHA ||
        png_get_valid(png, info, PNG_INFO_tRNS))
           ? 4
           : 3;
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG from memory
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Returns 0 success, -1 error, -2 size mismatch.
int decode_jpeg(const uint8_t* blob, size_t size, uint8_t* out, int h, int w,
                int channels) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  std::vector<uint8_t> rgb_row;  // before setjmp
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(blob),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg upconverts grayscale
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != w ||
      static_cast<int>(cinfo.output_height) != h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (channels == 4) rgb_row.resize(static_cast<size_t>(w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = static_cast<int>(cinfo.output_scanline);
    uint8_t* dst = out + static_cast<size_t>(y) * w * channels;
    if (channels == 3) {
      JSAMPROW row = dst;
      jpeg_read_scanlines(&cinfo, &row, 1);
    } else {
      JSAMPROW row = rgb_row.data();
      jpeg_read_scanlines(&cinfo, &row, 1);
      for (int x = 0; x < w; ++x) {
        dst[4 * x + 0] = rgb_row[3 * x + 0];
        dst[4 * x + 1] = rgb_row[3 * x + 1];
        dst[4 * x + 2] = rgb_row[3 * x + 2];
        dst[4 * x + 3] = 0xFF;
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int probe_jpeg(const uint8_t* blob, size_t size, int* h, int* w, int* c) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(blob),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  *c = 3;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int decode_dispatch(const uint8_t* blob, size_t size, uint8_t* out, int h,
                    int w, int channels) {
  if (is_png(blob, size)) return decode_png(blob, size, out, h, w, channels);
  if (is_jpeg(blob, size)) return decode_jpeg(blob, size, out, h, w, channels);
  return -3;  // unknown format
}

// uint8 -> float32 [0, 1] via a 256-entry LUT (exactly x / 255.0f).
struct U8LUT {
  float v[256];
  U8LUT() {
    for (int i = 0; i < 256; ++i) v[i] = static_cast<float>(i) / 255.0f;
  }
};
const U8LUT kLut;

void u8_to_f32(const uint8_t* in, float* out, size_t n) {
  for (size_t i = 0; i < n; ++i) out[i] = kLut.v[in[i]];
}

}  // namespace

extern "C" {

// Probe the header: fills h, w and the natural channel count (3 or 4).
// Returns 0 ok, -1 decode error, -3 unknown format.
int ip_probe(const uint8_t* blob, size_t size, int* h, int* w, int* c) {
  if (is_png(blob, size)) return probe_png(blob, size, h, w, c);
  if (is_jpeg(blob, size)) return probe_jpeg(blob, size, h, w, c);
  return -3;
}

// Decode one image into a caller buffer of exactly (h, w, channels) uint8.
// channels: 3 = RGB (alpha dropped, PIL convert("RGB") semantics),
//           4 = RGBA (missing alpha filled with 255).
// Returns 0 ok, -1 decode error, -2 dims mismatch, -3 unknown format.
int ip_decode_u8(const uint8_t* blob, size_t size, uint8_t* out, int h, int w,
                 int channels) {
  if (channels != 3 && channels != 4) return -1;
  return decode_dispatch(blob, size, out, h, w, channels);
}

// Decode a batch of same-sized images straight into a float32 [0,1] buffer
// of shape (n, h, w, 3), parallel over `n_threads` host threads (the whole
// call runs GIL-free under ctypes). Returns 0 if all decoded; otherwise the
// 1-based index of the first failed image negated error-code packed as
// (index * 10 + |err|), e.g. image 2 dims mismatch -> 22.
int ip_decode_batch_f32(const uint8_t** blobs, const size_t* sizes, int n,
                        int h, int w, float* out, int n_threads) {
  const size_t px = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(0);
  std::atomic<int> failure(0);
  n_threads = std::max(1, std::min(n_threads, n));

  auto worker = [&]() {
    std::vector<uint8_t> tmp(px);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failure.load() != 0) return;
      int rc = decode_dispatch(blobs[i], sizes[i], tmp.data(), h, w, 3);
      if (rc != 0) {
        failure.store((i + 1) * 10 + (rc < 0 ? -rc : rc));
        return;
      }
      u8_to_f32(tmp.data(), out + static_cast<size_t>(i) * px, px);
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failure.load();
}

// Batched uint8 -> float32 [0,1] conversion (n elements), threaded.
void ip_u8_to_f32(const uint8_t* in, float* out, long long n, int n_threads) {
  n_threads = std::max(1, n_threads);
  if (n_threads == 1 || n < (1 << 20)) {
    u8_to_f32(in, out, static_cast<size_t>(n));
    return;
  }
  std::vector<std::thread> threads;
  long long chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    long long a = t * chunk, b = std::min<long long>(n, a + chunk);
    if (a >= b) break;
    threads.emplace_back([=]() {
      u8_to_f32(in + a, out + a, static_cast<size_t>(b - a));
    });
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
