// Native batch image loader.
//
// TPU-native replacement for the reference's host-side image ingestion
// (cv2.imread per image under a Python thread pool,
// run_preprocessing.py:38-47,154; DataLoader workers, SURVEY.md §2.10).
// Decodes grayscale JPEG/BMP files on a C++ thread pool and packs them,
// padded and normalized to [0,1], straight into one contiguous
// (B, H, W) float32 batch buffer ready for device transfer — the host-side
// feed for the >10k img/s enhancement target.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a grayscale JPEG from memory. Returns 0 on success.
int decode_jpeg_gray(const uint8_t* data, size_t len,
                     std::vector<uint8_t>* pixels, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  pixels->resize(static_cast<size_t>(w) * h);
  // Hand libjpeg-turbo a window of row pointers per call: one call per
  // scanline costs ~25% of the decode (measured 1249 -> 1573 img/s on
  // 320x256 grayscale with the system turbo 2.1.5).
  uint8_t* rows[32];
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = cinfo.output_scanline;
    int k = 0;
    for (; k < 32 && base + k < h; ++k) {
      rows[k] = pixels->data() + static_cast<size_t>(base + k) * w;
    }
    jpeg_read_scanlines(&cinfo, rows, k);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return 0;
}

// Minimal 8-bit (palette or gray) BMP decoder (NIST .bmp files).
int decode_bmp_gray(const uint8_t* data, size_t len,
                    std::vector<uint8_t>* pixels, int* width, int* height) {
  if (len < 54 || data[0] != 'B' || data[1] != 'M') return 1;
  auto rd32 = [&](size_t off) {
    uint32_t v;
    std::memcpy(&v, data + off, 4);
    return v;
  };
  auto rd16 = [&](size_t off) {
    uint16_t v;
    std::memcpy(&v, data + off, 2);
    return v;
  };
  const uint32_t data_off = rd32(10);
  const int32_t w = static_cast<int32_t>(rd32(18));
  int32_t h = static_cast<int32_t>(rd32(22));
  const uint16_t bpp = rd16(28);
  const uint32_t compression = rd32(30);
  if (compression != 0 || (bpp != 8 && bpp != 24)) return 1;
  const bool flipped = h > 0;
  if (h < 0) h = -h;
  if (w <= 0 || h <= 0) return 1;
  const size_t row_stride = ((static_cast<size_t>(w) * bpp / 8) + 3) & ~3ull;
  if (data_off + row_stride * h > len) return 1;
  pixels->resize(static_cast<size_t>(w) * h);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = data + data_off + row_stride * (flipped ? (h - 1 - y) : y);
    uint8_t* dst = pixels->data() + static_cast<size_t>(y) * w;
    if (bpp == 8) {
      std::memcpy(dst, src, w);
    } else {
      for (int x = 0; x < w; ++x) {
        const uint8_t b = src[3 * x], g = src[3 * x + 1], r = src[3 * x + 2];
        dst[x] = static_cast<uint8_t>((299 * r + 587 * g + 114 * b) / 1000);
      }
    }
  }
  *width = w;
  *height = h;
  return 0;
}

// Decode a grayscale JPEG from memory DIRECTLY into a strided uint8
// destination (one row per output-batch row, stride = padded batch width).
// Skips the intermediate pixel buffer AND the float conversion entirely —
// this is the hot path for the runner's uint8-staged batches
// (preprocessing/runner.py stages uint8; the device casts to f32/255).
// Returns 0 on success, 2 if the image exceeds (max_w, max_h).
int decode_jpeg_gray_into(const uint8_t* data, size_t len, uint8_t* dst,
                          int stride, int max_w, int max_h,
                          int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_calc_output_dimensions(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (w > max_w || h > max_h) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  jpeg_start_decompress(&cinfo);
  uint8_t* rows[32];
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = cinfo.output_scanline;
    int k = 0;
    for (; k < 32 && base + k < h; ++k) {
      rows[k] = dst + static_cast<size_t>(base + k) * stride;
    }
    jpeg_read_scanlines(&cinfo, rows, k);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return 1;
  }
  buf->resize(size);
  const size_t got = std::fread(buf->data(), 1, size, f);
  std::fclose(f);
  return got == static_cast<size_t>(size) ? 0 : 1;
}

}  // namespace

extern "C" {

// Decode + pad + normalize ``n`` images into out (n, H, W) float32.
// status[i]: 0 ok, nonzero = failed (slot left zeroed).
// widths/heights[i]: original image sizes (0 on failure).
// Returns the number of successfully loaded images.
int mbfp_batch_load(const char** paths, int n, float* out, int out_h,
                    int out_w, int* status, int* widths, int* heights,
                    int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t plane = static_cast<size_t>(out_h) * out_w;

  auto worker = [&]() {
    std::vector<uint8_t> file_buf, pixels;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = 1;
      widths[i] = heights[i] = 0;
      float* dst = out + plane * i;
      int w = 0, h = 0;
      int rc = 1;
      if (!read_file(paths[i], &file_buf)) {
        if (file_buf.size() > 2 && file_buf[0] == 0xFF && file_buf[1] == 0xD8) {
          rc = decode_jpeg_gray(file_buf.data(), file_buf.size(), &pixels, &w, &h);
        } else if (file_buf.size() > 2 && file_buf[0] == 'B' && file_buf[1] == 'M') {
          rc = decode_bmp_gray(file_buf.data(), file_buf.size(), &pixels, &w, &h);
        }
      }
      if (rc || w > out_w || h > out_h) {
        // failed slot: left zeroed (only the failure path pays a memset —
        // a full-batch up-front memset wrote 4*H*W bytes/image of DRAM
        // before any decode started)
        std::memset(dst, 0, sizeof(float) * plane);
        continue;
      }
      for (int y = 0; y < h; ++y) {
        const uint8_t* src = pixels.data() + static_cast<size_t>(y) * w;
        float* row = dst + static_cast<size_t>(y) * out_w;
        for (int x = 0; x < w; ++x) row[x] = src[x] * (1.0f / 255.0f);
        for (int x = w; x < out_w; ++x) row[x] = 0.0f;
      }
      if (h < out_h) {
        std::memset(dst + static_cast<size_t>(h) * out_w, 0,
                    sizeof(float) * (out_h - h) * out_w);
      }
      status[i] = 0;
      widths[i] = w;
      heights[i] = h;
      ok.fetch_add(1);
    }
  };

  const int nt = num_threads > 0 ? num_threads
                                 : static_cast<int>(std::thread::hardware_concurrency());
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Decode + pad ``n`` images into out (n, H, W) uint8 — the runner's native
// staging format (uint8 to the device, which casts to f32/255 on-chip, so
// the host never touches floats and the upload link carries 4x fewer
// bytes). JPEGs decode directly into the strided batch buffer (no
// intermediate pixel buffer); only BMP takes the copy path.
int mbfp_batch_load_u8(const char** paths, int n, uint8_t* out, int out_h,
                       int out_w, int* status, int* widths, int* heights,
                       int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t plane = static_cast<size_t>(out_h) * out_w;

  auto worker = [&]() {
    std::vector<uint8_t> file_buf, pixels;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = 1;
      widths[i] = heights[i] = 0;
      uint8_t* dst = out + plane * i;
      int w = 0, h = 0;
      int rc = 1;
      bool in_place = false;
      if (!read_file(paths[i], &file_buf)) {
        if (file_buf.size() > 2 && file_buf[0] == 0xFF && file_buf[1] == 0xD8) {
          rc = decode_jpeg_gray_into(file_buf.data(), file_buf.size(), dst,
                                     out_w, out_w, out_h, &w, &h);
          in_place = (rc == 0);
        } else if (file_buf.size() > 2 && file_buf[0] == 'B' && file_buf[1] == 'M') {
          rc = decode_bmp_gray(file_buf.data(), file_buf.size(), &pixels, &w, &h);
        }
      }
      if (rc || w > out_w || h > out_h) {
        std::memset(dst, 0, plane);
        continue;
      }
      if (in_place) {
        // zero only the padding (right margin per decoded row + bottom rows)
        if (w < out_w) {
          for (int y = 0; y < h; ++y) {
            std::memset(dst + static_cast<size_t>(y) * out_w + w, 0, out_w - w);
          }
        }
      } else {
        for (int y = 0; y < h; ++y) {
          std::memcpy(dst + static_cast<size_t>(y) * out_w,
                      pixels.data() + static_cast<size_t>(y) * w, w);
          if (w < out_w) {
            std::memset(dst + static_cast<size_t>(y) * out_w + w, 0, out_w - w);
          }
        }
      }
      if (h < out_h) {
        std::memset(dst + static_cast<size_t>(h) * out_w, 0,
                    static_cast<size_t>(out_h - h) * out_w);
      }
      status[i] = 0;
      widths[i] = w;
      heights[i] = h;
      ok.fetch_add(1);
    }
  };

  const int nt = num_threads > 0 ? num_threads
                                 : static_cast<int>(std::thread::hardware_concurrency());
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Probe image dimensions without full decode (JPEG SOF scan / BMP header).
int mbfp_probe_size(const char* path, int* width, int* height) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf)) return 1;
  if (buf.size() > 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    std::vector<uint8_t> px;
    // full decode is still fast; SOF scan avoided for simplicity
    return decode_jpeg_gray(buf.data(), buf.size(), &px, width, height);
  }
  if (buf.size() > 26 && buf[0] == 'B' && buf[1] == 'M') {
    int32_t w, h;
    std::memcpy(&w, buf.data() + 18, 4);
    std::memcpy(&h, buf.data() + 22, 4);
    *width = w;
    *height = h < 0 ? -h : h;
    return 0;
  }
  return 1;
}

}  // extern "C"
