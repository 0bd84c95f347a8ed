// hf_loader: native threaded image loader for the HairFast-TPU input pipeline.
//
// Replaces the reference's host-side loading stack (PIL + joblib process
// pools, utils/train.py:114-122; torchvision read_image, hair_swap.py:85)
// with a C++ pipeline: libjpeg/libpng decode -> separable bicubic resize ->
// float32 [0,1] NHWC -> a bounded prefetch queue filled by worker threads.
// The Python side (hairfastgan_tpu/data/native_loader.py) binds via ctypes
// and feeds device puts straight from these buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC hf_loader.cpp -o libhf_loader.so
//        -ljpeg -lpng -lpthread
//
// C ABI (stable, ctypes-friendly):
//   void* hfl_create(const char** paths, int n, int out_size, int threads);
//   void* hfl_create2(const char** paths, int n, int out_size, int threads,
//                     int fmt);                        // fmt: 0=f32, 1=u8
//   int   hfl_next(void* h, float* out, int* index);   // 1 ok, 0 drained
//   int   hfl_next_bytes(void* h, void* out, int* index);  // either fmt
//   void  hfl_destroy(void* h);
//   int   hfl_load_one(const char* path, int out_size, float* out);
//   int   hfl_load_one_u8(const char* path, int out_size, unsigned char* out);
//   int   hfl_resize_u8(const unsigned char* in, int in_h, int in_w,
//                       int out_size, unsigned char* out);  // in-memory
//
// The uint8 format exists for the serving path: the device normalizes
// uint8 inputs itself (pipeline/embedding.py), so shipping u8 moves 4x
// fewer bytes host->device and skips the float round-trip buffer.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<unsigned char> data;  // HWC, 8-bit
};

// ---------------------------------------------------------------- decoders

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->w = cinfo.output_width;
  im->h = cinfo.output_height;
  im->c = 3;
  im->data.resize(size_t(im->w) * im->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = im->data.data() + size_t(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* im) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_set_expand(png);          // palette/gray/low-bit -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  im->w = png_get_image_width(png, info);
  im->h = png_get_image_height(png, info);
  im->c = 3;
  im->data.resize(size_t(im->w) * im->h * 3);
  std::vector<png_bytep> rows(im->h);
  for (int y = 0; y < im->h; ++y)
    rows[y] = im->data.data() + size_t(y) * im->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, im);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, im);
  }
  fclose(f);
  return ok;
}

// ------------------------------------------------------- bicubic resampler

// Keys cubic (a = -0.75), the torch F.interpolate bicubic kernel — identical
// to the on-device resampler (hairfastgan_tpu/ops/resample.py resize_matrix).
inline float cubic(float x) {
  const float a = -0.75f;
  x = std::fabs(x);
  if (x <= 1.f) return ((a + 2.f) * x - (a + 3.f)) * x * x + 1.f;
  if (x < 2.f) return (((x - 5.f) * x + 8.f) * x - 4.f) * a;
  return 0.f;
}

struct AxisMap {
  std::vector<int> idx;     // 4 taps per output
  std::vector<float> wgt;
};

AxisMap build_axis(int in, int out) {
  AxisMap m;
  m.idx.resize(size_t(out) * 4);
  m.wgt.resize(size_t(out) * 4);
  const double scale = double(in) / out;
  for (int o = 0; o < out; ++o) {
    double src = (o + 0.5) * scale - 0.5;
    int j0 = int(std::floor(src));
    for (int k = -1; k <= 2; ++k) {
      int j = j0 + k;
      float w = cubic(float(src - j));
      j = j < 0 ? 0 : (j >= in ? in - 1 : j);
      m.idx[size_t(o) * 4 + (k + 1)] = j;
      m.wgt[size_t(o) * 4 + (k + 1)] = w;  // torch does not renormalize
    }
  }
  return m;
}

// HWC uint8 -> out_size^2 x 3 float [0,1]
void resize_to_float(const Image& im, int out_size, float* out) {
  if (im.w == out_size && im.h == out_size) {
    const size_t n = size_t(out_size) * out_size * 3;
    for (size_t i = 0; i < n; ++i) out[i] = im.data[i] * (1.f / 255.f);
    return;
  }
  AxisMap mx = build_axis(im.w, out_size);
  AxisMap my = build_axis(im.h, out_size);

  // pass 1: horizontal into a float intermediate [h][out][3]
  std::vector<float> tmp(size_t(im.h) * out_size * 3);
  for (int y = 0; y < im.h; ++y) {
    const unsigned char* row = im.data.data() + size_t(y) * im.w * 3;
    float* trow = tmp.data() + size_t(y) * out_size * 3;
    for (int o = 0; o < out_size; ++o) {
      const int* ji = &mx.idx[size_t(o) * 4];
      const float* jw = &mx.wgt[size_t(o) * 4];
      for (int ch = 0; ch < 3; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < 4; ++k) acc += jw[k] * row[ji[k] * 3 + ch];
        trow[o * 3 + ch] = acc * (1.f / 255.f);
      }
    }
  }
  // pass 2: vertical
  for (int o = 0; o < out_size; ++o) {
    const int* ji = &my.idx[size_t(o) * 4];
    const float* jw = &my.wgt[size_t(o) * 4];
    float* orow = out + size_t(o) * out_size * 3;
    for (int x = 0; x < out_size * 3; ++x) {
      float acc = 0.f;
      for (int k = 0; k < 4; ++k)
        acc += jw[k] * tmp[size_t(ji[k]) * out_size * 3 + x];
      orow[x] = acc < 0.f ? 0.f : (acc > 1.f ? 1.f : acc);
    }
  }
}

// uint8 output variant: right-sized images pass through as raw bytes;
// resized ones quantize round-half-up, matching the Python coercion
// (utils/images.to_image_u8).
void resize_to_u8(const Image& im, int out_size, unsigned char* out) {
  if (im.w == out_size && im.h == out_size) {
    std::memcpy(out, im.data.data(), size_t(out_size) * out_size * 3);
    return;
  }
  std::vector<float> f(size_t(out_size) * out_size * 3);
  resize_to_float(im, out_size, f.data());
  for (size_t i = 0; i < f.size(); ++i) {
    float v = f[i] * 255.f + 0.5f;
    out[i] = v <= 0.f ? 0 : (v >= 255.f ? 255 : (unsigned char)v);
  }
}

// ----------------------------------------------------------- prefetch pool

struct Item {
  int index;
  std::vector<unsigned char> bytes;  // f32 or u8 pixels, per Loader::fmt
};

struct Loader {
  std::vector<std::string> paths;
  int out_size;
  int fmt;  // 0 = float32 [0,1], 1 = uint8
  std::atomic<int> cursor{0};
  std::atomic<int> pending{0};

  std::mutex mu;
  std::condition_variable cv_pop, cv_push;
  std::deque<Item> queue;
  size_t max_queue;
  bool done = false;

  std::vector<std::thread> workers;

  size_t item_bytes() const {
    return size_t(out_size) * out_size * 3 * (fmt ? 1 : sizeof(float));
  }

  void worker() {
    for (;;) {
      int i = cursor.fetch_add(1);
      if (i >= int(paths.size())) break;
      Item item;
      item.index = i;
      item.bytes.resize(item_bytes());
      Image im;
      if (decode_file(paths[i].c_str(), &im)) {
        if (fmt)
          resize_to_u8(im, out_size, item.bytes.data());
        else
          resize_to_float(im, out_size,
                          reinterpret_cast<float*>(item.bytes.data()));
      } else {
        std::memset(item.bytes.data(), 0, item.bytes.size());
        item.index = -(i + 1);  // negative marks a decode failure
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < max_queue; });
      queue.push_back(std::move(item));
      cv_pop.notify_one();
    }
    if (pending.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lk(mu);
      done = true;
      cv_pop.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* hfl_create2(const char** paths, int n, int out_size, int threads,
                  int fmt) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->out_size = out_size;
  l->fmt = fmt ? 1 : 0;
  l->max_queue = size_t(threads) * 2 + 2;
  if (threads < 1) threads = 1;
  l->pending = threads;
  for (int t = 0; t < threads; ++t)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

void* hfl_create(const char** paths, int n, int out_size, int threads) {
  return hfl_create2(paths, n, out_size, threads, /*fmt=*/0);
}

int hfl_next_bytes(void* h, void* out, int* index) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_pop.wait(lk, [&] { return !l->queue.empty() || l->done; });
  if (l->queue.empty()) return 0;
  Item item = std::move(l->queue.front());
  l->queue.pop_front();
  l->cv_push.notify_one();
  lk.unlock();
  *index = item.index;
  std::memcpy(out, item.bytes.data(), item.bytes.size());
  return 1;
}

int hfl_next(void* h, float* out, int* index) {
  return hfl_next_bytes(h, out, index);
}

void hfl_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  l->cursor = int(l->paths.size());  // stop feeding
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->queue.clear();
    l->cv_push.notify_all();
  }
  for (auto& t : l->workers) t.join();
  delete l;
}

int hfl_load_one(const char* path, int out_size, float* out) {
  Image im;
  if (!decode_file(path, &im)) return 0;
  resize_to_float(im, out_size, out);
  return 1;
}

int hfl_load_one_u8(const char* path, int out_size, unsigned char* out) {
  Image im;
  if (!decode_file(path, &im)) return 0;
  resize_to_u8(im, out_size, out);
  return 1;
}

// In-memory HWC uint8 resize (the serving upload_res coercion hot path:
// utils/images.to_image_u8). Same Keys a=-0.75 separable kernel as the
// on-device resampler, so host-coerced inputs track the device bicubic
// where PIL's LANCZOS fallback substitutes a different filter.
int hfl_resize_u8(const unsigned char* in, int in_h, int in_w, int out_size,
                  unsigned char* out) {
  if (in_h <= 0 || in_w <= 0 || out_size <= 0) return 0;
  Image im;
  im.w = in_w;
  im.h = in_h;
  im.c = 3;
  im.data.assign(in, in + size_t(in_h) * in_w * 3);
  resize_to_u8(im, out_size, out);
  return 1;
}

}  // extern "C"
