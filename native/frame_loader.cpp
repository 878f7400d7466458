// Native asynchronous frame loader for the DF-VO TPU pipeline.
//
// The reference loads images synchronously on the Python hot loop
// (libs/general/utils.py read_image -> cv2.imread + resize, called from
// dfvo.py:289-297 every frame). This C++ loader is the TPU-native runtime
// equivalent: a worker pool decodes (libjpeg/libpng) and bilinearly resizes
// frames AHEAD of the tracker, so host decode overlaps device compute and
// the per-frame host cost collapses to a ring-buffer pop.
//
// C API (ctypes-friendly):
//   void* fl_create(const char** paths, int n, int out_h, int out_w,
//                   int n_threads, int queue_depth);
//   int   fl_next(void* h, unsigned char* out_rgb /* out_h*out_w*3 */);
//         -> frame index (>=0) or -1 at end / -2 on decode error
//   void  fl_destroy(void* h);
//
// Build: g++ -O3 -shared -fPIC -o libframe_loader.so frame_loader.cpp
//        -ljpeg -lpng -pthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // interleaved RGB
  bool ok = false;
};

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.c = 3;
  img.data.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_png(FILE* f) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.c = 3;
  img.data.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.data.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  Image img;
  if (!f) return img;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

// bilinear resize with half-pixel centers (cv2 INTER_LINEAR semantics)
void resize_bilinear(const Image& src, int out_h, int out_w, uint8_t* dst) {
  const double sx = double(src.w) / out_w;
  const double sy = double(src.h) / out_h;
  for (int y = 0; y < out_h; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = int(fy < 0 ? 0 : fy);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    double wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < out_w; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = int(fx < 0 ? 0 : fx);
      if (x0 > src.w - 1) x0 = src.w - 1;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      double wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = &src.data[(size_t(y0) * src.w + x0) * 3];
      const uint8_t* p01 = &src.data[(size_t(y0) * src.w + x1) * 3];
      const uint8_t* p10 = &src.data[(size_t(y1) * src.w + x0) * 3];
      const uint8_t* p11 = &src.data[(size_t(y1) * src.w + x1) * 3];
      uint8_t* out = dst + (size_t(y) * out_w + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        double v = (1 - wy) * ((1 - wx) * p00[ch] + wx * p01[ch]) +
                   wy * ((1 - wx) * p10[ch] + wx * p11[ch]);
        out[ch] = uint8_t(v + 0.5);
      }
    }
  }
}

struct Loader {
  std::vector<std::string> paths;
  int out_h, out_w, queue_depth;
  std::vector<std::thread> workers;
  std::atomic<int> next_job{0};
  std::atomic<bool> stop{false};

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for frames
  std::condition_variable cv_space;   // workers wait for queue space
  std::map<int, std::vector<uint8_t>> done;  // idx -> resized RGB (empty=err)
  int consume_idx = 0;

  void worker() {
    for (;;) {
      int idx = next_job.fetch_add(1);
      if (idx >= int(paths.size()) || stop.load()) return;
      Image img = decode_file(paths[idx]);
      std::vector<uint8_t> out;
      if (img.ok) {
        out.resize(size_t(out_h) * out_w * 3);
        resize_bilinear(img, out_h, out_w, out.data());
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || idx < consume_idx + queue_depth;
      });
      if (stop.load()) return;
      done.emplace(idx, std::move(out));
      cv_ready.notify_all();
    }
  }

  int next(uint8_t* out_rgb) {
    std::unique_lock<std::mutex> lk(mu);
    if (consume_idx >= int(paths.size())) return -1;
    int idx = consume_idx;
    cv_ready.wait(lk, [&] { return done.count(idx) > 0 || stop.load(); });
    if (stop.load()) return -1;
    auto it = done.find(idx);
    std::vector<uint8_t> data = std::move(it->second);
    done.erase(it);
    consume_idx++;
    cv_space.notify_all();
    if (data.empty()) return -2;
    std::memcpy(out_rgb, data.data(), data.size());
    return idx;
  }
};

}  // namespace

extern "C" {

void* fl_create(const char** paths, int n, int out_h, int out_w,
                int n_threads, int queue_depth) {
  Loader* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->out_h = out_h;
  l->out_w = out_w;
  l->queue_depth = queue_depth > 0 ? queue_depth : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

int fl_next(void* h, unsigned char* out_rgb) {
  return static_cast<Loader*>(h)->next(out_rgb);
}

void fl_destroy(void* h) {
  Loader* l = static_cast<Loader*>(h);
  l->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(l->mu);
  }
  l->cv_ready.notify_all();
  l->cv_space.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
