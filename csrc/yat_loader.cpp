// yat_loader: native threaded image loading for the yolo-ad-refine-tpu
// runtime.
//
// Parity rationale: the reference's input pipeline runs on torch DataLoader
// worker PROCESSES doing cv2 (C++) decode+resize (reference data/build.py:127
// build_dataloader, base.py:151 load_image). This build's Python loaders use
// threads under the GIL; the hot part — JPEG decode + letterbox — is
// implemented here natively with a std::thread pool over libjpeg, exposed
// through the same C-ABI/ctypes pattern as yat_ops.cpp.
//
// Letterbox matches data/augment.py letterbox exactly in geometry
// (r = min(s/h, s/w), round(w*r), pad split round(d-0.1)/round(d+0.1),
// value 114) with cv2-convention bilinear resample (half-pixel centers);
// pixel values may differ from cv2 by ±2 (cv2 uses fixed-point taps) —
// tolerance-tested from tests/test_native.py.
//
// Build: g++ -O3 -shared -fPIC yat_loader.cpp -o libyat_loader.so -ljpeg

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>  // needs <cstdio>/<cstddef> first (C header)

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC BGR
  int h = 0, w = 0;
  bool ok = false;
};

bool decode_jpeg(const char* path, Image& img) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr c) { longjmp(*(jmp_buf*)c->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.data.resize(size_t(img.h) * img.w * 3);
  std::vector<uint8_t> row(size_t(img.w) * 3);
  uint8_t* rp = row.data();
  for (int y = 0; y < img.h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = img.data.data() + size_t(y) * img.w * 3;
    for (int x = 0; x < img.w; ++x) {  // RGB -> BGR (cv2 convention)
      dst[3 * x + 0] = row[3 * x + 2];
      dst[3 * x + 1] = row[3 * x + 1];
      dst[3 * x + 2] = row[3 * x + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  img.ok = true;
  return true;
}

// bilinear resize, cv2 half-pixel convention: src = (dst + 0.5) * scale - 0.5
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float sy = float(sh) / dh, sx = float(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float ly = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* r0 = src + size_t(y0c) * sw * 3;
    const uint8_t* r1 = src + size_t(y1c) * sw * 3;
    uint8_t* out = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float lx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1), x1c = std::clamp(x0 + 1, 0, sw - 1);
      for (int ch = 0; ch < 3; ++ch) {
        float v = (1 - ly) * ((1 - lx) * r0[3 * x0c + ch] + lx * r0[3 * x1c + ch]) +
                  ly * ((1 - lx) * r1[3 * x0c + ch] + lx * r1[3 * x1c + ch]);
        out[3 * x + ch] = (uint8_t)std::lround(std::clamp(v, 0.0f, 255.0f));
      }
    }
  }
}

// letterbox into a square imgsz canvas (geometry = data/augment.py letterbox,
// scaleup=true, center=true, pad 114)
void letterbox(const Image& img, uint8_t* out, int imgsz, float* meta) {
  const float r = std::min(float(imgsz) / img.h, float(imgsz) / img.w);
  const int nw = (int)std::lround(img.w * r), nh = (int)std::lround(img.h * r);
  const float dw = (imgsz - nw) / 2.0f, dh = (imgsz - nh) / 2.0f;
  const int top = (int)std::lround(dh - 0.1f), left = (int)std::lround(dw - 0.1f);
  std::memset(out, 114, size_t(imgsz) * imgsz * 3);
  std::vector<uint8_t> resized(size_t(nh) * nw * 3);
  resize_bilinear(img.data.data(), img.h, img.w, resized.data(), nh, nw);
  for (int y = 0; y < nh; ++y) {
    std::memcpy(out + (size_t(top + y) * imgsz + left) * 3,
                resized.data() + size_t(y) * nw * 3, size_t(nw) * 3);
  }
  meta[0] = (float)img.h;
  meta[1] = (float)img.w;
  meta[2] = r;
  meta[3] = dw;
  meta[4] = dh;
}

struct Loader {
  std::vector<std::string> paths;
  int imgsz, batch;
  std::atomic<int> next_idx{0};
  std::vector<std::vector<uint8_t>> slots;     // letterboxed frames
  std::vector<std::vector<float>> metas;       // (5,) per frame
  std::vector<std::atomic<int>> done;          // 0 pending, 1 ok, -1 failed
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  int cursor = 0;  // next frame to hand out

  Loader(const char** p, int n, int s, int b, int threads)
      : paths(p, p + n), imgsz(s), batch(b), slots(n), metas(n), done(n) {
    for (auto& d : done) d.store(0);
    int nt = std::max(1, threads);
    for (int t = 0; t < nt; ++t)
      workers.emplace_back([this] { work(); });
  }

  void work() {
    for (;;) {
      int i = next_idx.fetch_add(1);
      if (i >= (int)paths.size()) return;
      Image img;
      int ok = decode_jpeg(paths[i].c_str(), img) ? 1 : -1;
      if (ok == 1) {
        slots[i].resize(size_t(imgsz) * imgsz * 3);
        metas[i].resize(5);
        letterbox(img, slots[i].data(), imgsz, metas[i].data());
      }
      {
        // Publish under the mutex: next() evaluates its wait predicate under
        // mu, so a store+notify outside the lock can land between the
        // predicate check and the block — a lost wakeup that hangs next()
        // forever if this was the last pending item.
        std::lock_guard<std::mutex> g(mu);
        done[i].store(ok);
      }
      cv.notify_all();
    }
  }

  int next(uint8_t* imgs, float* meta) {
    int count = 0;
    while (cursor < (int)paths.size() && count < batch) {
      int i = cursor;
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] { return done[i].load() != 0; });
      lk.unlock();
      if (done[i].load() == 1) {
        std::memcpy(imgs + size_t(count) * imgsz * imgsz * 3, slots[i].data(),
                    size_t(imgsz) * imgsz * 3);
        std::memcpy(meta + size_t(count) * 5, metas[i].data(), 5 * sizeof(float));
        ++count;
      }
      slots[i].clear();
      slots[i].shrink_to_fit();
      ++cursor;
    }
    return count;
  }

  ~Loader() {
    for (auto& w : workers) w.join();
  }
};

}  // namespace

extern "C" {

// Decode + letterbox a single image. out (imgsz, imgsz, 3) uint8 BGR,
// meta (5,) float32 = (h0, w0, ratio, dw, dh). Returns 0 ok / -1 fail.
int yat_load_image(const char* path, int imgsz, uint8_t* out, float* meta) {
  Image img;
  if (!decode_jpeg(path, img)) return -1;
  letterbox(img, out, imgsz, meta);
  return 0;
}

void* yat_loader_create(const char** paths, int n, int imgsz, int batch,
                        int threads) {
  return new Loader(paths, n, imgsz, batch, threads);
}

// Fills imgs (batch, imgsz, imgsz, 3) and meta (batch, 5); returns the
// number of frames delivered (0 = exhausted). Unreadable files are skipped.
int yat_loader_next(void* handle, uint8_t* imgs, float* meta) {
  return ((Loader*)handle)->next(imgs, meta);
}

void yat_loader_destroy(void* handle) { delete (Loader*)handle; }

}  // extern "C"
