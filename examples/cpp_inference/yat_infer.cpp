// Standalone native inference example: JPEG -> letterbox -> KServe-v2
// (Triton-compatible) HTTP inference -> NMS -> detections on stdout.
//
// Parity surface: the reference ships native example apps that reimplement
// the pre/post pipeline outside Python against a served/exported model
// (examples/YOLOv8-CPP-Inference, YOLOv8-ONNXRuntime-Rust). This is the
// TPU-deployment analog: the model runs behind a KServe-v2 endpoint (e.g.
// a TPU serving container; see yolo_ad_refine_tpu/utils/triton.py for the
// Python client) and the edge-side pipeline is pure C++ with no
// dependencies beyond libjpeg and POSIX sockets.
//
// Usage: yat_infer <host> <port> <model> <image.jpg> [imgsz=640] [conf=0.25]
//
// Protocol: KServe v2 REST binary tensors —
//   POST /v2/models/<model>/infer
//   body = JSON header + raw FP32 tensor bytes,
//   Inference-Header-Content-Length names the JSON prefix length.
// The response JSON is scanned with a minimal field parser (the v2 response
// schema is fixed; this is not a general JSON parser by design).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC, RGB
};

Image decode_jpeg(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  Image img;
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return img;
}

// Letterbox geometry identical to data/augment.py letterbox (scaleup=false,
// center padding, 114 fill) and csrc/yat_loader.cpp.
struct LetterboxMeta { float ratio, dw, dh; };

std::vector<float> letterbox_chw(const Image& img, int imgsz, LetterboxMeta* m) {
  float r = std::min(float(imgsz) / img.h, float(imgsz) / img.w);
  r = std::min(r, 1.0f);
  int nw = int(img.w * r + 0.5f), nh = int(img.h * r + 0.5f);
  float dw = (imgsz - nw) / 2.0f, dh = (imgsz - nh) / 2.0f;
  int left = int(dw - 0.1f + 0.5f), top = int(dh - 0.1f + 0.5f);
  m->ratio = r; m->dw = float(left); m->dh = float(top);

  std::vector<float> out(size_t(3) * imgsz * imgsz, 114.0f / 255.0f);
  for (int y = 0; y < nh; ++y) {
    // bilinear sample of the source row
    float sy = (y + 0.5f) / r - 0.5f;
    int y0 = std::max(0, std::min(img.h - 1, int(sy)));
    int y1 = std::min(img.h - 1, y0 + 1);
    float fy = std::max(0.0f, std::min(1.0f, sy - y0));
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) / r - 0.5f;
      int x0 = std::max(0, std::min(img.w - 1, int(sx)));
      int x1 = std::min(img.w - 1, x0 + 1);
      float fx = std::max(0.0f, std::min(1.0f, sx - x0));
      for (int c = 0; c < 3; ++c) {
        float v00 = img.rgb[(size_t(y0) * img.w + x0) * 3 + c];
        float v01 = img.rgb[(size_t(y0) * img.w + x1) * 3 + c];
        float v10 = img.rgb[(size_t(y1) * img.w + x0) * 3 + c];
        float v11 = img.rgb[(size_t(y1) * img.w + x1) * 3 + c];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        out[(size_t(c) * imgsz + (top + y)) * imgsz + (left + x)] = v / 255.0f;
      }
    }
  }
  return out;
}

// -- minimal HTTP over a blocking socket -----------------------------------

int dial(const char* host, int port) {
  addrinfo hints{}, *res;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  char ps[16];
  snprintf(ps, sizeof ps, "%d", port);
  if (getaddrinfo(host, ps, &hints, &res) != 0) { perror("getaddrinfo"); exit(1); }
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (connect(fd, res->ai_addr, res->ai_addrlen) != 0) { perror("connect"); exit(1); }
  freeaddrinfo(res);
  return fd;
}

void send_all(int fd, const char* p, size_t n) {
  while (n) {
    ssize_t k = write(fd, p, n);
    if (k <= 0) { perror("write"); exit(1); }
    p += k; n -= k;
  }
}

std::string recv_response(int fd) {
  std::string buf;
  char tmp[65536];
  // read headers
  while (buf.find("\r\n\r\n") == std::string::npos) {
    ssize_t k = read(fd, tmp, sizeof tmp);
    if (k <= 0) { fprintf(stderr, "short read\n"); exit(1); }
    buf.append(tmp, k);
  }
  size_t hdr_end = buf.find("\r\n\r\n") + 4;
  size_t cl_pos = buf.find("Content-Length:");
  if (cl_pos == std::string::npos) { fprintf(stderr, "no Content-Length\n"); exit(1); }
  size_t body_len = strtoul(buf.c_str() + cl_pos + 15, nullptr, 10);
  while (buf.size() < hdr_end + body_len) {
    ssize_t k = read(fd, tmp, sizeof tmp);
    if (k <= 0) { fprintf(stderr, "short body\n"); exit(1); }
    buf.append(tmp, k);
  }
  return buf;
}

// scan "<key>": <number> after `from` in the fixed v2 response schema
long scan_long(const std::string& s, const char* key, size_t from = 0) {
  size_t p = s.find(key, from);
  if (p == std::string::npos) return -1;
  p = s.find(':', p);
  return strtol(s.c_str() + p + 1, nullptr, 10);
}

// -- detection postprocess -------------------------------------------------

struct Det { float x1, y1, x2, y2, conf; int cls; };

float iou(const Det& a, const Det& b) {
  float ix1 = std::max(a.x1, b.x1), iy1 = std::max(a.y1, b.y1);
  float ix2 = std::min(a.x2, b.x2), iy2 = std::min(a.y2, b.y2);
  float iw = std::max(0.0f, ix2 - ix1), ih = std::max(0.0f, iy2 - iy1);
  float inter = iw * ih;
  float ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
  return ua > 0 ? inter / ua : 0.0f;
}

// preds laid out (1, 4+nc, n) like the exported eval head; greedy
// class-aware NMS, same semantics as ops/nms.py / csrc/yat_ops.cpp.
std::vector<Det> postprocess(const float* p, int no, int n, float conf_thres,
                             float iou_thres, const LetterboxMeta& m,
                             int w0, int h0) {
  int nc = no - 4;
  std::vector<Det> cand;
  for (int i = 0; i < n; ++i) {
    int best = 0;
    float bc = 0;
    for (int c = 0; c < nc; ++c) {
      float v = p[(4 + c) * n + i];
      if (v > bc) { bc = v; best = c; }
    }
    if (bc < conf_thres) continue;
    float cx = p[0 * n + i], cy = p[1 * n + i];
    float w = p[2 * n + i], h = p[3 * n + i];
    Det d{cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, bc, best};
    // undo letterbox
    d.x1 = (d.x1 - m.dw) / m.ratio; d.x2 = (d.x2 - m.dw) / m.ratio;
    d.y1 = (d.y1 - m.dh) / m.ratio; d.y2 = (d.y2 - m.dh) / m.ratio;
    d.x1 = std::max(0.0f, std::min(float(w0), d.x1));
    d.x2 = std::max(0.0f, std::min(float(w0), d.x2));
    d.y1 = std::max(0.0f, std::min(float(h0), d.y1));
    d.y2 = std::max(0.0f, std::min(float(h0), d.y2));
    cand.push_back(d);
  }
  std::sort(cand.begin(), cand.end(),
            [](const Det& a, const Det& b) { return a.conf > b.conf; });
  std::vector<Det> kept;
  for (const auto& d : cand) {
    bool ok = true;
    for (const auto& k : kept)
      if (k.cls == d.cls && iou(k, d) > iou_thres) { ok = false; break; }
    if (ok) kept.push_back(d);
  }
  return kept;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr,
            "usage: %s <host> <port> <model> <image.jpg> [imgsz=640] [conf=0.25]\n",
            argv[0]);
    return 2;
  }
  const char* host = argv[1];
  int port = atoi(argv[2]);
  std::string model = argv[3];
  const char* image = argv[4];
  int imgsz = argc > 5 ? atoi(argv[5]) : 640;
  float conf = argc > 6 ? atof(argv[6]) : 0.25f;

  Image img = decode_jpeg(image);
  LetterboxMeta meta;
  std::vector<float> input = letterbox_chw(img, imgsz, &meta);

  char jh[512];
  int jn = snprintf(jh, sizeof jh,
      "{\"inputs\":[{\"name\":\"images\",\"datatype\":\"FP32\","
      "\"shape\":[1,3,%d,%d],\"parameters\":{\"binary_data_size\":%zu}}],"
      "\"outputs\":[{\"name\":\"output0\",\"parameters\":{\"binary_data\":true}}]}",
      imgsz, imgsz, input.size() * sizeof(float));

  size_t body_len = jn + input.size() * sizeof(float);
  char req[1024];
  int rn = snprintf(req, sizeof req,
      "POST /v2/models/%s/infer HTTP/1.1\r\nHost: %s\r\n"
      "Content-Type: application/octet-stream\r\n"
      "Inference-Header-Content-Length: %d\r\n"
      "Content-Length: %zu\r\nConnection: close\r\n\r\n",
      model.c_str(), host, jn, body_len);

  int fd = dial(host, port);
  send_all(fd, req, rn);
  send_all(fd, jh, jn);
  send_all(fd, reinterpret_cast<const char*>(input.data()),
           input.size() * sizeof(float));
  std::string resp = recv_response(fd);
  close(fd);

  if (resp.compare(0, 12, "HTTP/1.1 200") != 0 &&
      resp.compare(0, 12, "HTTP/1.0 200") != 0) {
    fprintf(stderr, "server error:\n%.300s\n", resp.c_str());
    return 1;
  }
  size_t hdr_end = resp.find("\r\n\r\n") + 4;
  long jlen = scan_long(resp, "Inference-Header-Content-Length");
  std::string rjson = resp.substr(hdr_end, jlen);
  // fixed schema: single FP32 output, shape [1, no, n]
  size_t sh = rjson.find("\"shape\"");
  long d0 = scan_long(rjson, "[", sh);
  size_t comma1 = rjson.find(',', rjson.find('[', sh));
  long no = strtol(rjson.c_str() + comma1 + 1, nullptr, 10);
  size_t comma2 = rjson.find(',', comma1 + 1);
  long n = strtol(rjson.c_str() + comma2 + 1, nullptr, 10);
  (void)d0;
  const float* preds =
      reinterpret_cast<const float*>(resp.data() + hdr_end + jlen);

  std::vector<Det> dets =
      postprocess(preds, int(no), int(n), conf, 0.7f, meta, img.w, img.h);
  printf("%zu detections (%s %dx%d)\n", dets.size(), image, img.w, img.h);
  for (const auto& d : dets)
    printf("cls=%d conf=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n", d.cls, d.conf,
           d.x1, d.y1, d.x2, d.y2);
  return 0;
}
