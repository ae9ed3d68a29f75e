// frameproc — native host-side frame processing for the data pipeline.
//
// The reference feeds its trainers through decord (C++ decode) plus
// torchvision CPU transforms (SURVEY.md §2.6); the resize/normalize step is
// the host-side hot path that must keep TPUs fed (SURVEY.md hard part #6).
// This library provides the batched crop→bilinear-resize→normalize kernel as
// a multithreaded C++ routine with a C ABI, consumed from Python via ctypes
// (videotuna_tpu/data/native_loader.py). uint8 HWC frames in, float32
// [-1, 1] HWC out; one std::thread per slice of the batch.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no external deps)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

// Bilinear sample from a uint8 HWC image.
inline void sample_px(const uint8_t* img, int h, int w, int c,
                      float fy, float fx, float* out) {
  int y0 = static_cast<int>(fy);
  int x0 = static_cast<int>(fx);
  int y1 = std::min(y0 + 1, h - 1);
  int x1 = std::min(x0 + 1, w - 1);
  float ty = fy - y0;
  float tx = fx - x0;
  for (int ch = 0; ch < c; ++ch) {
    float v00 = img[(y0 * w + x0) * c + ch];
    float v01 = img[(y0 * w + x1) * c + ch];
    float v10 = img[(y1 * w + x0) * c + ch];
    float v11 = img[(y1 * w + x1) * c + ch];
    out[ch] = lerp(lerp(v00, v01, tx), lerp(v10, v11, tx), ty);
  }
}

// Center-crop-preserving-aspect + resize + normalize for one frame.
void process_frame(const uint8_t* src, int sh, int sw, int c,
                   float* dst, int dh, int dw) {
  // scale so the source covers the target, then center-crop
  float scale = std::max(static_cast<float>(dh) / sh,
                         static_cast<float>(dw) / sw);
  float src_h = dh / scale;
  float src_w = dw / scale;
  float y_off = (sh - src_h) * 0.5f;
  float x_off = (sw - src_w) * 0.5f;
  std::vector<float> px(c);
  for (int y = 0; y < dh; ++y) {
    float fy = y_off + (y + 0.5f) * src_h / dh - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    for (int x = 0; x < dw; ++x) {
      float fx = x_off + (x + 0.5f) * src_w / dw - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      sample_px(src, sh, sw, c, fy, fx, px.data());
      float* o = dst + (y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) o[ch] = px[ch] / 127.5f - 1.0f;
    }
  }
}

}  // namespace

extern "C" {

// Batched frames: src (n, sh, sw, c) uint8 → dst (n, dh, dw, c) float32.
// Frames are distributed over `threads` workers.
void frameproc_batch(const uint8_t* src, int n, int sh, int sw, int c,
                     float* dst, int dh, int dw, int threads) {
  if (threads < 1) threads = 1;
  threads = std::min(threads, n > 0 ? n : 1);
  const size_t src_stride = static_cast<size_t>(sh) * sw * c;
  const size_t dst_stride = static_cast<size_t>(dh) * dw * c;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += threads) {
        process_frame(src + i * src_stride, sh, sw, c,
                      dst + i * dst_stride, dh, dw);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// uint8 → float32 [-1,1] normalize only (no resize), multithreaded.
void frameproc_normalize(const uint8_t* src, int64_t count, float* dst,
                         int threads) {
  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  int64_t chunk = (count + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(count, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i)
        dst[i] = src[i] / 127.5f - 1.0f;
    });
  }
  for (auto& th : pool) th.join();
}

int frameproc_version() { return 1; }

}  // extern "C"
