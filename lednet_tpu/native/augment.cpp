// Native host-side augmentation core.
//
// The reference feeds its GPU through torch DataLoader worker *processes*
// running python transforms (SURVEY.md §3.1 "CPU-side hot path"). The
// TPU-native equivalent is this small C++ library: the geometric chain
// (bilinear resize -> crop -> horizontal flip) is fused into ONE memory pass
// per sample, labels ride the same pass with nearest sampling, and a
// std::thread pool assembles whole batches without the GIL. Exposed through
// a plain C ABI consumed via ctypes (lednet_tpu/native/__init__.py), with a
// pure-python fallback when the shared object is missing.
//
// Coordinate conventions match torch/cv2 half-pixel bilinear
// (src = (dst + 0.5) * scale - 0.5, clamped) so host and device resizes
// agree.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void run(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool(int n_threads) {
  static ThreadPool* p = new ThreadPool(n_threads > 0 ? n_threads : 4);
  return p;
}

inline float src_coord(int dst, double scale) {
  double s = (dst + 0.5) * scale - 0.5;
  return s < 0.0 ? 0.0f : static_cast<float>(s);
}

}  // namespace

extern "C" {

// Bilinear resize uint8 HWC (C<=4). Half-pixel convention, no antialias.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> wx(dw);
  for (int x = 0; x < dw; ++x) {
    float s = src_coord(x, scale_x);
    int i0 = std::min(static_cast<int>(s), sw - 1);
    x0[x] = i0;
    x1[x] = std::min(i0 + 1, sw - 1);
    wx[x] = s - i0;
  }
  for (int y = 0; y < dh; ++y) {
    float sy = src_coord(y, scale_y);
    int y0 = std::min(static_cast<int>(sy), sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = sy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * c;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = r0 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p01 = r0 + static_cast<size_t>(x1[x]) * c;
      const uint8_t* p10 = r1 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p11 = r1 + static_cast<size_t>(x1[x]) * c;
      float fx = wx[x];
      for (int k = 0; k < c; ++k) {
        float top = p00[k] + (p01[k] - p00[k]) * fx;
        float bot = p10[k] + (p11[k] - p10[k]) * fx;
        float v = top + (bot - top) * wy;
        out[static_cast<size_t>(x) * c + k] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Nearest resize uint8 HWC (labels): torch legacy floor(dst * scale).
void resize_nearest_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;
  std::vector<int> xs(dw);
  for (int x = 0; x < dw; ++x)
    xs[x] = std::min(static_cast<int>(x * scale_x), sw - 1);
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(static_cast<int>(y * scale_y), sh - 1);
    const uint8_t* row = src + static_cast<size_t>(sy) * sw * c;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x)
      std::memcpy(out + static_cast<size_t>(x) * c,
                  row + static_cast<size_t>(xs[x]) * c, c);
  }
}

// Fused: resize(sh,sw -> rh,rw) then crop [cy:cy+ch, cx:cx+cw] then
// optional horizontal flip — one pass, only crop pixels are computed.
void fused_resize_crop_flip_u8(const uint8_t* src, int sh, int sw, int c,
                               int rh, int rw, int cy, int cx, int ch, int cw,
                               int flip, int nearest, uint8_t* dst) {
  const double scale_y = static_cast<double>(sh) / rh;
  const double scale_x = static_cast<double>(sw) / rw;
  for (int y = 0; y < ch; ++y) {
    int ry = y + cy;
    uint8_t* out = dst + static_cast<size_t>(y) * cw * c;
    if (nearest) {
      int sy = std::min(static_cast<int>(ry * scale_y), sh - 1);
      const uint8_t* row = src + static_cast<size_t>(sy) * sw * c;
      for (int x = 0; x < cw; ++x) {
        int rx = flip ? (cx + cw - 1 - x) : (x + cx);
        int sx = std::min(static_cast<int>(rx * scale_x), sw - 1);
        std::memcpy(out + static_cast<size_t>(x) * c,
                    row + static_cast<size_t>(sx) * c, c);
      }
    } else {
      float sy = src_coord(ry, scale_y);
      int y0 = std::min(static_cast<int>(sy), sh - 1);
      int y1 = std::min(y0 + 1, sh - 1);
      float wy = sy - y0;
      const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * c;
      const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * c;
      for (int x = 0; x < cw; ++x) {
        int rx = flip ? (cx + cw - 1 - x) : (x + cx);
        float sx = src_coord(rx, scale_x);
        int x0 = std::min(static_cast<int>(sx), sw - 1);
        int x1 = std::min(x0 + 1, sw - 1);
        float fx = sx - x0;
        const uint8_t* p00 = r0 + static_cast<size_t>(x0) * c;
        const uint8_t* p01 = r0 + static_cast<size_t>(x1) * c;
        const uint8_t* p10 = r1 + static_cast<size_t>(x0) * c;
        const uint8_t* p11 = r1 + static_cast<size_t>(x1) * c;
        for (int k = 0; k < c; ++k) {
          float top = p00[k] + (p01[k] - p00[k]) * fx;
          float bot = p10[k] + (p11[k] - p10[k]) * fx;
          float v = top + (bot - top) * wy;
          out[static_cast<size_t>(x) * c + k] =
              static_cast<uint8_t>(v + 0.5f);
        }
      }
    }
  }
}

// Batched fused augmentation: each sample i has its own geometry params;
// dispatched onto the thread pool, blocking until the batch is assembled.
// srcs: array of pointers; params laid out per sample:
// [sh, sw, rh, rw, cy, cx, flip] ; output is (n, ch, cw, c) contiguous.
void batch_fused_augment_u8(const uint8_t** srcs, const int* params, int n,
                            int c, int ch, int cw, int nearest, uint8_t* dst,
                            int n_threads) {
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  ThreadPool* tp = pool(n_threads);
  for (int i = 0; i < n; ++i) {
    tp->run([&, i] {
      const int* p = params + i * 7;
      fused_resize_crop_flip_u8(srcs[i], p[0], p[1], c, p[2], p[3], p[4],
                                p[5], ch, cw, p[6], nearest,
                                dst + static_cast<size_t>(i) * ch * cw * c);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

}  // extern "C"
