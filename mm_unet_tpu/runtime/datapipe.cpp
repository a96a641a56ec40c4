// Native host-side data pipeline for MM-UNet TPU.
//
// The reference feeds its trainer through torch's C++ DataLoader machinery
// plus PIL/cv2 native decode (SURVEY.md §2.5); this library is the TPU
// framework's native equivalent: a multithreaded batch-preparation engine
// doing the per-step host work — bilinear/nearest resize, flips, CutMix,
// ImageNet normalisation, label binarisation and NCHW batch assembly — on a
// std::thread pool, exposed to Python via a C ABI (ctypes; no pybind11).
//
// All buffers are float32, HWC for images, HW for labels. A deterministic
// per-sample RNG (splitmix64 seeded by (seed, epoch, index)) reproduces the
// same augmentation stream regardless of thread scheduling.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t s) : state(s) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int64_t randint(int64_t n) { return (int64_t)(uniform() * n); }
};

// Bilinear resize HWC float32, align_corners=false (PIL-like box positions
// use half-pixel centres; close enough to PIL BILINEAR for training data).
void resize_bilinear(const float* src, int sh, int sw, int c, float* dst,
                     int dh, int dw) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(y0 + 1, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(x0 + 1, sw - 1);
      const float* p00 = src + (y0c * sw + x0c) * c;
      const float* p01 = src + (y0c * sw + x1c) * c;
      const float* p10 = src + (y1c * sw + x0c) * c;
      const float* p11 = src + (y1c * sw + x1c) * c;
      float* out = dst + (y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        out[k] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

void resize_nearest(const float* src, int sh, int sw, int c, float* dst,
                    int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    int sy = std::min((int)((y + 0.5f) * sh / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min((int)((x + 0.5f) * sw / dw), sw - 1);
      std::memcpy(dst + (y * dw + x) * c, src + (sy * sw + sx) * c,
                  c * sizeof(float));
    }
  }
}

void flip_h(float* buf, int h, int w, int c) {
  std::vector<float> tmp(c);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w / 2; ++x) {
      float* a = buf + (y * w + x) * c;
      float* b = buf + (y * w + (w - 1 - x)) * c;
      std::memcpy(tmp.data(), a, c * sizeof(float));
      std::memcpy(a, b, c * sizeof(float));
      std::memcpy(b, tmp.data(), c * sizeof(float));
    }
}

void flip_v(float* buf, int h, int w, int c) {
  std::vector<float> tmp((size_t)w * c);
  size_t row = (size_t)w * c;
  for (int y = 0; y < h / 2; ++y) {
    float* a = buf + (size_t)y * row;
    float* b = buf + (size_t)(h - 1 - y) * row;
    std::memcpy(tmp.data(), a, row * sizeof(float));
    std::memcpy(a, b, row * sizeof(float));
    std::memcpy(b, tmp.data(), row * sizeof(float));
  }
}

struct Sample {
  const float* image;  // (H, W, 3)
  const float* label;  // (H, W)
  int h, w;
};

}  // namespace

extern "C" {

// Prepare one training batch:
//   images[i], labels[i]: pointers to RAM-resident HWC/HW float32 source data
//   hs/ws: per-sample source dims; idxs: dataset indices chosen by the host
//   out_img: (B, 3, S, S) f32; out_lbl: (B, 1, S, S) f32
//   flags: bit0 = train augmentations (flips), bit1 = cutmix
// Deterministic per (seed, epoch, position). Parallel over batch samples.
void mmu_prepare_batch(const float** images, const float** labels,
                       const int* hs, const int* ws, const int64_t* idxs,
                       int batch, int size, const float* mean,
                       const float* std_, uint64_t seed, uint64_t epoch,
                       int flags, const int64_t* mix_idxs, int n_total,
                       float* out_img, float* out_lbl) {
  int n_threads = std::min((int)std::thread::hardware_concurrency(), batch);
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);

  auto work = [&]() {
    std::vector<float> img_rs((size_t)size * size * 3);
    std::vector<float> lbl_rs((size_t)size * size);
    std::vector<float> img_src, lbl_src;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) break;
      int64_t id = idxs[i];
      SplitMix64 rng(seed * 0x9E3779B97F4A7C15ull + epoch * 0x2545F4914F6CDD1Dull +
                     (uint64_t)id + (uint64_t)i * 0x100000001B3ull);
      int h = hs[i], w = ws[i];
      img_src.assign(images[i], images[i] + (size_t)h * w * 3);
      lbl_src.assign(labels[i], labels[i] + (size_t)h * w);

      if (flags & 1) {
        bool fh = rng.uniform() < 0.5;
        bool fv = rng.uniform() < 0.5;
        if (fh) { flip_h(img_src.data(), h, w, 3); flip_h(lbl_src.data(), h, w, 1); }
        if (fv) { flip_v(img_src.data(), h, w, 3); flip_v(lbl_src.data(), h, w, 1); }
        if ((flags & 2) && rng.uniform() < 0.5 && mix_idxs) {
          // CutMix with a same-size donor (VesselLoader.py:42-100)
          int64_t j = mix_idxs[i];
          if (j >= 0 && j < n_total) {
            double lam = rng.uniform();
            float cut = std::sqrt(1.0f - (float)lam);
            int ch = (int)(h * cut), cw = (int)(w * cut);
            int cy = (int)rng.randint(h), cx = (int)rng.randint(w);
            int y1 = std::max(cy - ch / 2, 0), y2 = std::min(cy + ch / 2, h);
            int x1 = std::max(cx - cw / 2, 0), x2 = std::min(cx + cw / 2, w);
            // donor pointers come through images[batch + i] convention
            const float* dimg = images[batch + i];
            const float* dlbl = labels[batch + i];
            for (int y = y1; y < y2; ++y) {
              std::memcpy(&img_src[((size_t)y * w + x1) * 3],
                          &dimg[((size_t)y * w + x1) * 3],
                          (size_t)(x2 - x1) * 3 * sizeof(float));
              std::memcpy(&lbl_src[(size_t)y * w + x1],
                          &dlbl[(size_t)y * w + x1],
                          (size_t)(x2 - x1) * sizeof(float));
            }
          }
        }
      }

      resize_bilinear(img_src.data(), h, w, 3, img_rs.data(), size, size);
      resize_nearest(lbl_src.data(), h, w, 1, lbl_rs.data(), size, size);

      // normalise + NCHW scatter
      float* oi = out_img + (size_t)i * 3 * size * size;
      for (int k = 0; k < 3; ++k) {
        float m = mean[k], s = std_[k];
        float* plane = oi + (size_t)k * size * size;
        for (int p = 0; p < size * size; ++p)
          plane[p] = (img_rs[(size_t)p * 3 + k] - m) / s;
      }
      float* ol = out_lbl + (size_t)i * size * size;
      for (int p = 0; p < size * size; ++p) ol[p] = lbl_rs[p] > 0.5f ? 1.0f : 0.0f;
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
}

// Standalone primitives (tested against the numpy implementations).
void mmu_resize_bilinear(const float* src, int sh, int sw, int c, float* dst,
                         int dh, int dw) {
  resize_bilinear(src, sh, sw, c, dst, dh, dw);
}

void mmu_resize_nearest(const float* src, int sh, int sw, int c, float* dst,
                        int dh, int dw) {
  resize_nearest(src, sh, sw, c, dst, dh, dw);
}

int mmu_version() { return 1; }

}  // extern "C"
