// uvc_tpu native data-loader: threaded JPEG decode + train/eval transforms.
//
// The TPU-native framework's host-side runtime component: the reference
// leans on torchvision's C++ decode path via DataLoader workers
// (UVC/utils/data_utils.py); here the equivalent is a first-party C++
// pipeline exposed through a C ABI (loaded with ctypes — no pybind11
// dependency).  Per image: decode JPEG (libjpeg-turbo), apply either
//   train: RandomResizedCrop(size, scale=[0.08,1], ratio=[3/4,4/3])
//          + random horizontal flip            (data_utils.py:70-76)
//   eval:  resize shorter side to R + center crop (data_utils.py:92-100)
// with bilinear sampling, writing uint8 RGB [size, size, 3] into a caller
// buffer.  Work is distributed over a persistent thread pool via an
// atomic index; per-image failures (non-JPEG files) are reported in a
// status array so Python can fall back for those images only.
//
// Build: make -C native   (produces libuvc_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// rng (splitmix64 — deterministic per (seed, image))
// ---------------------------------------------------------------------------

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed + 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// ---------------------------------------------------------------------------
// jpeg decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to RGB8.  Returns false on any failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels, int* w,
                 int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  pixels->resize(size_t(*w) * *h * 3);
  const size_t stride = size_t(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// PIL-style antialiased crop-resample (separable filters).
// PIL/torchvision widens the filter support by the downscale factor
// (antialiasing); matching it keeps converted-checkpoint eval accuracy
// aligned with the reference input pipeline.  interp 0 = BILINEAR
// (triangle, support 1), 1 = BICUBIC (Catmull-Rom a=-0.5, support 2 —
// the DeiT recipe's training default, Baseline_pruning/datasets.py via
// timm create_transform interpolation='bicubic').
// ---------------------------------------------------------------------------

double triangle_filter(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double bicubic_filter(double x) {
  // PIL _imaging.c bicubic_filter, a = -0.5
  const double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  std::vector<float> weights;  // [out, kmax]
  std::vector<int> starts;     // [out]
  int kmax;
};

FilterTable build_filter(double origin, double span, int in_size,
                         int out_size, int interp) {
  const double base_support = interp == 1 ? 2.0 : 1.0;
  double (*filt)(double) = interp == 1 ? bicubic_filter : triangle_filter;
  const double scale = span / out_size;
  const double ss = std::max(1.0, scale);
  const double support = base_support * ss;
  const int kmax = (int)std::ceil(support * 2.0) + 2;
  FilterTable t;
  t.kmax = kmax;
  t.weights.assign(size_t(out_size) * kmax, 0.0f);
  t.starts.resize(out_size);
  for (int o = 0; o < out_size; ++o) {
    const double center = origin + (o + 0.5) * scale;
    int lo = (int)std::floor(center - support + 0.5);
    int hi = (int)std::ceil(center + support - 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size - 1);
    if (hi < lo) {
      lo = std::min(std::max((int)center, 0), in_size - 1);
      hi = lo;
    }
    t.starts[o] = lo;
    double total = 0.0;
    const int n = std::min(hi - lo + 1, kmax);
    for (int k = 0; k < n; ++k) {
      const double x = (lo + k + 0.5 - center) / ss;
      const double w = filt(x);
      t.weights[size_t(o) * kmax + k] = (float)w;
      total += w;
    }
    if (total != 0)
      for (int k = 0; k < n; ++k)
        t.weights[size_t(o) * kmax + k] /= (float)total;
  }
  return t;
}

void resample(const uint8_t* src, int sw, int sh, double x0, double y0,
              double cw, double ch, uint8_t* dst, int size, bool flip,
              int interp) {
  const FilterTable fx = build_filter(x0, cw, sw, size, interp);
  const FilterTable fy = build_filter(y0, ch, sh, size, interp);
  // horizontal pass over the rows the vertical pass will touch
  int row_lo = fy.starts[0];
  int row_hi = fy.starts[size - 1] + fy.kmax;
  row_hi = std::min(row_hi, sh);
  const int rows = row_hi - row_lo;
  std::vector<float> tmp(size_t(rows) * size * 3);
  for (int r = 0; r < rows; ++r) {
    const uint8_t* srow = src + size_t(row_lo + r) * sw * 3;
    float* trow = tmp.data() + size_t(r) * size * 3;
    for (int o = 0; o < size; ++o) {
      const int lo = fx.starts[o];
      const float* w = &fx.weights[size_t(o) * fx.kmax];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < fx.kmax; ++k) {
        const int ix = lo + k;
        if (ix >= sw) break;
        const float ww = w[k];
        if (ww == 0.0f) continue;
        const uint8_t* p = srow + size_t(ix) * 3;
        acc0 += ww * p[0];
        acc1 += ww * p[1];
        acc2 += ww * p[2];
      }
      trow[o * 3 + 0] = acc0;
      trow[o * 3 + 1] = acc1;
      trow[o * 3 + 2] = acc2;
    }
  }
  // vertical pass
  for (int oy = 0; oy < size; ++oy) {
    const int lo = fy.starts[oy];
    const float* w = &fy.weights[size_t(oy) * fy.kmax];
    for (int ox = 0; ox < size; ++ox) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < fy.kmax; ++k) {
        const int iy = lo + k;
        if (iy >= row_hi) break;
        const float ww = w[k];
        if (ww == 0.0f) continue;
        const float* p = tmp.data()
            + (size_t(iy - row_lo) * size + ox) * 3;
        acc0 += ww * p[0];
        acc1 += ww * p[1];
        acc2 += ww * p[2];
      }
      const int tx = flip ? (size - 1 - ox) : ox;
      uint8_t* out = dst + (size_t(oy) * size + tx) * 3;
      out[0] = (uint8_t)std::lround(std::min(255.f, std::max(0.f, acc0)));
      out[1] = (uint8_t)std::lround(std::min(255.f, std::max(0.f, acc1)));
      out[2] = (uint8_t)std::lround(std::min(255.f, std::max(0.f, acc2)));
    }
  }
}

// torchvision RandomResizedCrop parameter sampling (10 tries, then
// center-crop fallback)
void sample_rrc(Rng& rng, int w, int h, double* x0, double* y0, double* cw,
                double* ch) {
  const double area = double(w) * h;
  for (int i = 0; i < 10; ++i) {
    const double target = area * (0.08 + rng.uniform() * (1.0 - 0.08));
    const double lr = std::log(3.0 / 4.0), ur = std::log(4.0 / 3.0);
    const double ar = std::exp(lr + rng.uniform() * (ur - lr));
    const double cw_ = std::round(std::sqrt(target * ar));
    const double ch_ = std::round(std::sqrt(target / ar));
    if (cw_ > 0 && cw_ <= w && ch_ > 0 && ch_ <= h) {
      *x0 = std::floor(rng.uniform() * (w - cw_ + 1));
      *y0 = std::floor(rng.uniform() * (h - ch_ + 1));
      *cw = cw_;
      *ch = ch_;
      return;
    }
  }
  const double in_ratio = double(w) / h;
  if (in_ratio < 3.0 / 4.0) {
    *cw = w;
    *ch = std::round(w / (3.0 / 4.0));
  } else if (in_ratio > 4.0 / 3.0) {
    *ch = h;
    *cw = std::round(h * (4.0 / 3.0));
  } else {
    *cw = w;
    *ch = h;
  }
  *x0 = (w - *cw) / 2;
  *y0 = (h - *ch) / 2;
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }

  // Run fn(i) for i in [0, n) across the pool; blocks until done.
  // Whole jobs are serialized: ctypes releases the GIL, so two loaders
  // (train producer + a mid-epoch eval producer) can call in
  // concurrently; without job_mu_ the second call would overwrite
  // fn_/next_/total_/done_ while workers still run the first job.
  void parallel_for(int n, std::function<void(int)> fn) {
    std::lock_guard<std::mutex> job(job_mu_);
    std::unique_lock<std::mutex> lk(mu_);
    fn_ = std::move(fn);
    next_ = 0;
    total_ = n;
    done_ = 0;
    cv_.notify_all();
    done_cv_.wait(lk, [this] { return done_ == total_; });
    fn_ = nullptr;
  }

 private:
  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] {
          return stop_ || (fn_ && next_ < total_);
        });
        if (stop_) return;
        idx = next_++;
      }
      fn_(idx);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (++done_ == total_) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::mutex job_mu_;  // held for the duration of one parallel_for job
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::function<void(int)> fn_;
  int next_ = 0, total_ = 0, done_ = 0;
  bool stop_;
};

void load_one(const char* path, uint64_t seed, int size, bool train,
              int resize_to, int interp, uint8_t* out, int32_t* status) {
  std::vector<uint8_t> px;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &px, &w, &h) || w < 1 || h < 1) {
    *status = 1;  // caller falls back (non-JPEG / corrupt)
    return;
  }
  if (train) {
    Rng rng(seed);
    double x0, y0, cw, ch;
    sample_rrc(rng, w, h, &x0, &y0, &cw, &ch);
    const bool flip = rng.uniform() < 0.5;
    resample(px.data(), w, h, x0, y0, cw, ch, out, size, flip, interp);
  } else {
    // resize shorter side to resize_to, center crop size
    const double scale = double(resize_to) / std::min(w, h);
    const double cw = size / scale, ch = size / scale;
    const double x0 = (w - cw) / 2.0, y0 = (h - ch) / 2.0;
    resample(px.data(), w, h, x0, y0, cw, ch, out, size, false, interp);
  }
  *status = 0;
}

}  // namespace

extern "C" {

void* uvc_loader_create(int num_threads) {
  return new Pool(std::max(1, num_threads));
}

void uvc_loader_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// paths: n C strings; seeds: n uint64; out: n * size*size*3 uint8;
// status: n int32 (0 = ok, 1 = decode failed -> caller must fill that
// slot); interp: 0 = bilinear, 1 = bicubic (PIL-matched, antialiased)
void uvc_load_batch(void* pool, const char** paths, int n, int size,
                    int train, int resize_to, int interp,
                    const uint64_t* seeds, uint8_t* out, int32_t* status) {
  const size_t stride = size_t(size) * size * 3;
  static_cast<Pool*>(pool)->parallel_for(n, [&](int i) {
    load_one(paths[i], seeds ? seeds[i] : 0, size, train != 0, resize_to,
             interp, out + size_t(i) * stride, status + i);
  });
}

}  // extern "C"
