// vkio: native input pipeline for vision-kit-tpu.
//
// The TPU eats batches far faster than a Python loop can decode and
// letterbox JPEGs (single-core host). This library owns the host hot path:
// JPEG/PNG decode -> letterbox resize/pad(114) -> NHWC uint8 write into a
// caller-provided batch buffer, parallelized with a persistent thread pool,
// with zero Python between stages. Exposed via a C ABI consumed with
// ctypes (vision_kit_tpu/data/native.py).
//
// The letterbox geometry matches vision_kit_tpu.ops.letterbox.letterbox_np
// exactly (ratio = min(dst/src), cv2 INTER_LINEAR, centered pad with the
// reference's +/-0.1 rounding, gray 114), so native and Python paths are
// interchangeable bit-for-bit.

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

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <cstdio>

namespace {

constexpr int kPadValue = 114;

// Python round() is round-half-to-EVEN (banker's); std::lround is
// half-away-from-zero. The letterbox new-size math must match
// letterbox_params (ops/letterbox.py:44) bit-for-bit, and .5 crossings
// are reachable (e.g. 957*0.5). nearbyint honors the default
// FE_TONEAREST mode = ties-to-even.
inline int RoundHalfEven(double x) {
  return static_cast<int>(std::nearbyint(x));
}

struct LetterboxInfo {
  float ratio;
  float dw;
  float dh;
  int ok;  // 1 = success, 0 = decode failure
  int h0;  // true source dims (pre-resize), for callers that rescale
  int w0;  // coords back to the original frame (serving)
};

// An image source: a filesystem path OR an in-memory encoded buffer
// (serving receives bytes over HTTP — no temp files on the hot path).
struct ByteSource {
  const char* path = nullptr;
  const uint8_t* data = nullptr;
  size_t len = 0;
};

cv::Mat ImDecodeSource(const ByteSource& src, int flag) {
  if (src.data != nullptr) {
    if (src.len == 0) return {};  // imdecode asserts on an empty buffer
    const cv::Mat raw(1, static_cast<int>(src.len), CV_8UC1,
                      const_cast<uint8_t*>(src.data));
    return cv::imdecode(raw, flag);  // imdecode does not mutate the buffer
  }
  return cv::imread(src.path, flag);
}

// ---------------------------------------------------------------------------
// Fast JPEG decode: DCT-domain reduced-scale decode (libjpeg 1/2,1/4,1/8)
// when the target ratio allows it. Decoding at 1/f scale skips ~f^2 of the
// IDCT + upsampling work, which dominates the single-core host input path
// (DESIGN.md "uncached ... JPEG decode bound"). The downstream geometry is
// unchanged: labels still scale by the TRUE source dims, read from the JPEG
// header without decoding. Files carrying an EXIF APP1 segment fall back to
// the exact path (cv::imread applies EXIF orientation, which the header
// probe would have to replicate; datasets with oriented phone JPEGs keep
// full fidelity). Mirrored bit-for-bit by the Python fallback
// (vision_kit_tpu/data/datasets.py _fast_decode_resized).
// ---------------------------------------------------------------------------

struct JpegProbe {
  int h0 = 0, w0 = 0;
  bool has_exif = false;
  bool ok = false;
};

// Scan JPEG markers for the frame dims (SOF) and EXIF presence (APP1).
JpegProbe ProbeJpegBuf(const uint8_t* buf, size_t n) {
  JpegProbe p;
  if (n < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return p;  // SOI
  size_t pos = 2;
  while (pos + 4 <= n) {
    if (buf[pos] != 0xFF) return p;  // desynced
    size_t m = pos + 1;
    while (m < n && buf[m] == 0xFF) ++m;  // fill bytes
    if (m >= n) return p;
    const uint8_t marker = buf[m];
    pos = m + 1;
    if (marker == 0xD8 || marker == 0x01 ||
        (marker >= 0xD0 && marker <= 0xD7)) {
      continue;  // standalone markers, no length
    }
    if (marker == 0xD9 || marker == 0xDA) return p;  // EOI / SOS: no SOF seen
    if (pos + 2 > n) return p;
    const size_t len = (static_cast<size_t>(buf[pos]) << 8) | buf[pos + 1];
    if (len < 2 || pos + len > n) return p;
    const uint8_t* payload = buf + pos + 2;
    const size_t plen = len - 2;
    if (marker == 0xE1 && plen >= 6 &&
        std::memcmp(payload, "Exif\0\0", 6) == 0) {
      p.has_exif = true;
    }
    // SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
    if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
        marker != 0xC8 && marker != 0xCC) {
      if (plen < 5) return p;
      p.h0 = (payload[1] << 8) | payload[2];
      p.w0 = (payload[3] << 8) | payload[4];
      p.ok = p.h0 > 0 && p.w0 > 0;
      return p;
    }
    pos += len;
  }
  return p;
}

JpegProbe ProbeSource(const ByteSource& src) {
  if (src.data != nullptr) {
    // Headers (APPn + quant/huffman + SOF) sit at the front; 256 KB covers
    // even large embedded thumbnails/ICC profiles. Not found => exact path.
    return ProbeJpegBuf(src.data, std::min(src.len, size_t{256 * 1024}));
  }
  JpegProbe p;
  FILE* f = std::fopen(src.path, "rb");
  if (!f) return p;
  std::vector<uint8_t> buf(256 * 1024);
  const size_t n = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return ProbeJpegBuf(buf.data(), n);
}

// Largest f in {8,4,2} whose reduced decode (ceil(dim/f), libjpeg scaled
// output) still covers the target size, i.e. only downscaling remains.
int PickReduceFactor(int h0, int w0, int new_h, int new_w) {
  for (int f : {8, 4, 2}) {
    if ((h0 + f - 1) / f >= new_h && (w0 + f - 1) / f >= new_w) return f;
  }
  return 1;
}

// Reduced-scale decode to exactly (new_h, new_w) BGR. Returns empty Mat when
// the fast path doesn't apply (wrong ratio, EXIF, probe/decode mismatch).
// h0/w0 out: true source dims from the header.
cv::Mat FastDecodeJpeg(const ByteSource& src, int max_h, int max_w,
                       bool truncate, int* h0_out, int* w0_out,
                       int* new_h_out, int* new_w_out) {
  const JpegProbe p = ProbeSource(src);
  if (!p.ok || p.has_exif) return {};
  const double r = std::min(static_cast<double>(max_h) / p.h0,
                            static_cast<double>(max_w) / p.w0);
  if (r >= 1.0) return {};
  // geometry of the exact paths: truncation for DecodeResize
  // (datasets.py int(w0*r)), rounding for DecodeLetterbox
  const int new_w = truncate ? static_cast<int>(p.w0 * r)
                             : RoundHalfEven(p.w0 * r);
  const int new_h = truncate ? static_cast<int>(p.h0 * r)
                             : RoundHalfEven(p.h0 * r);
  const int f = PickReduceFactor(p.h0, p.w0, new_h, new_w);
  if (f < 2) return {};
  const int flag = f == 8 ? cv::IMREAD_REDUCED_COLOR_8
                 : f == 4 ? cv::IMREAD_REDUCED_COLOR_4
                          : cv::IMREAD_REDUCED_COLOR_2;
  cv::Mat bgr = ImDecodeSource(src, flag);
  // validate the probe against libjpeg's ceil(dim/f) scaled output
  if (bgr.empty() || bgr.rows != (p.h0 + f - 1) / f ||
      bgr.cols != (p.w0 + f - 1) / f) {
    return {};
  }
  if (bgr.cols != new_w || bgr.rows != new_h) {
    cv::Mat resized;
    cv::resize(bgr, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
    bgr = resized;
  }
  *h0_out = p.h0;
  *w0_out = p.w0;
  *new_h_out = new_h;
  *new_w_out = new_w;
  return bgr;
}

// One image: decode source -> letterboxed RGB uint8 into out
// (dst_h*dst_w*3).
LetterboxInfo DecodeLetterboxImpl(const ByteSource& src, int dst_h,
                                  int dst_w, uint8_t* out, bool fast) {
  LetterboxInfo info{0.f, 0.f, 0.f, 0, 0, 0};
  cv::Mat resized;  // RGB at (new_h, new_w)
  int h = 0, w = 0, new_h = 0, new_w = 0;
  if (fast) {
    cv::Mat bgr = FastDecodeJpeg(src, dst_h, dst_w, /*truncate=*/false,
                                 &h, &w, &new_h, &new_w);
    if (!bgr.empty()) cv::cvtColor(bgr, resized, cv::COLOR_BGR2RGB);
  }
  if (resized.empty()) {
    cv::Mat bgr = ImDecodeSource(src, cv::IMREAD_COLOR);
    if (bgr.empty()) {
      std::memset(out, kPadValue, static_cast<size_t>(dst_h) * dst_w * 3);
      return info;
    }
    cv::Mat rgb;
    cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);

    h = rgb.rows;
    w = rgb.cols;
    const double r = std::min(static_cast<double>(dst_h) / h,
                              static_cast<double>(dst_w) / w);
    new_w = RoundHalfEven(w * r);
    new_h = RoundHalfEven(h * r);
    if (new_w != w || new_h != h) {
      cv::resize(rgb, resized, cv::Size(new_w, new_h), 0, 0,
                 cv::INTER_LINEAR);
    } else {
      resized = rgb;
    }
  }
  const double ratio =
      std::min(static_cast<double>(dst_h) / h, static_cast<double>(dst_w) / w);

  const double dw = (dst_w - new_w) / 2.0;
  const double dh = (dst_h - new_h) / 2.0;
  const int top = RoundHalfEven(dh - 0.1);
  const int left = RoundHalfEven(dw - 0.1);

  cv::Mat canvas(dst_h, dst_w, CV_8UC3, out);
  canvas.setTo(cv::Scalar(kPadValue, kPadValue, kPadValue));
  resized.copyTo(canvas(cv::Rect(left, top, new_w, new_h)));

  info.ratio = static_cast<float>(ratio);
  info.dw = static_cast<float>(dw);
  info.dh = static_cast<float>(dh);
  info.ok = 1;
  info.h0 = h;
  info.w0 = w;
  return info;
}

// Exception firewall: a cv::Exception escaping the C ABI (or a thread-pool
// worker) would std::terminate the embedding process — a single malformed
// request must never kill a serving daemon. Failures report ok=0.
LetterboxInfo DecodeLetterbox(const ByteSource& src, int dst_h, int dst_w,
                              uint8_t* out, bool fast) {
  try {
    return DecodeLetterboxImpl(src, dst_h, dst_w, out, fast);
  } catch (...) {  // ANY escape aborts the process; catch-all is the point
    std::memset(out, kPadValue, static_cast<size_t>(dst_h) * dst_w * 3);
    return LetterboxInfo{0.f, 0.f, 0.f, 0, 0, 0};
  }
}

// One image: decode path -> min-ratio resize (NO pad) into out
// (max_h*max_w*3, row-major on the full max_w stride is NOT used — the
// resized image is written packed at its own h*w*3 stride so the caller
// can view it as (h, w, 3)). Geometry matches the Python datasets'
// `_decode_resized` exactly: ratio = min(max/src), new size via C-style
// truncation of w*r / h*r (datasets.py:217-227), cv2 INTER_LINEAR.
// meta: [h, w, h0, w0, ok] int32.
void DecodeResizeImpl(const ByteSource& src, int max_h, int max_w,
                      uint8_t* out, int32_t* meta, bool fast) {
  meta[0] = meta[1] = meta[2] = meta[3] = meta[4] = 0;
  if (fast) {
    int h0 = 0, w0 = 0, new_h = 0, new_w = 0;
    cv::Mat bgr = FastDecodeJpeg(src, max_h, max_w, /*truncate=*/true,
                                 &h0, &w0, &new_h, &new_w);
    if (!bgr.empty()) {
      cv::Mat rgb(new_h, new_w, CV_8UC3, out);
      cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
      meta[0] = new_h;
      meta[1] = new_w;
      meta[2] = h0;
      meta[3] = w0;
      meta[4] = 1;
      return;
    }
  }
  cv::Mat bgr = ImDecodeSource(src, cv::IMREAD_COLOR);
  if (bgr.empty()) return;
  const int h0 = bgr.rows, w0 = bgr.cols;
  const double r = std::min(static_cast<double>(max_h) / h0,
                            static_cast<double>(max_w) / w0);
  // Python: int(w0 * r) — truncation, not rounding
  const int new_w = (r != 1.0) ? static_cast<int>(w0 * r) : w0;
  const int new_h = (r != 1.0) ? static_cast<int>(h0 * r) : h0;
  cv::Mat rgb(new_h, new_w, CV_8UC3, out);
  if (r != 1.0) {
    cv::Mat resized;
    cv::resize(bgr, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
    cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  } else {
    cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  }
  meta[0] = new_h;
  meta[1] = new_w;
  meta[2] = h0;
  meta[3] = w0;
  meta[4] = 1;
}

// Exception firewall (see DecodeLetterbox): failures report meta ok=0.
void DecodeResize(const ByteSource& src, int max_h, int max_w, uint8_t* out,
                  int32_t* meta, bool fast) {
  try {
    DecodeResizeImpl(src, max_h, max_w, out, meta, fast);
  } catch (...) {
    meta[0] = meta[1] = meta[2] = meta[3] = meta[4] = 0;
  }
}

// Persistent thread pool (created once; survives across batch calls).
class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      threads_.emplace_back([this] { Loop(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      work_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !work_.empty(); });
        if (stop_ && work_.empty()) return;
        fn = std::move(work_.front());
        work_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> work_;
  std::vector<std::thread> threads_;
  bool stop_;
};

Pool* GlobalPool(int threads) {
  static Pool* pool = new Pool(threads > 0 ? threads : 4);
  return pool;
}

}  // namespace

extern "C" {

// ABI version: bump whenever an exported signature changes so the Python
// bindings can detect (and rebuild past) a stale .so. v2: `fast` param.
// v3: vkio_decode_letterbox_mem (decode from an in-memory buffer).
int vkio_abi_version() { return 3; }

// Decode + letterbox a single image. out: dst_h*dst_w*3 uint8 (RGB).
// info_out: [ratio, dw, dh, ok] floats. fast: reduced-scale JPEG decode
// when applicable (see FastDecodeJpeg). Returns 0 on success.
int vkio_decode_letterbox(const char* path, int dst_h, int dst_w,
                          uint8_t* out, float* info_out, int fast) {
  LetterboxInfo info =
      DecodeLetterbox(ByteSource{path}, dst_h, dst_w, out, fast != 0);
  info_out[0] = info.ratio;
  info_out[1] = info.dw;
  info_out[2] = info.dh;
  info_out[3] = static_cast<float>(info.ok);
  return info.ok ? 0 : 1;
}

// Decode + letterbox from an in-memory encoded image (the serving path:
// request bytes never touch the filesystem). hw0_out: [h0, w0] int32 true
// source dims (for rescaling detections to the client's frame).
// Returns 0 on success.
int vkio_decode_letterbox_mem(const uint8_t* data, int64_t len, int dst_h,
                              int dst_w, uint8_t* out, float* info_out,
                              int32_t* hw0_out, int fast) {
  ByteSource src;
  src.data = data;
  src.len = static_cast<size_t>(len);
  LetterboxInfo info = DecodeLetterbox(src, dst_h, dst_w, out, fast != 0);
  info_out[0] = info.ratio;
  info_out[1] = info.dw;
  info_out[2] = info.dh;
  info_out[3] = static_cast<float>(info.ok);
  hw0_out[0] = info.h0;
  hw0_out[1] = info.w0;
  return info.ok ? 0 : 1;
}

// Decode + letterbox a batch in parallel.
// paths: array of n C strings. out: n*dst_h*dst_w*3 uint8.
// infos: n*4 floats [ratio, dw, dh, ok]. threads<=0 -> default pool.
// Returns the number of failed decodes.
int vkio_decode_letterbox_batch(const char** paths, int n, int dst_h,
                                int dst_w, uint8_t* out, float* infos,
                                int threads, int fast) {
  Pool* pool = GlobalPool(threads);
  std::atomic<int> remaining(n);
  std::atomic<int> failures(0);
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t img_bytes = static_cast<size_t>(dst_h) * dst_w * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      LetterboxInfo info =
          DecodeLetterbox(ByteSource{paths[i]}, dst_h, dst_w,
                          out + i * img_bytes, fast != 0);
      infos[i * 4 + 0] = info.ratio;
      infos[i * 4 + 1] = info.dw;
      infos[i * 4 + 2] = info.dh;
      infos[i * 4 + 3] = static_cast<float>(info.ok);
      if (!info.ok) failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// Decode + min-ratio resize (no pad) a single image.
// out: max_h*max_w*3 uint8, written packed at the resized (h, w, 3) shape.
// meta: [h, w, h0, w0, ok] int32. Returns 0 on success.
int vkio_decode_resize(const char* path, int max_h, int max_w, uint8_t* out,
                       int32_t* meta, int fast) {
  DecodeResize(ByteSource{path}, max_h, max_w, out, meta, fast != 0);
  return meta[4] ? 0 : 1;
}

// Decode + min-ratio resize a batch in parallel.
// out: n*max_h*max_w*3 uint8 (each image packed within its own slot).
// metas: n*5 int32 [h, w, h0, w0, ok]. Returns the number of failures.
int vkio_decode_resize_batch(const char** paths, int n, int max_h, int max_w,
                             uint8_t* out, int32_t* metas, int threads,
                             int fast) {
  Pool* pool = GlobalPool(threads);
  std::atomic<int> remaining(n);
  std::atomic<int> failures(0);
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t img_bytes = static_cast<size_t>(max_h) * max_w * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      DecodeResize(ByteSource{paths[i]}, max_h, max_w,
                   out + i * img_bytes, metas + i * 5, fast != 0);
      if (!metas[i * 5 + 4]) failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

}  // extern "C"
