// vpt_io: native frame-ingestion runtime for the streaming pipeline (B12).
//
// The reference has no native code at all (SURVEY.md §2.1); this library is
// the TPU-framework-native equivalent of the host-side data loaders that
// GPU trackers implement in C++: a GIL-free producer that keeps a
// double/triple-buffered ring of decoded frames ahead of the device step.
// At 4K@60fps (BASELINE.md eval config 5) a frame is ~24 MB — a Python
// generator thread holding the GIL while memcpy-ing 1.5 GB/s starves the
// dispatch thread; this producer runs on pthreads and hands Python
// zero-copy pointers into the ring.
//
// Two sources, one ring interface:
//   * raw file  — mmap'ed packed RGB24 [T, H, W, 3] (tools/to_raw.py
//     converts any video/images to this layout)
//   * synthetic — procedural moving-target clip generated in-place
//     (C++ port of io/synthetic.py's moving-square, for benchmarking the
//     pipeline without disk I/O)
//
// C ABI only — bound from Python with ctypes (io/native.py). Build:
//   make -C native   ->  native/libvpt_io.so

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Frame {
  std::vector<uint8_t> data;
  int64_t index = -1;
  bool ready = false;
};

// Bounded ring of prefetched frames: one producer thread fills slots in
// order; the consumer takes them in order. Classic double buffering with
// depth N (SURVEY.md §1.2 "double-buffered H2D transfer" — this is the host
// half; jax.device_put's async copy is the device half).
struct Ring {
  explicit Ring(int depth, size_t frame_bytes) : slots(depth) {
    for (auto &s : slots) s.data.resize(frame_bytes);
  }
  std::vector<Frame> slots;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  int64_t next_fill = 0;   // next frame index the producer will write
  int64_t next_take = 0;   // next frame index the consumer will read
  bool done = false;
};

struct Source {
  int64_t num_frames = 0;
  int height = 0, width = 0;
  size_t frame_bytes = 0;

  // raw file source
  uint8_t *map = nullptr;
  size_t map_len = 0;

  // synthetic source
  bool synthetic = false;
  std::vector<uint8_t> background;  // H*W*3, pre-clamped
  std::vector<uint8_t> pattern;     // th*tw*3, pre-clamped
  int tw = 0, th = 0;
  float cx0 = 0, cy0 = 0, speed = 0, amp = 0;

  // streaming
  Ring *ring = nullptr;
  std::thread producer;
  std::atomic<bool> stop{false};
};

void synth_frame(const Source &s, int64_t t, uint8_t *out) {
  const int h = s.height, w = s.width;
  // background (precomputed float -> u8 clamp); target painted over it.
  float cx = s.cx0 + s.speed * static_cast<float>(t);
  float cy = s.cy0 + s.amp * std::sin(2.0f * static_cast<float>(M_PI) *
                                      static_cast<float>(t) /
                                      std::max<int64_t>(30, s.num_frames));
  float margin = static_cast<float>(std::max(s.tw, s.th));
  cx = std::fmin(std::fmax(cx, margin), static_cast<float>(w) - margin);
  cy = std::fmin(std::fmax(cy, margin), static_cast<float>(h) - margin);

  // Background is pre-clamped uint8: one memcpy per frame.
  std::memcpy(out, s.background.data(), s.frame_bytes);
  int x0 = static_cast<int>(std::lround(cx - s.tw / 2.0));
  int y0 = static_cast<int>(std::lround(cy - s.th / 2.0));
  for (int py = 0; py < s.th; ++py) {
    int y = y0 + py;
    if (y < 0 || y >= h) continue;
    for (int px = 0; px < s.tw; ++px) {
      int x = x0 + px;
      if (x < 0 || x >= w) continue;
      const uint8_t *src = &s.pattern[(py * s.tw + px) * 3];
      uint8_t *dst = &out[(static_cast<size_t>(y) * w + x) * 3];
      dst[0] = src[0];
      dst[1] = src[1];
      dst[2] = src[2];
    }
  }
}

void fill_frame(const Source &s, int64_t idx, uint8_t *out) {
  if (s.synthetic) {
    synth_frame(s, idx, out);
  } else {
    std::memcpy(out, s.map + static_cast<size_t>(idx) * s.frame_bytes,
                s.frame_bytes);
  }
}

void producer_main(Source *s) {
  Ring &r = *s->ring;
  const int depth = static_cast<int>(r.slots.size());
  while (!s->stop.load(std::memory_order_relaxed)) {
    std::unique_lock<std::mutex> lk(r.mu);
    if (r.next_fill >= s->num_frames) {
      r.done = true;
      r.cv_consume.notify_all();
      return;
    }
    // Backpressure: wait until the slot for next_fill is free.
    r.cv_produce.wait(lk, [&] {
      return s->stop.load(std::memory_order_relaxed) ||
             r.next_fill - r.next_take < depth;
    });
    if (s->stop.load(std::memory_order_relaxed)) return;
    int64_t idx = r.next_fill;
    Frame &slot = r.slots[idx % depth];
    lk.unlock();
    fill_frame(*s, idx, slot.data.data());  // heavy work outside the lock
    lk.lock();
    slot.index = idx;
    slot.ready = true;
    r.next_fill = idx + 1;
    r.cv_consume.notify_all();
  }
}

}  // namespace

extern "C" {

// ---- lifecycle -----------------------------------------------------------

// Open an mmap'ed packed-RGB24 raw clip: file holds T*H*W*3 bytes.
void *vpt_open_raw(const char *path, int64_t num_frames, int height,
                   int width) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  auto *s = new Source();
  s->height = height;
  s->width = width;
  s->frame_bytes = static_cast<size_t>(height) * width * 3;
  int64_t avail = st.st_size / static_cast<int64_t>(s->frame_bytes);
  s->num_frames = num_frames > 0 ? std::min(num_frames, avail) : avail;
  s->map_len = st.st_size;
  s->map = static_cast<uint8_t *>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  ::close(fd);
  if (s->map == MAP_FAILED) {
    delete s;
    return nullptr;
  }
  madvise(s->map, s->map_len, MADV_SEQUENTIAL);
  return s;
}

// Open a procedural clip (C++ port of io/synthetic.py "moving-square":
// low-frequency textured background + radial-gradient target).
void *vpt_open_synthetic(int64_t num_frames, int height, int width,
                         uint64_t seed) {
  auto *s = new Source();
  s->synthetic = true;
  s->num_frames = num_frames;
  s->height = height;
  s->width = width;
  s->frame_bytes = static_cast<size_t>(height) * width * 3;

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> uni(40.0f, 200.0f);
  int gh = height / 16 + 2, gw = width / 16 + 2;
  std::vector<float> small(static_cast<size_t>(gh) * gw * 3);
  for (auto &v : small) v = uni(rng);
  s->background.resize(s->frame_bytes);
  for (int y = 0; y < height; ++y) {
    float fy = static_cast<float>(y) / height * (gh - 1.001f);
    int y0 = static_cast<int>(fy);
    float wy = fy - y0;
    for (int x = 0; x < width; ++x) {
      float fx = static_cast<float>(x) / width * (gw - 1.001f);
      int x0 = static_cast<int>(fx);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        auto at = [&](int yy, int xx) {
          return small[(static_cast<size_t>(yy) * gw + xx) * 3 + c];
        };
        float v = at(y0, x0) * (1 - wy) * (1 - wx) +
                  at(y0, x0 + 1) * (1 - wy) * wx +
                  at(y0 + 1, x0) * wy * (1 - wx) +
                  at(y0 + 1, x0 + 1) * wy * wx;
        v = v < 0 ? 0 : (v > 255 ? 255 : v);
        s->background[(static_cast<size_t>(y) * width + x) * 3 + c] =
            static_cast<uint8_t>(v);
      }
    }
  }

  float scale = std::min(height, width) / 224.0f;
  s->tw = s->th = std::max(8, static_cast<int>(32 * scale));
  s->pattern.resize(static_cast<size_t>(s->tw) * s->th * 3);
  for (int py = 0; py < s->th; ++py) {
    float ry = (py - (s->th - 1) / 2.0f) / (s->th / 2.0f);
    for (int px = 0; px < s->tw; ++px) {
      float rx = (px - (s->tw - 1) / 2.0f) / (s->tw / 2.0f);
      float r = std::sqrt(rx * rx + ry * ry);
      float core = std::fmax(0.0f, 1.0f - r);
      uint8_t *p = &s->pattern[(static_cast<size_t>(py) * s->tw + px) * 3];
      p[0] = static_cast<uint8_t>(40 + 215 * core);
      p[1] = static_cast<uint8_t>(30 + 120 * core * core);
      p[2] = static_cast<uint8_t>(200 * std::fmin(std::fmax(r - 0.3f, 0.0f), 1.0f));
    }
  }
  s->cx0 = width * 0.35f;
  s->cy0 = height * 0.4f;
  s->speed = 2.0f * scale;
  s->amp = height * 0.12f;
  return s;
}

int64_t vpt_num_frames(void *h) { return static_cast<Source *>(h)->num_frames; }
int64_t vpt_frame_bytes(void *h) {
  return static_cast<int64_t>(static_cast<Source *>(h)->frame_bytes);
}

// Ground-truth target center for synthetic clips (x, y into out[2]).
void vpt_synth_truth(void *h, int64_t t, float *out) {
  auto *s = static_cast<Source *>(h);
  float cx = s->cx0 + s->speed * static_cast<float>(t);
  float cy = s->cy0 + s->amp * std::sin(2.0f * static_cast<float>(M_PI) *
                                        static_cast<float>(t) /
                                        std::max<int64_t>(30, s->num_frames));
  float margin = static_cast<float>(std::max(s->tw, s->th));
  out[0] = std::fmin(std::fmax(cx, margin), s->width - margin);
  out[1] = std::fmin(std::fmax(cy, margin), s->height - margin);
}

void vpt_synth_init_bbox(void *h, float *out4) {
  auto *s = static_cast<Source *>(h);
  float c[2];
  vpt_synth_truth(h, 0, c);
  out4[0] = c[0] - s->tw / 2.0f;
  out4[1] = c[1] - s->th / 2.0f;
  out4[2] = static_cast<float>(s->tw);
  out4[3] = static_cast<float>(s->th);
}

// Synchronous single-frame read (no ring) — for random access / tests.
int vpt_read_frame(void *h, int64_t idx, uint8_t *out) {
  auto *s = static_cast<Source *>(h);
  if (idx < 0 || idx >= s->num_frames) return -1;
  fill_frame(*s, idx, out);
  return 0;
}

// Composited value of one integer pixel (background + target overlay) for
// synthetic sources, or the raw mapped pixel — shared by the bilinear view
// sampler below. x/y must be in-bounds.
inline const uint8_t *pixel_at(const Source &s, const uint8_t *base, int tx0,
                               int ty0, int x, int y) {
  if (s.synthetic) {
    const int px = x - tx0, py = y - ty0;
    if (px >= 0 && px < s.tw && py >= 0 && py < s.th)
      return &s.pattern[(static_cast<size_t>(py) * s.tw + px) * 3];
  }
  return base + (static_cast<size_t>(y) * s.width + x) * 3;
}

// Strided rectangle read WITHOUT materializing the frame — the host half of
// ROI-only streaming (runtime/streaming.py RoiShipper). The device step only
// samples a search window around the target, so the ingestion runtime hands
// out exactly that window: for raw sources a strided gather from the mmap
// (touches rect bytes, not frame bytes); for synthetic sources the rect is
// composited directly (background + target overlap). out must hold
// ceil(h/stride) * ceil(w/stride) * 3 bytes.
int vpt_read_rect(void *h, int64_t idx, int x0, int y0, int w, int hh,
                  int stride, uint8_t *out) {
  auto *s = static_cast<Source *>(h);
  if (idx < 0 || idx >= s->num_frames || stride < 1) return -1;
  if (x0 < 0 || y0 < 0 || x0 + w > s->width || y0 + hh > s->height) return -1;
  const int ow = (w + stride - 1) / stride;
  const int oh = (hh + stride - 1) / stride;
  const int64_t W = s->width;

  // Target placement for synthetic compositing (mirrors synth_frame).
  int tx0 = 0, ty0 = 0;
  if (s->synthetic) {
    float c[2];
    vpt_synth_truth(h, idx, c);
    tx0 = static_cast<int>(std::lround(c[0] - s->tw / 2.0));
    ty0 = static_cast<int>(std::lround(c[1] - s->th / 2.0));
  }
  const uint8_t *base =
      s->synthetic ? s->background.data()
                   : s->map + static_cast<size_t>(idx) * s->frame_bytes;

  for (int r = 0; r < oh; ++r) {
    const int y = y0 + r * stride;
    const uint8_t *row = base + (static_cast<size_t>(y) * W + x0) * 3;
    uint8_t *dst = out + static_cast<size_t>(r) * ow * 3;
    if (stride == 1) {
      std::memcpy(dst, row, static_cast<size_t>(ow) * 3);
    } else {
      for (int cidx = 0; cidx < ow; ++cidx) {
        const uint8_t *p = row + static_cast<size_t>(cidx) * stride * 3;
        dst[cidx * 3 + 0] = p[0];
        dst[cidx * 3 + 1] = p[1];
        dst[cidx * 3 + 2] = p[2];
      }
    }
    if (s->synthetic) {
      const int py = y - ty0;  // pattern row intersecting this output row
      if (py >= 0 && py < s->th) {
        for (int cidx = 0; cidx < ow; ++cidx) {
          const int px = x0 + cidx * stride - tx0;
          if (px < 0 || px >= s->tw) continue;
          const uint8_t *p = &s->pattern[(static_cast<size_t>(py) * s->tw + px) * 3];
          dst[cidx * 3 + 0] = p[0];
          dst[cidx * 3 + 1] = p[1];
          dst[cidx * 3 + 2] = p[2];
        }
      }
    }
  }
  return 0;
}

// Bilinear-resampled square view: out[j, i] = frame sampled at
// (ox + i*stride, oy + j*stride), stride fractional, edge-clamped taps.
// This is the "ship exactly what the device samples" ingest path: the
// device's window resample reads a ~224px grid whatever the frame size, so
// the host synthesizes a view on that grid (plus margin) and H2D becomes
// resolution-INDEPENDENT (~0.2 MB at 4K as at 480p). Matches the FrameView
// convention (runtime/streaming.py): pixels[0,0] center sits at (ox, oy).
int vpt_read_view(void *h, int64_t idx, float ox, float oy, float stride,
                  int out_size, uint8_t *out) {
  auto *s = static_cast<Source *>(h);
  if (idx < 0 || idx >= s->num_frames || stride <= 0.0f || out_size <= 0)
    return -1;
  int tx0 = 0, ty0 = 0;
  if (s->synthetic) {
    float c[2];
    vpt_synth_truth(h, idx, c);
    tx0 = static_cast<int>(std::lround(c[0] - s->tw / 2.0));
    ty0 = static_cast<int>(std::lround(c[1] - s->th / 2.0));
  }
  const uint8_t *base =
      s->synthetic ? s->background.data()
                   : s->map + static_cast<size_t>(idx) * s->frame_bytes;
  const int W = s->width, H = s->height;
  for (int j = 0; j < out_size; ++j) {
    float fy = oy + j * stride;
    fy = std::fmin(std::fmax(fy, 0.0f), static_cast<float>(H - 1));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, H - 1);
    const float wy = fy - y0;
    uint8_t *dst = out + static_cast<size_t>(j) * out_size * 3;
    for (int i = 0; i < out_size; ++i) {
      float fx = ox + i * stride;
      fx = std::fmin(std::fmax(fx, 0.0f), static_cast<float>(W - 1));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, W - 1);
      const float wx = fx - x0;
      const uint8_t *p00 = pixel_at(*s, base, tx0, ty0, x0, y0);
      const uint8_t *p01 = pixel_at(*s, base, tx0, ty0, x1, y0);
      const uint8_t *p10 = pixel_at(*s, base, tx0, ty0, x0, y1);
      const uint8_t *p11 = pixel_at(*s, base, tx0, ty0, x1, y1);
      for (int c = 0; c < 3; ++c) {
        const float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                        wy * ((1 - wx) * p10[c] + wx * p11[c]);
        dst[i * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
  return 0;
}

// ---- streaming ring ------------------------------------------------------

int vpt_stream_start(void *h, int depth) {
  auto *s = static_cast<Source *>(h);
  if (s->ring) return -1;
  s->ring = new Ring(depth, s->frame_bytes);
  s->producer = std::thread(producer_main, s);
  return 0;
}

// Blocks until the next in-order frame is ready; returns a pointer into the
// ring (valid until vpt_stream_release is called for it), or nullptr at EOS.
const uint8_t *vpt_stream_next(void *h, int64_t *index_out) {
  auto *s = static_cast<Source *>(h);
  Ring &r = *s->ring;
  std::unique_lock<std::mutex> lk(r.mu);
  int depth = static_cast<int>(r.slots.size());
  r.cv_consume.wait(lk, [&] {
    return r.done || (r.next_fill > r.next_take &&
                      r.slots[r.next_take % depth].ready);
  });
  if (r.next_take >= s->num_frames) return nullptr;
  Frame &slot = r.slots[r.next_take % depth];
  if (!slot.ready) return nullptr;  // done with no frame
  *index_out = slot.index;
  return slot.data.data();
}

// Consumer finished with the current frame: free its slot for the producer.
void vpt_stream_release(void *h) {
  auto *s = static_cast<Source *>(h);
  Ring &r = *s->ring;
  std::lock_guard<std::mutex> lk(r.mu);
  r.slots[r.next_take % r.slots.size()].ready = false;
  r.next_take += 1;
  r.cv_produce.notify_one();
}

void vpt_close(void *h) {
  auto *s = static_cast<Source *>(h);
  if (s->ring) {
    s->stop.store(true);
    {
      std::lock_guard<std::mutex> lk(s->ring->mu);
      s->ring->cv_produce.notify_all();
      s->ring->cv_consume.notify_all();
    }
    if (s->producer.joinable()) s->producer.join();
    delete s->ring;
  }
  if (s->map && s->map != MAP_FAILED) munmap(s->map, s->map_len);
  delete s;
}

}  // extern "C"
