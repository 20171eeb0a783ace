// Native host-side input pipeline: threaded image preprocessing + prefetch.
//
// The reference's input pipeline is pure-Python: per-image scipy affine
// resize on the host (reference ku/image_utils/utility.py:29-94) inside
// Keras enqueuer workers (reference ku/backprop/gan.py:339-354). This
// module is the ku runtime's native equivalent: a C++ thread pool that
// performs bilinear resize + normalization off the GIL, feeding a bounded
// prefetch ring the trainer pops from. Device-side resize stays in
// ku.image_utils (jax.image); this path covers host-bound decode/resize
// workloads where Python threads would serialize.
//
// C ABI (ctypes-friendly, no pybind11 dependency):
//   ku_loader_create(n_threads, capacity, out_h, out_w, channels) -> handle
//   ku_loader_submit(handle, img_u8, h, w, c)   // enqueue one HWC image
//   ku_loader_get(handle, out_f32)              // blocking pop (out_h*out_w*ch)
//   ku_loader_pending(handle)                   // submitted - popped
//   ku_loader_destroy(handle)
//
// Output: float32 in [-1, 1], aspect-preserving letterbox into
// (out_h, out_w), zero padding — matching
// ku.image_utils.resize_image_to_target_symmeric_size semantics.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::vector<uint8_t> data;
  int h, w, c;
};

struct Loader {
  int out_h, out_w, channels;
  size_t out_size;
  size_t capacity;

  std::deque<Job> in_queue;
  std::deque<std::vector<float>> out_queue;
  std::mutex mu;
  std::condition_variable cv_in;    // workers wait for jobs
  std::condition_variable cv_out;   // consumers wait for results
  std::condition_variable cv_space; // producers wait for queue space
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<long> submitted{0};
  std::atomic<long> popped{0};

  void worker_loop() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_in.wait(lock, [&] { return stop || !in_queue.empty(); });
        if (stop && in_queue.empty()) return;
        job = std::move(in_queue.front());
        in_queue.pop_front();
        cv_space.notify_one();
      }
      std::vector<float> out(out_size, 0.0f);
      process(job, out.data());
      {
        std::unique_lock<std::mutex> lock(mu);
        out_queue.push_back(std::move(out));
      }
      cv_out.notify_one();
    }
  }

  // Bilinear resize with aspect-preserving letterbox, normalize to [-1,1].
  void process(const Job& job, float* out) const {
    const int ih = job.h, iw = job.w, ic = job.c;
    // Scale to fit inside (out_h, out_w), preserving aspect.
    const float scale_h = float(out_h) / float(ih);
    const float scale_w = float(out_w) / float(iw);
    const float scale = scale_h < scale_w ? scale_h : scale_w;
    const int rh = int(ih * scale) > out_h ? out_h : int(ih * scale);
    const int rw = int(iw * scale) > out_w ? out_w : int(iw * scale);
    const int pad_t = (out_h - rh) / 2;
    const int pad_l = (out_w - rw) / 2;
    const int cc = ic < channels ? ic : channels;
    const uint8_t* src = job.data.data();

    for (int y = 0; y < rh; ++y) {
      // Align-corners=false bilinear sampling (matches jax.image 'linear').
      float sy = (y + 0.5f) * float(ih) / float(rh) - 0.5f;
      if (sy < 0) sy = 0;
      int y0 = int(sy);
      int y1 = y0 + 1 < ih ? y0 + 1 : ih - 1;
      float fy = sy - y0;
      for (int x = 0; x < rw; ++x) {
        float sx = (x + 0.5f) * float(iw) / float(rw) - 0.5f;
        if (sx < 0) sx = 0;
        int x0 = int(sx);
        int x1 = x0 + 1 < iw ? x0 + 1 : iw - 1;
        float fx = sx - x0;
        float* dst =
            out + size_t((y + pad_t) * out_w + (x + pad_l)) * channels;
        for (int ch = 0; ch < cc; ++ch) {
          const float v00 = src[(size_t(y0) * iw + x0) * ic + ch];
          const float v01 = src[(size_t(y0) * iw + x1) * ic + ch];
          const float v10 = src[(size_t(y1) * iw + x0) * ic + ch];
          const float v11 = src[(size_t(y1) * iw + x1) * ic + ch];
          const float top = v00 + (v01 - v00) * fx;
          const float bot = v10 + (v11 - v10) * fx;
          const float val = top + (bot - top) * fy;
          dst[ch] = val * (2.0f / 255.0f) - 1.0f;
        }
      }
    }
  }
};

}  // namespace

extern "C" {

void* ku_loader_create(int n_threads, int capacity, int out_h, int out_w,
                       int channels) {
  auto* L = new Loader();
  L->out_h = out_h;
  L->out_w = out_w;
  L->channels = channels;
  L->out_size = size_t(out_h) * out_w * channels;
  L->capacity = size_t(capacity) > 0 ? size_t(capacity) : 64;
  for (int i = 0; i < (n_threads > 0 ? n_threads : 4); ++i)
    L->workers.emplace_back([L] { L->worker_loop(); });
  return L;
}

void ku_loader_submit(void* handle, const uint8_t* img, int h, int w, int c) {
  auto* L = static_cast<Loader*>(handle);
  Job job;
  job.h = h;
  job.w = w;
  job.c = c;
  job.data.assign(img, img + size_t(h) * w * c);
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_space.wait(lock, [L] {
      return L->in_queue.size() + L->out_queue.size() < L->capacity;
    });
    L->in_queue.push_back(std::move(job));
  }
  L->submitted++;
  L->cv_in.notify_one();
}

// Returns 0 on success, 1 if the loader is stopping / nothing was or will
// be produced (the consumer must not interpret `out` in that case).
int ku_loader_get(void* handle, float* out) {
  auto* L = static_cast<Loader*>(handle);
  std::vector<float> result;
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_out.wait(lock, [L] {
      // Also wake when stopping, or when no result can ever arrive
      // (nothing queued, nothing in flight) — prevents a consumer that
      // over-pops from deadlocking or outliving destroy().
      return !L->out_queue.empty() || L->stop ||
             (L->in_queue.empty() &&
              L->submitted.load() == L->popped.load());
    });
    if (L->out_queue.empty()) return 1;
    result = std::move(L->out_queue.front());
    L->out_queue.pop_front();
    L->cv_space.notify_one();
  }
  L->popped++;
  std::memcpy(out, result.data(), result.size() * sizeof(float));
  return 0;
}

long ku_loader_pending(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  return L->submitted.load() - L->popped.load();
}

void ku_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->stop = true;
  }
  L->cv_in.notify_all();
  L->cv_out.notify_all();  // wake any consumer blocked in get()
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
