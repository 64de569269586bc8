// Native dataset IO: record decode + threaded in-order file prefetch.
//
// Plain C ABI for ctypes (no pybind11 in this toolchain). The reference
// reads scans synchronously inside its per-scan hot loop
// (/root/reference/train_multi_dataset.py:166, one numpy fromfile per
// scan); here decode runs in C++ worker threads that read ahead of the
// consumer so disk + decode overlap keyframe selection and encoding.
//
// Record formats (see /root/reference/src/data/*_loader.py):
//   format 0  KITTI  — 16-byte float32 [x, y, z, intensity] rows
//                      (kitti_loader.py:100-115)
//   format 1  NCLT   — 12-byte packed: u16 x,y,z (meters = raw*0.005-100),
//                      u8 intensity (/255), u8 pad, u32 extra; points kept
//                      iff |coord| < 200 m (nclt_loader.py:229-267)
//   format 2  HeLiPR — 22-byte packed: f32 x,y,z,intensity + u16 ring +
//                      f32 time (helipr_loader.py:133-140)
//   format 3  HeLiPR5 — same records, 5-float rows [x,y,z,i,ring]: the
//                      explicit ring ids feed the ring fast path (VLP-16
//                      streams are firing-interleaved, so ring inference
//                      from elevation order cannot recover them)
//
// Decode is bit-identical to the numpy loaders in
// neural_spectral_codec_tpu/data/: the Makefile compiles this file with
// -ffp-contract=off so `raw * 0.005f - 100.0f` is rounded per-op exactly
// like numpy's float32 multiply-then-subtract (FMA fusion would differ in
// the last ulp). Trailing partial records are dropped, matching
// np.fromfile; a KITTI byte count that is not a multiple of 16 is
// reported as NSC_IO_BAD_SIZE because the numpy path raises there
// (reshape(-1, 4)) and the caller must reproduce that behavior.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

enum Status : int {
  NSC_IO_OK = 0,
  NSC_IO_READ_ERROR = 1,   // file missing / unreadable
  NSC_IO_BAD_SIZE = 2,     // byte count incompatible with the format
};

inline float u16_to_m(uint16_t v) { return (float)v * 0.005f - 100.0f; }

int64_t decode_kitti(const uint8_t* raw, int64_t nbytes, float* out,
                     int64_t n_max) {
  if (nbytes % 16 != 0) return -2;  // numpy reshape(-1, 4) raises here
  int64_t n = nbytes / 16;
  if (n > n_max) return -1;
  memcpy(out, raw, (size_t)(n * 16));
  return n;
}

int64_t decode_nclt(const uint8_t* raw, int64_t nbytes, float* out,
                    int64_t n_max) {
  int64_t n = nbytes / 12;  // trailing bytes dropped, like np.fromfile
  int64_t m = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* r = raw + i * 12;
    uint16_t xs, ys, zs;
    memcpy(&xs, r + 0, 2);
    memcpy(&ys, r + 2, 2);
    memcpy(&zs, r + 4, 2);
    float x = u16_to_m(xs), y = u16_to_m(ys), z = u16_to_m(zs);
    // validity filter (nclt_loader.py:259-267); decoded u16 values are
    // always finite so only the magnitude gate is live
    if (!(x > -200.0f && x < 200.0f && y > -200.0f && y < 200.0f &&
          z > -200.0f && z < 200.0f))
      continue;
    if (m >= n_max) return -1;
    float* o = out + m * 4;
    o[0] = x;
    o[1] = y;
    o[2] = z;
    o[3] = (float)r[6] / 255.0f;
    m++;
  }
  return m;
}

int64_t decode_helipr(const uint8_t* raw, int64_t nbytes, float* out,
                      int64_t n_max, bool with_ring) {
  int64_t n = nbytes / 22;
  if (n > n_max) return -1;
  int64_t w = with_ring ? 5 : 4;
  for (int64_t i = 0; i < n; i++) {
    memcpy(out + i * w, raw + i * 22, 16);  // f32 x,y,z,intensity
    if (with_ring) {
      uint16_t ring;
      memcpy(&ring, raw + i * 22 + 16, 2);
      out[i * w + 4] = (float)ring;  // exact for u16 values
    }
  }
  return n;
}

int row_floats(int format) { return format == 3 ? 5 : 4; }

int64_t decode(int format, const uint8_t* raw, int64_t nbytes, float* out,
               int64_t n_max) {
  switch (format) {
    case 0: return decode_kitti(raw, nbytes, out, n_max);
    case 1: return decode_nclt(raw, nbytes, out, n_max);
    case 2: return decode_helipr(raw, nbytes, out, n_max, false);
    case 3: return decode_helipr(raw, nbytes, out, n_max, true);
    default: return -2;
  }
}

struct Slot {
  std::vector<float> data;  // (n_points, row_floats(format)) rows
  int64_t n_points = 0;
  int status = NSC_IO_OK;
  int64_t seq = -1;  // item index currently published in this slot
  bool ready = false;
};

struct Prefetcher {
  std::vector<std::string> paths;
  int format;
  int depth;
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready;  // producer -> consumer
  std::condition_variable cv_free;   // consumer -> producer
  int64_t next_fetch = 0;    // next item index a worker will claim
  int64_t next_consume = 0;  // next item the consumer will peek/take
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    std::vector<float> buf;
    std::vector<uint8_t> raw;
    for (;;) {
      int64_t i;
      {
        std::lock_guard<std::mutex> lk(mu);
        if (stop || next_fetch >= (int64_t)paths.size()) return;
        i = next_fetch++;
      }
      int status = NSC_IO_OK;
      int64_t n_points = 0;
      FILE* f = fopen(paths[i].c_str(), "rb");
      if (!f) {
        status = NSC_IO_READ_ERROR;
      } else {
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        if (sz < 0) {
          status = NSC_IO_READ_ERROR;
        } else {
          raw.resize((size_t)sz);
          if (sz > 0 && fread(raw.data(), 1, (size_t)sz, f) != (size_t)sz) {
            status = NSC_IO_READ_ERROR;
          } else {
            int64_t cap = (int64_t)sz / 12 + 1;  // >= records of any format
            int64_t w = row_floats(format);
            buf.resize((size_t)(cap * w));
            int64_t m = decode(format, raw.data(), sz, buf.data(), cap);
            if (m == -2) {
              status = NSC_IO_BAD_SIZE;
            } else if (m < 0) {
              status = NSC_IO_READ_ERROR;  // capacity bug; defensive
            } else {
              n_points = m;
              buf.resize((size_t)(n_points * w));
            }
          }
        }
        fclose(f);
      }
      Slot& s = slots[i % depth];
      {
        std::unique_lock<std::mutex> lk(mu);
        // wait until the slot's previous occupant (item i - depth) was
        // consumed; distinct in-flight items never share a slot
        cv_free.wait(lk, [&] { return stop || next_consume + depth > i; });
        if (stop) return;
        s.data.swap(buf);
        s.n_points = n_points;
        s.status = status;
        s.seq = i;
        s.ready = true;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// One-shot decode (also used by tests): returns rows written, -1 if out
// capacity n_max is insufficient, -2 on a format/size mismatch.
int64_t nsc_decode(int format, const uint8_t* raw, int64_t nbytes,
                   float* out, int64_t n_max) {
  return decode(format, raw, nbytes, out, n_max);
}

void* nsc_prefetch_create(const char** paths, int64_t n_paths, int format,
                          int n_threads, int depth) {
  if (n_paths < 0 || format < 0 || format > 3 || depth < 1 || n_threads < 1)
    return nullptr;
  auto* p = new Prefetcher();
  p->paths.reserve((size_t)n_paths);
  for (int64_t i = 0; i < n_paths; i++) p->paths.emplace_back(paths[i]);
  p->format = format;
  p->depth = depth;
  p->slots.resize((size_t)depth);
  int nw = n_threads < (int)n_paths ? n_threads
                                    : (n_paths > 0 ? (int)n_paths : 1);
  p->workers.reserve((size_t)nw);
  for (int t = 0; t < nw; t++)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Block until item `seq` (which must be the next unconsumed index) is
// decoded. Returns its status; *n_points is valid only for NSC_IO_OK.
// Returns -1 on out-of-order use or after destroy began (a concurrent
// destroy must be able to unblock a waiting peek, not deadlock it).
int nsc_prefetch_peek(void* h, int64_t seq, int64_t* n_points) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  if (seq != p->next_consume || seq >= (int64_t)p->paths.size()) return -1;
  Slot& s = p->slots[seq % p->depth];
  p->cv_ready.wait(lk, [&] { return p->stop || (s.ready && s.seq == seq); });
  if (p->stop) return -1;
  *n_points = s.n_points;
  return s.status;
}

// Copy item `seq` into out ((n_points, row_floats(format)) float32, from
// peek) and advance.
// out may be null when the item errored or is empty. Returns 0, or -1 on
// protocol misuse (seq not peeked/ready, or destroy in progress).
int nsc_prefetch_take(void* h, int64_t seq, float* out) {
  auto* p = (Prefetcher*)h;
  const float* src = nullptr;
  int64_t n_points = 0;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->stop || seq != p->next_consume) return -1;
    Slot& s = p->slots[seq % p->depth];
    if (!s.ready || s.seq != seq) return -1;
    src = s.data.data();
    n_points = s.n_points;
  }
  // between peek and take the consumer exclusively owns the ready slot
  // (producers wait for next_consume to pass it), so the up-to-2 MB scan
  // copy runs outside the lock and never stalls publishing workers
  if (out && n_points > 0)
    memcpy(out, src,
           (size_t)(n_points * row_floats(p->format)) * sizeof(float));
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->stop) return -1;
    Slot& s = p->slots[seq % p->depth];
    s.ready = false;
    s.data.clear();
    s.data.shrink_to_fit();
    p->next_consume++;
  }
  p->cv_free.notify_all();
  return 0;
}

void nsc_prefetch_destroy(void* h) {
  auto* p = (Prefetcher*)h;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_ready.notify_all();
  p->cv_free.notify_all();
  for (auto& w : p->workers) w.join();
  delete p;
}

}  // extern "C"
