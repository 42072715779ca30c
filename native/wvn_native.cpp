// wvn_native — native runtime support for wild_visual_navigation_tpu.
//
// The reference's only native component is the ANYmal robot-state
// converter node (/root/reference/wild_visual_navigation_anymal/src/
// anymal_msg_converter_cpp_node.cpp:1-50), and its known serialization
// hot spot is the Float32MultiArray python-list marshaling of image
// features (wvn_feature_extractor_node.py:390, SURVEY.md §3.2). This
// library is the TPU framework's equivalent robot-boundary runtime:
//
//   * a lock-free single-producer/single-consumer ring buffer for
//     fixed-size records — the transport between the robot-I/O thread
//     (driver callbacks, socket readers) and the Python runtime;
//   * a binary RobotState codec (timestamp + pose quaternion/position
//     + measured & desired twists) matching the fields of the
//     reference's RobotState msg;
//   * image ingest kernels: uint8 HWC -> float32 CHW [0,1] with
//     optional fused nearest resize — the cv_bridge/convert hot path,
//     done in one pass in C++ instead of numpy temporaries.
//
// Build: `make -C native` -> libwvn_native.so, loaded via ctypes
// (wild_visual_navigation_tpu/runtime/native_ipc.py). Pure C ABI.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <new>

extern "C" {

// ---------------------------------------------------------------------
// SPSC ring buffer of fixed-size records.
// ---------------------------------------------------------------------

struct WvnRing {
  size_t record_size;
  size_t capacity;  // number of records (power of two enforced)
  uint8_t* data;
  std::atomic<uint64_t> head;  // producer writes
  std::atomic<uint64_t> tail;  // consumer reads
  std::atomic<uint64_t> dropped;
};

static size_t next_pow2(size_t v) {
  size_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

WvnRing* wvn_ring_create(size_t record_size, size_t capacity) {
  auto* r = new (std::nothrow) WvnRing();
  if (!r) return nullptr;
  r->record_size = record_size;
  r->capacity = next_pow2(capacity);
  r->data = static_cast<uint8_t*>(std::malloc(r->record_size * r->capacity));
  if (!r->data) {
    delete r;
    return nullptr;
  }
  r->head.store(0, std::memory_order_relaxed);
  r->tail.store(0, std::memory_order_relaxed);
  r->dropped.store(0, std::memory_order_relaxed);
  return r;
}

void wvn_ring_destroy(WvnRing* r) {
  if (!r) return;
  std::free(r->data);
  delete r;
}

// Push one record. Returns 0 on success, -1 when full (record dropped —
// freshest-data-wins policy belongs to the caller via wvn_ring_push_overwrite).
int wvn_ring_push(WvnRing* r, const void* rec) {
  const uint64_t head = r->head.load(std::memory_order_relaxed);
  const uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) {
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    return -1;
  }
  std::memcpy(r->data + (head & (r->capacity - 1)) * r->record_size, rec, r->record_size);
  r->head.store(head + 1, std::memory_order_release);
  return 0;
}

// Push, evicting the oldest record when full (camera-frame policy: the
// consumer always sees the freshest stream, like the reference's
// queue_size=1 subscribers).
int wvn_ring_push_overwrite(WvnRing* r, const void* rec) {
  if (wvn_ring_push(r, rec) == 0) return 0;
  // consumer-side pop of one slot; safe for SPSC-with-single-overwriter
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  r->tail.compare_exchange_strong(tail, tail + 1, std::memory_order_acq_rel);
  return wvn_ring_push(r, rec);
}

int wvn_ring_pop(WvnRing* r, void* rec) {
  const uint64_t tail = r->tail.load(std::memory_order_relaxed);
  const uint64_t head = r->head.load(std::memory_order_acquire);
  if (tail == head) return -1;
  std::memcpy(rec, r->data + (tail & (r->capacity - 1)) * r->record_size, r->record_size);
  r->tail.store(tail + 1, std::memory_order_release);
  return 0;
}

size_t wvn_ring_size(const WvnRing* r) {
  return static_cast<size_t>(r->head.load(std::memory_order_acquire) -
                             r->tail.load(std::memory_order_acquire));
}

uint64_t wvn_ring_dropped(const WvnRing* r) {
  return r->dropped.load(std::memory_order_relaxed);
}

// ---------------------------------------------------------------------
// RobotState codec. Field layout mirrors the reference msg
// (wild_visual_navigation_msgs/msg/RobotState.msg: header + pose +
// twist (+ desired twist arriving on a second topic)).
// ---------------------------------------------------------------------

#pragma pack(push, 1)
struct WvnRobotState {
  double stamp;
  double pose[7];           // x y z qx qy qz qw
  double twist[6];          // vx vy vz wx wy wz
  double desired_twist[6];  // commanded
  uint32_t seq;
  uint32_t flags;
};
#pragma pack(pop)

size_t wvn_robot_state_size(void) { return sizeof(WvnRobotState); }

void wvn_pack_robot_state(double stamp, const double* pose7, const double* twist6,
                          const double* desired6, uint32_t seq, uint32_t flags, uint8_t* out) {
  WvnRobotState s;
  s.stamp = stamp;
  std::memcpy(s.pose, pose7, sizeof(s.pose));
  std::memcpy(s.twist, twist6, sizeof(s.twist));
  std::memcpy(s.desired_twist, desired6, sizeof(s.desired_twist));
  s.seq = seq;
  s.flags = flags;
  std::memcpy(out, &s, sizeof(s));
}

int wvn_unpack_robot_state(const uint8_t* buf, double* stamp, double* pose7,
                           double* twist6, double* desired6, uint32_t* seq, uint32_t* flags) {
  WvnRobotState s;
  std::memcpy(&s, buf, sizeof(s));
  *stamp = s.stamp;
  std::memcpy(pose7, s.pose, sizeof(s.pose));
  std::memcpy(twist6, s.twist, sizeof(s.twist));
  std::memcpy(desired6, s.desired_twist, sizeof(s.desired_twist));
  *seq = s.seq;
  *flags = s.flags;
  return 0;
}

// ---------------------------------------------------------------------
// Image ingest: uint8 HWC -> float32 CHW in [0,1], optional fused
// nearest resize (floor(i * in / out) index map matching ops/resize.py).
// ---------------------------------------------------------------------

void wvn_image_u8hwc_to_f32chw(const uint8_t* src, int h, int w, int c, float* dst) {
  const float inv = 1.0f / 255.0f;
  for (int ch = 0; ch < c; ++ch) {
    float* out = dst + static_cast<size_t>(ch) * h * w;
    const uint8_t* in = src + ch;
    const size_t n = static_cast<size_t>(h) * w;
    for (size_t i = 0; i < n; ++i) out[i] = in[i * c] * inv;
  }
}

void wvn_image_u8hwc_resize_f32chw(const uint8_t* src, int h, int w, int c,
                                   int oh, int ow, float* dst) {
  const float inv = 1.0f / 255.0f;
  for (int oy = 0; oy < oh; ++oy) {
    const int iy = static_cast<int>(static_cast<int64_t>(oy) * h / oh);
    for (int ox = 0; ox < ow; ++ox) {
      const int ix = static_cast<int>(static_cast<int64_t>(ox) * w / ow);
      const uint8_t* px = src + (static_cast<size_t>(iy) * w + ix) * c;
      for (int ch = 0; ch < c; ++ch) {
        dst[(static_cast<size_t>(ch) * oh + oy) * ow + ox] = px[ch] * inv;
      }
    }
  }
}

// Raw uint8 HWC -> uint8 CHW (no scaling): preferred camera ingest when
// the device does the [0,1] conversion — uploads 4x less than float32.
void wvn_image_u8hwc_to_u8chw(const uint8_t* src, int h, int w, int c, uint8_t* dst) {
  for (int ch = 0; ch < c; ++ch) {
    uint8_t* out = dst + static_cast<size_t>(ch) * h * w;
    const uint8_t* in = src + ch;
    const size_t n = static_cast<size_t>(h) * w;
    for (size_t i = 0; i < n; ++i) out[i] = in[i * c];
  }
}

void wvn_image_u8hwc_resize_u8chw(const uint8_t* src, int h, int w, int c,
                                  int oh, int ow, uint8_t* dst) {
  for (int oy = 0; oy < oh; ++oy) {
    const int iy = static_cast<int>(static_cast<int64_t>(oy) * h / oh);
    for (int ox = 0; ox < ow; ++ox) {
      const int ix = static_cast<int>(static_cast<int64_t>(ox) * w / ow);
      const uint8_t* px = src + (static_cast<size_t>(iy) * w + ix) * c;
      for (int ch = 0; ch < c; ++ch) {
        dst[(static_cast<size_t>(ch) * oh + oy) * ow + ox] = px[ch];
      }
    }
  }
}

}  // extern "C"
