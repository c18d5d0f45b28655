// Native tfrecord reader: mmap + hardware CRC32C + threaded prefetch.
//
// The TPU-native replacement for the reference's TF C++ queue-runner input
// kernels (SURVEY.md §2.2 "Queue runners / threaded input"): N reader
// threads stream records from memory-mapped tfrecord files into a bounded
// queue; Python drains it through a small C API (ctypes binding in
// multibox_tpu/data/_native.py).
//
// Record framing (TFRecord):
//   uint64 length | uint32 masked_crc32c(length) | data | uint32 masked_crc32c(data)
// masked_crc = rotr(crc32c(x), 15) + 0xa282ead8.
//
// Build: make -C multibox_tpu/native   (produces libmultibox_native.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli). SSE4.2 hardware path with table fallback.
// ---------------------------------------------------------------------------

uint32_t crc32c_table[256];

struct TableInit {
  TableInit() {
    const uint32_t poly = 0x82F63B78u;
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = i;
      for (int k = 0; k < 8; ++k)
        crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
      crc32c_table[i] = crc;
    }
  }
} table_init;

uint32_t crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
#if defined(__SSE4_2__)
  while (n >= 8) {
    uint64_t v;
    memcpy(&v, data, 8);
    crc = static_cast<uint32_t>(_mm_crc32_u64(crc, v));
    data += 8;
    n -= 8;
  }
  while (n) {
    crc = _mm_crc32_u8(crc, *data++);
    --n;
  }
#else
  for (size_t i = 0; i < n; ++i)
    crc = (crc >> 8) ^ crc32c_table[(crc ^ data[i]) & 0xFF];
#endif
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

struct Record {
  std::string data;
};

struct MappedFile {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      base = nullptr;
      return true;
    }
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) return false;
    madvise(p, size, MADV_SEQUENTIAL);
    base = static_cast<const uint8_t*>(p);
    return true;
  }
  ~MappedFile() {
    if (base) munmap(const_cast<uint8_t*>(base), size);
    if (fd >= 0) close(fd);
  }
};

class RecordStream {
 public:
  RecordStream(std::vector<std::string> paths, int num_threads,
               size_t queue_capacity, bool verify_crc)
      : paths_(std::move(paths)),
        capacity_(queue_capacity),
        verify_crc_(verify_crc) {
    (void)num_threads;  // single reader preserves file order; IO is mmap'd
    worker_ = std::thread([this] { Run(); });
  }

  ~RecordStream() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      cancelled_ = true;
    }
    cv_pop_.notify_all();
    cv_push_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  // Returns: 1 = record, 0 = end of stream, -1 = error.
  int Next(std::string* out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_pop_.wait(lk, [this] { return !queue_.empty() || done_ || cancelled_; });
    if (!queue_.empty()) {
      *out = std::move(queue_.front());
      queue_.pop_front();
      cv_push_.notify_one();
      return 1;
    }
    if (!error_.empty()) return -1;
    return 0;
  }

  const std::string& error() const { return error_; }

 private:
  void Run() {
    for (const auto& path : paths_) {
      MappedFile f;
      if (!f.open(path.c_str())) {
        Fail("cannot open " + path);
        return;
      }
      size_t pos = 0;
      while (pos + 12 <= f.size) {
        uint64_t length;
        memcpy(&length, f.base + pos, 8);
        uint32_t len_crc;
        memcpy(&len_crc, f.base + pos + 8, 4);
        if (verify_crc_ && masked_crc(f.base + pos, 8) != len_crc) {
          Fail("corrupt length crc in " + path);
          return;
        }
        // Overflow-safe: `length` comes from the file; `pos+12+length+4`
        // could wrap for a corrupt huge value and pass a naive check.
        const size_t remaining = f.size - (pos + 12);
        if (remaining < 4 || length > remaining - 4) {
          Fail("truncated record in " + path);
          return;
        }
        const uint8_t* data = f.base + pos + 12;
        uint32_t data_crc;
        memcpy(&data_crc, data + length, 4);
        if (verify_crc_ && masked_crc(data, length) != data_crc) {
          Fail("corrupt record crc in " + path);
          return;
        }
        if (!Push(std::string(reinterpret_cast<const char*>(data), length)))
          return;  // cancelled
        pos += 12 + length + 4;
      }
      if (pos != f.size) {
        Fail("trailing garbage in " + path);
        return;
      }
    }
    Finish();
  }

  bool Push(std::string rec) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_push_.wait(lk, [this] { return queue_.size() < capacity_ || cancelled_; });
    if (cancelled_) return false;
    queue_.push_back(std::move(rec));
    cv_pop_.notify_one();
    return true;
  }

  void Fail(std::string msg) {
    std::lock_guard<std::mutex> lk(mu_);
    error_ = std::move(msg);
    done_ = true;
    cv_pop_.notify_all();
  }

  void Finish() {
    std::lock_guard<std::mutex> lk(mu_);
    done_ = true;
    cv_pop_.notify_all();
  }

  std::vector<std::string> paths_;
  size_t capacity_;
  bool verify_crc_;
  std::deque<std::string> queue_;
  std::mutex mu_;
  std::condition_variable cv_pop_, cv_push_;
  bool done_ = false;
  bool cancelled_ = false;
  std::string error_;
  std::thread worker_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C API (ctypes)
// ---------------------------------------------------------------------------

extern "C" {

void* mbx_stream_open(const char** paths, int num_paths, int verify_crc,
                      int queue_capacity) {
  std::vector<std::string> v;
  v.reserve(num_paths);
  for (int i = 0; i < num_paths; ++i) v.emplace_back(paths[i]);
  return new RecordStream(std::move(v), 1,
                          queue_capacity > 0 ? queue_capacity : 256,
                          verify_crc != 0);
}

// Returns 1 and sets *data/*size on success (caller must mbx_free_record),
// 0 at end of stream, -1 on error (message via mbx_stream_error).
int mbx_stream_next(void* stream, char** data, uint64_t* size) {
  auto* s = static_cast<RecordStream*>(stream);
  auto rec = std::make_unique<std::string>();
  int r = s->Next(rec.get());
  if (r != 1) return r;
  *size = rec->size();
  char* buf = static_cast<char*>(malloc(rec->size()));
  memcpy(buf, rec->data(), rec->size());
  *data = buf;
  return 1;
}

void mbx_free_record(char* data) { free(data); }

const char* mbx_stream_error(void* stream) {
  return static_cast<RecordStream*>(stream)->error().c_str();
}

void mbx_stream_close(void* stream) {
  delete static_cast<RecordStream*>(stream);
}

uint32_t mbx_masked_crc32c(const uint8_t* data, uint64_t n) {
  return masked_crc(data, n);
}

}  // extern "C"
