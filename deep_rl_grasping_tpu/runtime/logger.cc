// Async log writer: lock-guarded MPSC ring buffer drained by a background
// flusher thread, exposed through a C ABI for ctypes.
//
// Role: the IO half of the metrics pipeline (monitor CSV, logs.csv,
// TensorBoard-style scalars). The reference leans on stable-baselines'
// synchronous Python Monitor/CSVLogger, which stalls the train loop on
// filesystem latency; here the device loop hands off a formatted line and
// returns immediately — the flusher amortizes syscalls with batched writes.
//
// Build: see Makefile (g++ -O2 -shared -fPIC -pthread).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>

namespace {

struct Writer {
  std::FILE* file = nullptr;
  std::deque<std::string> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::thread flusher;
  std::atomic<bool> stop{false};
  std::atomic<uint64_t> dropped{0};
  size_t max_queue = 1 << 16;

  void run() {
    std::deque<std::string> local;
    while (true) {
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait_for(lock, std::chrono::milliseconds(200),
                    [&] { return stop.load() || !queue.empty(); });
        local.swap(queue);
      }
      for (const auto& line : local) {
        std::fwrite(line.data(), 1, line.size(), file);
      }
      if (!local.empty()) std::fflush(file);
      local.clear();
      if (stop.load()) {
        std::unique_lock<std::mutex> lock(mu);
        if (queue.empty()) break;
      }
    }
  }
};

}  // namespace

extern "C" {

void* log_writer_open(const char* path, const char* header) {
  auto* w = new Writer();
  w->file = std::fopen(path, "w");
  if (!w->file) {
    delete w;
    return nullptr;
  }
  if (header && header[0]) {
    std::fwrite(header, 1, std::strlen(header), w->file);
    std::fflush(w->file);
  }
  w->flusher = std::thread([w] { w->run(); });
  return w;
}

// Enqueue one line (non-blocking; drops when the queue is saturated and
// reports via log_writer_dropped so backpressure is observable).
int log_writer_write(void* handle, const char* line) {
  auto* w = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lock(w->mu);
    if (w->queue.size() >= w->max_queue) {
      w->dropped.fetch_add(1, std::memory_order_relaxed);
      return -1;
    }
    w->queue.emplace_back(line);
  }
  w->cv.notify_one();
  return 0;
}

uint64_t log_writer_dropped(void* handle) {
  return static_cast<Writer*>(handle)->dropped.load();
}

void log_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  w->stop.store(true);
  w->cv.notify_one();
  if (w->flusher.joinable()) w->flusher.join();
  std::fclose(w->file);
  delete w;
}

}  // extern "C"
