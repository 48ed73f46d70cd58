// Asynchronous binary trajectory spool.
//
// TPU-native runtime component: the training loop streams qpos frames and
// episode scalars (device -> host, one small copy per eval/video interval)
// into this sink; a background thread flushes them to a compact binary
// spool file so Python never blocks on disk I/O.  The offline renderer and
// analysis tools read the spool back.
//
// This replaces the reference's in-loop video/plot writing, which runs in
// the learner process and blocks training (training_callback.py:333-448
// evaluates + renders inline, with a time.sleep(0.01) per step).
//
// File format (little endian):
//   header: magic "QTPULOG1" (8 bytes), u32 nq, u32 reserved
//   record: u64 step, f32 reward, f32 qpos[nq]
//
// C API (ctypes-friendly), thread-safe per handle:
//   void* tl_open(const char* path, uint32_t nq);
//   int   tl_append(void* h, uint64_t step, float reward, const float* qpos);
//   int   tl_flush(void* h);          // block until queue drained
//   void  tl_close(void* h);
//   // reader
//   int64_t tl_count(const char* path, uint32_t* nq_out);
//   int64_t tl_read(const char* path, int64_t offset, int64_t max_records,
//                   uint64_t* steps, float* rewards, float* qpos);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[8] = {'Q', 'T', 'P', 'U', 'L', 'O', 'G', '1'};

struct Record {
  uint64_t step;
  float reward;
  std::vector<float> qpos;
};

struct Log {
  FILE* f = nullptr;
  uint32_t nq = 0;
  std::deque<Record> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable cv_drained;
  std::thread worker;
  std::atomic<bool> stop{false};
  // true while the worker is writing a popped record outside the mutex;
  // tl_flush must wait on BOTH queue.empty() and !writing, otherwise the
  // last record can still be in flight when flush() returns
  bool writing = false;

  void run() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
      while (!queue.empty()) {
        Record r = std::move(queue.front());
        queue.pop_front();
        writing = true;
        lk.unlock();
        fwrite(&r.step, sizeof(r.step), 1, f);
        fwrite(&r.reward, sizeof(r.reward), 1, f);
        fwrite(r.qpos.data(), sizeof(float), nq, f);
        lk.lock();
        writing = false;
      }
      fflush(f);
      cv_drained.notify_all();
      if (stop.load() && queue.empty()) break;
    }
  }
};

}  // namespace

extern "C" {

void* tl_open(const char* path, uint32_t nq) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  fwrite(kMagic, 1, 8, f);
  fwrite(&nq, sizeof(nq), 1, f);
  uint32_t reserved = 0;
  fwrite(&reserved, sizeof(reserved), 1, f);
  Log* log = new Log();
  log->f = f;
  log->nq = nq;
  log->worker = std::thread([log] { log->run(); });
  return log;
}

int tl_append(void* h, uint64_t step, float reward, const float* qpos) {
  Log* log = static_cast<Log*>(h);
  if (!log || !log->f) return -1;
  Record r;
  r.step = step;
  r.reward = reward;
  r.qpos.assign(qpos, qpos + log->nq);
  {
    std::lock_guard<std::mutex> lk(log->mu);
    log->queue.push_back(std::move(r));
  }
  log->cv.notify_one();
  return 0;
}

int tl_flush(void* h) {
  Log* log = static_cast<Log*>(h);
  if (!log) return -1;
  std::unique_lock<std::mutex> lk(log->mu);
  log->cv.notify_one();
  log->cv_drained.wait(lk,
                       [&] { return log->queue.empty() && !log->writing; });
  return 0;
}

void tl_close(void* h) {
  Log* log = static_cast<Log*>(h);
  if (!log) return;
  log->stop.store(true);
  log->cv.notify_one();
  log->worker.join();
  fclose(log->f);
  delete log;
}

static int64_t open_reader(const char* path, FILE** f_out, uint32_t* nq_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[8];
  uint32_t nq = 0, reserved = 0;
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, kMagic, 8) != 0 ||
      fread(&nq, sizeof(nq), 1, f) != 1 ||
      fread(&reserved, sizeof(reserved), 1, f) != 1) {
    fclose(f);
    return -2;
  }
  *f_out = f;
  *nq_out = nq;
  return 0;
}

int64_t tl_count(const char* path, uint32_t* nq_out) {
  FILE* f = nullptr;
  uint32_t nq = 0;
  if (open_reader(path, &f, &nq) != 0) return -1;
  fseek(f, 0, SEEK_END);
  long end = ftell(f);
  fclose(f);
  if (nq_out) *nq_out = nq;
  const long header = 16;
  const long rec = 8 + 4 + 4L * nq;
  return (end - header) / rec;
}

int64_t tl_read(const char* path, int64_t offset, int64_t max_records,
                uint64_t* steps, float* rewards, float* qpos) {
  FILE* f = nullptr;
  uint32_t nq = 0;
  if (open_reader(path, &f, &nq) != 0) return -1;
  const long rec = 8 + 4 + 4L * nq;
  fseek(f, 16 + offset * rec, SEEK_SET);
  int64_t n = 0;
  while (n < max_records) {
    uint64_t step;
    float reward;
    if (fread(&step, sizeof(step), 1, f) != 1) break;
    if (fread(&reward, sizeof(reward), 1, f) != 1) break;
    if (fread(qpos + n * nq, sizeof(float), nq, f) != nq) break;
    steps[n] = step;
    rewards[n] = reward;
    ++n;
  }
  fclose(f);
  return n;
}

}  // extern "C"
