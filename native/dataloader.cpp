// Native data loader for ConductorMotion100-shaped datasets.
//
// TPU-native replacement for the runtime the reference gets from torch
// DataLoader worker processes (SURVEY.md §2.4): .npy files are memory-mapped
// once (no full-RAM load of 90 h of data, cf. Contrastive_Stage/utils/
// dataset.py:8-53), and worker threads assemble window batches into a
// bounded ring of reusable float32 buffers, overlapping disk/page-cache reads
// with TPU step time.  Deterministic: batch order depends only on
// (seed, epoch), and batches are delivered in order regardless of worker
// scheduling.
//
// C API at the bottom (extern "C") — consumed via ctypes from
// conductor_tpu/data/native_loader.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ----------------------------------------------------------------- npy mmap

struct NpyArray {
  int fd = -1;
  void* map = nullptr;
  size_t map_len = 0;
  const char* data = nullptr;  // first element
  std::vector<int64_t> shape;
  char dtype = 'f';  // 'f' = float32, 'd' = float64
  int64_t elems = 0;

  bool open(const char* path, std::string* err) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) { *err = std::string("open failed: ") + path; return false; }
    struct stat st;
    if (fstat(fd, &st) != 0) { *err = "fstat failed"; return false; }
    map_len = st.st_size;
    map = mmap(nullptr, map_len, PROT_READ, MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) { map = nullptr; *err = "mmap failed"; return false; }
    const unsigned char* p = static_cast<const unsigned char*>(map);
    if (map_len < 10 || memcmp(p, "\x93NUMPY", 6) != 0) {
      *err = std::string("not an npy file: ") + path;
      return false;
    }
    int major = p[6];
    size_t header_len, header_off;
    if (major == 1) {
      header_len = p[8] | (p[9] << 8);
      header_off = 10;
    } else {
      header_len = p[8] | (p[9] << 8) | (size_t(p[10]) << 16) | (size_t(p[11]) << 24);
      header_off = 12;
    }
    std::string header(reinterpret_cast<const char*>(p + header_off), header_len);
    if (header.find("'fortran_order': False") == std::string::npos) {
      *err = "fortran-order npy not supported";
      return false;
    }
    if (header.find("<f4") != std::string::npos) dtype = 'f';
    else if (header.find("<f8") != std::string::npos) dtype = 'd';
    else { *err = "unsupported dtype (need <f4/<f8)"; return false; }
    size_t s0 = header.find("'shape': (");
    if (s0 == std::string::npos) { *err = "bad npy header"; return false; }
    s0 += 10;
    size_t s1 = header.find(')', s0);
    std::string dims = header.substr(s0, s1 - s0);
    elems = 1;
    const char* q = dims.c_str();
    while (*q) {
      while (*q == ' ' || *q == ',') q++;
      if (!*q) break;
      int64_t v = strtoll(q, const_cast<char**>(&q), 10);
      shape.push_back(v);
      elems *= v;
    }
    data = reinterpret_cast<const char*>(p) + header_off + header_len;
    return true;
  }

  void close() {
    if (map) munmap(map, map_len);
    if (fd >= 0) ::close(fd);
    map = nullptr;
    fd = -1;
  }

  // copy rows [r0, r1) into float32 dst (row = product of trailing dims)
  void copy_rows(int64_t r0, int64_t r1, int64_t row_elems, float* dst) const {
    if (dtype == 'f') {
      memcpy(dst, reinterpret_cast<const float*>(data) + r0 * row_elems,
             sizeof(float) * (r1 - r0) * row_elems);
    } else {
      const double* src = reinterpret_cast<const double*>(data) + r0 * row_elems;
      int64_t n = (r1 - r0) * row_elems;
      for (int64_t i = 0; i < n; i++) dst[i] = static_cast<float>(src[i]);
    }
  }
};

// ------------------------------------------------------------------ loader

constexpr int kMotionHz = 30;

struct Clip {
  NpyArray mel, motion;
  int64_t mel_row;     // e.g. 128
  int64_t motion_row;  // e.g. 13*2
  int seconds;         // full clip length in seconds
};

struct Sample {
  int clip;
  int start_sec;  // -1 = draw per-epoch random start
};

struct Loader {
  std::vector<Clip> clips;
  int mel_hz = 90;  // rows/second of the conditioning stream (30 for cached features)
  int sample_length, batch_size, mode /*0=sequential,1=random*/;
  bool shuffle, drop_last;
  int times;
  uint64_t seed;
  int n_threads;
  // multi-host input sharding: this host serves rows
  // [host_index*batch_size, (host_index+1)*batch_size) of every GLOBAL
  // batch of size batch_size*host_count; the epoch permutation is
  // seed-deterministic, so host slices are disjoint and exhaustive
  // (the Python BatchIterator(host_shard=True) contract).
  int host_index = 0, host_count = 1;

  std::vector<Sample> samples;  // one entry per dataset index
  int64_t mel_win, mot_win;     // window rows
  int64_t mel_row, mot_row;     // row elems

  // epoch state
  std::vector<int> order;  // shuffled per epoch, length = len(samples)*times
  int num_batches = 0;
  int epoch = 0;

  // ring of batch slots
  struct Slot {
    std::vector<float> mel, motion;
    std::vector<int32_t> m_lens;
    int batch_index = -1;
    bool ready = false;
  };
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<int> next_to_produce{0};
  int next_to_consume = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  ~Loader() { stop_workers(); for (auto& c : clips) { c.mel.close(); c.motion.close(); } }

  void stop_workers() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_free.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers) if (t.joinable()) t.join();
    workers.clear();
  }

  void build_samples() {
    samples.clear();
    for (size_t ci = 0; ci < clips.size(); ci++) {
      if (mode == 0) {
        int n = clips[ci].seconds / sample_length;
        for (int w = 0; w < n; w++)
          samples.push_back({static_cast<int>(ci), w * sample_length});
      } else {
        samples.push_back({static_cast<int>(ci), -1});
      }
    }
  }

  void start_epoch(int ep) {
    stop_workers();
    epoch = ep;
    int n = static_cast<int>(samples.size());
    order.resize(static_cast<size_t>(n) * times);
    for (size_t i = 0; i < order.size(); i++) order[i] = static_cast<int>(i % n);
    if (shuffle) {
      std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + ep);
      for (size_t i = order.size() - 1; i > 0; i--) {
        size_t j = rng() % (i + 1);
        std::swap(order[i], order[j]);
      }
    }
    if (host_count > 1) {
      // keep only this host's contiguous slice of each global batch
      int global_b = batch_size * host_count;
      size_t n_global = order.size() / global_b;  // drop_last enforced
      std::vector<int> local;
      local.reserve(n_global * batch_size);
      for (size_t gb = 0; gb < n_global; gb++) {
        size_t base = gb * global_b + size_t(host_index) * batch_size;
        for (int i = 0; i < batch_size; i++) local.push_back(order[base + i]);
      }
      order.swap(local);
    }
    int total = static_cast<int>(order.size());
    num_batches = drop_last ? total / batch_size
                            : (total + batch_size - 1) / batch_size;
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = false;
      next_to_produce = 0;
      next_to_consume = 0;
      for (auto& s : slots) { s.ready = false; s.batch_index = -1; }
    }
    for (int t = 0; t < n_threads; t++)
      workers.emplace_back([this] { worker_loop(); });
  }

  int batch_count_of(int b) const {
    int total = static_cast<int>(order.size());
    int start = b * batch_size;
    int count = std::min(batch_size, total - start);
    return count;
  }

  void fill_batch(int b, Slot& slot) {
    int count = batch_count_of(b);
    for (int i = 0; i < count; i++) {
      const Sample& s = samples[order[static_cast<size_t>(b) * batch_size + i]];
      const Clip& c = clips[s.clip];
      int start_sec = s.start_sec;
      if (start_sec < 0) {
        int max_start = c.seconds - sample_length;
        // per-(seed, epoch, index) start like the Python loader
        std::mt19937_64 rng((seed << 20) ^ (uint64_t(epoch) << 40) ^
                            uint64_t(order[static_cast<size_t>(b) * batch_size + i]));
        start_sec = max_start > 0 ? static_cast<int>(rng() % (max_start + 1)) : 0;
      }
      c.mel.copy_rows(int64_t(start_sec) * mel_hz,
                      int64_t(start_sec + sample_length) * mel_hz, mel_row,
                      slot.mel.data() + int64_t(i) * mel_win * mel_row);
      c.motion.copy_rows(int64_t(start_sec) * kMotionHz,
                         int64_t(start_sec + sample_length) * kMotionHz, mot_row,
                         slot.motion.data() + int64_t(i) * mot_win * mot_row);
      slot.m_lens[i] = c.seconds;  // reference quirk: full-clip seconds
    }
    slot.batch_index = b;
  }

  void worker_loop() {
    for (;;) {
      int b = next_to_produce.fetch_add(1);
      if (b >= num_batches) return;
      Slot& slot = slots[b % slots.size()];
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stopping || (!slot.ready && next_to_consume + static_cast<int>(slots.size()) > b);
        });
        if (stopping) return;
      }
      fill_batch(b, slot);
      {
        std::lock_guard<std::mutex> lk(mu);
        slot.ready = true;
      }
      cv_ready.notify_all();
    }
  }

  // returns rows in batch (0 at epoch end)
  int next(float* mel_out, float* motion_out, int32_t* mlens_out) {
    if (next_to_consume >= num_batches) return 0;
    int b = next_to_consume;
    Slot& slot = slots[b % slots.size()];
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_ready.wait(lk, [&] { return slot.ready && slot.batch_index == b; });
    }
    int count = batch_count_of(b);
    memcpy(mel_out, slot.mel.data(), sizeof(float) * count * mel_win * mel_row);
    memcpy(motion_out, slot.motion.data(),
           sizeof(float) * count * mot_win * mot_row);
    memcpy(mlens_out, slot.m_lens.data(), sizeof(int32_t) * count);
    {
      std::lock_guard<std::mutex> lk(mu);
      slot.ready = false;
      slot.batch_index = -1;
      next_to_consume = b + 1;
    }
    cv_free.notify_all();
    return count;
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle, or nullptr (with *err_out set to a static
// message) on failure.
void* cdl_create(const char** mel_paths, const char** motion_paths,
                 int n_clips, int sample_length, int batch_size, int mode,
                 int shuffle, int drop_last, int times, uint64_t seed,
                 int n_threads, int n_prefetch, int mel_hz,
                 int host_index, int host_count) {
  // batch_size here is the LOCAL (per-host) batch; buffers and num_batches
  // are per-host throughout.
  if (host_count > 1 && !drop_last) {
    fprintf(stderr, "cdl_create: host sharding requires drop_last\n");
    return nullptr;
  }
  auto* L = new Loader();
  L->host_index = host_index;
  L->host_count = std::max(1, host_count);
  L->sample_length = sample_length;
  L->batch_size = batch_size;
  L->mode = mode;
  L->shuffle = shuffle != 0;
  L->drop_last = drop_last != 0;
  L->times = times;
  L->seed = seed;
  L->n_threads = std::max(1, n_threads);

  std::string err;
  for (int i = 0; i < n_clips; i++) {
    Clip c;
    if (!c.mel.open(mel_paths[i], &err) || !c.motion.open(motion_paths[i], &err)) {
      fprintf(stderr, "cdl_create: %s\n", err.c_str());
      c.mel.close(); c.motion.close();
      delete L;
      return nullptr;
    }
    int64_t mel_rows = c.mel.shape[0];
    int64_t mot_rows = c.motion.shape[0];
    c.mel_row = c.mel.elems / mel_rows;
    c.motion_row = c.motion.elems / mot_rows;
    c.seconds = static_cast<int>(mot_rows / kMotionHz);
    L->clips.push_back(std::move(c));
  }
  if (L->clips.empty()) { delete L; return nullptr; }
  L->mel_row = L->clips[0].mel_row;
  L->mot_row = L->clips[0].motion_row;
  L->mel_hz = mel_hz;
  L->mel_win = int64_t(sample_length) * mel_hz;
  L->mot_win = int64_t(sample_length) * kMotionHz;
  L->build_samples();

  int n_slots = std::max(2, n_prefetch);
  L->slots.resize(n_slots);
  for (auto& s : L->slots) {
    s.mel.resize(size_t(batch_size) * L->mel_win * L->mel_row);
    s.motion.resize(size_t(batch_size) * L->mot_win * L->mot_row);
    s.m_lens.resize(batch_size);
  }
  return L;
}

void cdl_destroy(void* h) { delete static_cast<Loader*>(h); }

int cdl_num_samples(void* h) {
  auto* L = static_cast<Loader*>(h);
  int total = static_cast<int>(L->samples.size()) * L->times;
  if (L->host_count > 1) {
    int global_b = L->batch_size * L->host_count;
    return (total / global_b) * L->batch_size;  // this host's share
  }
  return total;
}

void cdl_start_epoch(void* h, int epoch) {
  static_cast<Loader*>(h)->start_epoch(epoch);
}

int cdl_num_batches(void* h) { return static_cast<Loader*>(h)->num_batches; }

int cdl_next(void* h, float* mel_out, float* motion_out, int32_t* mlens_out) {
  return static_cast<Loader*>(h)->next(mel_out, motion_out, mlens_out);
}

}  // extern "C"
