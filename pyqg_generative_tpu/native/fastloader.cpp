// fastloader: memory-mapped training-sample store with multithreaded
// shuffled batch assembly and background prefetch.
//
// Native replacement for the reference's host-side data path
// (xr.open_mfdataset + in-process python `minibatch` shuffling, reference
// tools/cnn_tools.py:51-52,607-622): samples live in one raw float32 file
// produced once from the simulation datasets; each epoch a worker pool
// gathers shuffled samples into pinned host batches, double-buffered so the
// accelerator never waits on the host.
//
// C API (ctypes-friendly), thread-safe per handle:
//   fl_open(data_path, n_samples, sample_floats)        -> handle (>0) or -errno
//   fl_start_epoch(handle, seed, batch_size, drop_last) -> number of batches
//   fl_next_batch(handle, float* out)                   -> batch index or -1 at end
//   fl_batch_size(handle)                               -> current batch size
//   fl_close(handle)
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Batch {
    std::vector<float> data;
    long index = -1;
};

struct Loader {
    const float* base = nullptr;   // mmap'ed sample store
    size_t file_bytes = 0;
    int fd = -1;
    long n_samples = 0;
    long sample_floats = 0;

    // epoch state
    std::vector<long> order;
    long batch_size = 0;
    long n_batches = 0;
    std::atomic<long> next_to_produce{0};
    long next_to_consume = 0;

    // double-buffered prefetch queue
    static constexpr int kSlots = 4;
    Batch slots[kSlots];
    std::atomic<long> slot_ready[kSlots];   // batch index stored, or -1
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};
    std::mutex mu;
    std::condition_variable cv_ready, cv_free;

    ~Loader() { shutdown(); unmap(); }

    void unmap() {
        if (base) munmap(const_cast<float*>(base), file_bytes);
        if (fd >= 0) close(fd);
        base = nullptr;
        fd = -1;
    }

    void shutdown() {
        stop.store(true);
        cv_free.notify_all();
        cv_ready.notify_all();
        for (auto& t : workers)
            if (t.joinable()) t.join();
        workers.clear();
    }

    void produce_loop() {
        while (!stop.load()) {
            long b = next_to_produce.fetch_add(1);
            if (b >= n_batches) return;
            int slot = static_cast<int>(b % kSlots);
            {
                // wait until the slot is free (its previous batch consumed)
                std::unique_lock<std::mutex> lk(mu);
                cv_free.wait(lk, [&] {
                    return stop.load() || slot_ready[slot].load() == -1;
                });
                if (stop.load()) return;
            }
            Batch& batch = slots[slot];
            batch.data.resize(static_cast<size_t>(batch_size) * sample_floats);
            const long begin = b * batch_size;
            for (long i = 0; i < batch_size; ++i) {
                const long src = order[(begin + i) % n_samples];
                std::memcpy(batch.data.data() + i * sample_floats,
                            base + src * sample_floats,
                            sample_floats * sizeof(float));
            }
            batch.index = b;
            slot_ready[slot].store(b);
            cv_ready.notify_all();
        }
    }
};

std::mutex g_mu;
std::map<long, Loader*> g_loaders;
long g_next_handle = 1;

Loader* get(long h) {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_loaders.find(h);
    return it == g_loaders.end() ? nullptr : it->second;
}

}  // namespace

extern "C" {

long fl_open(const char* data_path, long n_samples, long sample_floats) {
    int fd = open(data_path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return -2;
    }
    const size_t need =
        static_cast<size_t>(n_samples) * sample_floats * sizeof(float);
    if (static_cast<size_t>(st.st_size) < need) {
        close(fd);
        return -3;
    }
    void* p = mmap(nullptr, need, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
        close(fd);
        return -4;
    }
    madvise(p, need, MADV_WILLNEED);
    auto* L = new Loader();
    L->base = static_cast<const float*>(p);
    L->file_bytes = need;
    L->fd = fd;
    L->n_samples = n_samples;
    L->sample_floats = sample_floats;
    for (int i = 0; i < Loader::kSlots; ++i) L->slot_ready[i].store(-1);
    std::lock_guard<std::mutex> lk(g_mu);
    long h = g_next_handle++;
    g_loaders[h] = L;
    return h;
}

long fl_start_epoch(long handle, unsigned long seed, long batch_size,
                    int drop_last) {
    Loader* L = get(handle);
    if (!L || batch_size <= 0) return -1;
    L->shutdown();
    L->stop.store(false);
    L->order.resize(L->n_samples);
    std::iota(L->order.begin(), L->order.end(), 0L);
    std::mt19937_64 rng(seed);
    std::shuffle(L->order.begin(), L->order.end(), rng);
    L->batch_size = batch_size;
    L->n_batches = drop_last ? L->n_samples / batch_size
                             : (L->n_samples + batch_size - 1) / batch_size;
    L->next_to_produce.store(0);
    L->next_to_consume = 0;
    for (int i = 0; i < Loader::kSlots; ++i) L->slot_ready[i].store(-1);
    const unsigned n_threads =
        std::min(4u, std::max(1u, std::thread::hardware_concurrency() / 2));
    for (unsigned i = 0; i < n_threads; ++i)
        L->workers.emplace_back([L] { L->produce_loop(); });
    return L->n_batches;
}

long fl_next_batch(long handle, float* out) {
    Loader* L = get(handle);
    if (!L) return -1;
    if (L->next_to_consume >= L->n_batches) return -1;
    const long want = L->next_to_consume;
    const int slot = static_cast<int>(want % Loader::kSlots);
    {
        std::unique_lock<std::mutex> lk(L->mu);
        L->cv_ready.wait(lk, [&] {
            return L->stop.load() || L->slot_ready[slot].load() == want;
        });
        if (L->stop.load()) return -1;
    }
    std::memcpy(out, L->slots[slot].data.data(),
                static_cast<size_t>(L->batch_size) * L->sample_floats *
                    sizeof(float));
    L->slot_ready[slot].store(-1);
    L->cv_free.notify_all();
    L->next_to_consume++;
    return want;
}

long fl_batch_size(long handle) {
    Loader* L = get(handle);
    return L ? L->batch_size : -1;
}

void fl_close(long handle) {
    Loader* L = nullptr;
    {
        std::lock_guard<std::mutex> lk(g_mu);
        auto it = g_loaders.find(handle);
        if (it != g_loaders.end()) {
            L = it->second;
            g_loaders.erase(it);
        }
    }
    delete L;
}

}  // extern "C"
