// Race-detection stress harness for the native loader (run under TSan):
//   make -C autovc_tpu/runtime tsan && g++ -fsanitize=thread -std=c++17 -g \
//     -o /tmp/tsan_stress autovc_tpu/runtime/tsan_stress.cc \
//     autovc_tpu/runtime/loader.cc -lpthread && /tmp/tsan_stress <npy...>
//
// Exercises the concurrent paths: threaded bulk .npy loads into one store,
// then concurrent pack() calls from multiple threads while readers take
// zero-copy views. Exit 0 + no TSan report = clean.

#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {
struct AvcStore;
AvcStore* avc_store_create();
void avc_store_destroy(AvcStore*);
void avc_store_load_npy_batch(AvcStore*, const char**, int64_t, int64_t*, int);
int64_t avc_store_rows(AvcStore*, int64_t);
int64_t avc_store_cols(AvcStore*, int64_t);
const float* avc_store_data(AvcStore*, int64_t);
void avc_store_pack(AvcStore*, const int64_t*, const int64_t*, int64_t, int64_t,
                    float*, int);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: tsan_stress <file.npy> [more.npy ...]\n");
    return 2;
  }
  AvcStore* store = avc_store_create();
  int64_t n = argc - 1;
  std::vector<int64_t> ids(static_cast<size_t>(n));
  std::vector<const char*> paths;
  for (int i = 1; i < argc; ++i) paths.push_back(argv[i]);
  avc_store_load_npy_batch(store, paths.data(), n, ids.data(), 8);
  for (int64_t i = 0; i < n; ++i)
    if (ids[static_cast<size_t>(i)] < 0) {
      std::fprintf(stderr, "load failed: %s\n", paths[static_cast<size_t>(i)]);
      return 1;
    }

  int64_t cols = avc_store_cols(store, ids[0]);
  const int64_t crop = 64, batch = 4;

  // concurrent packers + view readers over the shared (read-only) store
  std::vector<std::thread> workers;
  for (int w = 0; w < 6; ++w) {
    workers.emplace_back([&, w] {
      std::vector<float> out(static_cast<size_t>(batch * crop * cols));
      std::vector<int64_t> sel(batch), offs(batch);
      for (int rep = 0; rep < 200; ++rep) {
        for (int64_t b = 0; b < batch; ++b) {
          sel[static_cast<size_t>(b)] = ids[static_cast<size_t>((w + rep + b) % n)];
          offs[static_cast<size_t>(b)] = (rep * 7 + b * 13) % 128;
        }
        avc_store_pack(store, sel.data(), offs.data(), batch, crop, out.data(), 2);
        // reader: touch a zero-copy view
        const float* v = avc_store_data(store, ids[static_cast<size_t>(rep % n)]);
        volatile float sink = v[0];
        (void)sink;
      }
    });
  }
  for (auto& t : workers) t.join();
  avc_store_destroy(store);
  std::puts("tsan_stress: OK");
  return 0;
}
