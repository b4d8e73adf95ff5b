// overlapnet_tpu native data-path library.
//
// The training input pipeline's hot host-side loop is batch assembly: gather
// pair images from the per-sequence pack (or per-image files), apply the
// circular-shift augmentation, and write contiguous (B, H, W, C) batches.
// In Python this is np.stack + np.roll per sample; here it is a pthread-pool
// of memcpy workers with the roll fused into the row copy (reference keeps
// this in keras generator threads, ImagePairOverlapOrientationSequence.py:
// 87-212; the external-C precedent is the range-image library referenced at
// README.md:116-117 of the reference).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libovbatcher.so)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Gather rows of a source array into a batch, with optional per-sample
// circular shift along the width axis.
//
//   src:    (n_src, H, W, C) float32, C-contiguous (e.g. a pack memmap)
//   idx:    (batch,) int64 row indices into src
//   shifts: (batch,) int32 column shifts (np.roll semantics, axis=W); NULL
//           or all-zero for no augmentation
//   dst:    (batch, H, W, C) float32 output
//
// Returns 0 on success.
int ov_gather_batch(const float* src, int64_t n_src, int64_t h, int64_t w,
                    int64_t c, const int64_t* idx, const int32_t* shifts,
                    int64_t batch, float* dst, int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  const int64_t img_elems = h * w * c;
  const int64_t row_elems = w * c;
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);

  auto worker = [&]() {
    for (;;) {
      int64_t b = next.fetch_add(1);
      if (b >= batch) return;
      int64_t row = idx[b];
      if (row < 0 || row >= n_src) { err.store(1); return; }
      const float* s = src + row * img_elems;
      float* d = dst + b * img_elems;
      int64_t shift = shifts ? ((shifts[b] % w) + w) % w : 0;
      if (shift == 0) {
        std::memcpy(d, s, sizeof(float) * img_elems);
      } else {
        // np.roll(x, shift, axis=1): dst[:, (j+shift)%W, :] = src[:, j, :]
        // == dst[:, 0:shift, :] = src[:, W-shift:W, :]; dst[:, shift:, :] =
        //    src[:, 0:W-shift, :], per image row.
        const int64_t tail = (w - shift) * c;  // elems moved to the right part
        const int64_t head = shift * c;
        for (int64_t y = 0; y < h; ++y) {
          const float* sr = s + y * row_elems;
          float* dr = d + y * row_elems;
          std::memcpy(dr, sr + tail, sizeof(float) * head);
          std::memcpy(dr + head, sr, sizeof(float) * tail);
        }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
  return err.load();
}

// Read a KITTI .bin scan (float32 x,y,z,remission rows) into a zero-padded
// fixed-capacity buffer: out is (max_points, 4) float32, padded rows zero.
// Returns the number of real points, or -1 on IO error.
int64_t ov_read_scan(const char* path, float* out, int64_t max_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  // reject corrupt files whose size is not a whole number of 16-byte
  // records — the Python loader (kitti.load_scan) raises on these, and a
  // silent partial-record accept would make behavior depend on whether the
  // native library happens to be built
  if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return -1; }
  long fsize = std::ftell(f);
  if (fsize < 0 || (fsize % (long)(sizeof(float) * 4)) != 0) {
    std::fclose(f);
    return -1;
  }
  std::rewind(f);
  std::memset(out, 0, sizeof(float) * max_points * 4);
  size_t got = std::fread(out, sizeof(float) * 4, (size_t)max_points, f);
  std::fclose(f);
  // truncation beyond capacity mirrors pad_points()
  return (int64_t)got;
}

// Read many scans in parallel into one (n, max_points, 4) buffer.
// paths: array of n C strings. Returns 0 on success, else the number of
// failed files.
int ov_read_scans(const char** paths, int64_t n, float* out,
                  int64_t max_points, int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      if (ov_read_scan(paths[i], out + i * max_points * 4, max_points) < 0)
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
