// Native host-side data-path kernels for mvpnet_tpu.
//
// The reference hides its host data cost in 8-16 torch DataLoader worker
// processes (SURVEY.md §2.3 "Data-loading parallelism"); this library makes
// the remaining host work (chunk extraction over multi-million-point scenes,
// greedy view selection) cheap enough for a thin thread pool on a TPU host.
//
// Exposed C ABI (ctypes-bound from mvpnet_tpu/data/native.py):
//   grid_build   - bucket scene points into an xy CSR grid index
//   grid_query   - gather indices of points inside an xy box (O(cells hit))
//   greedy_cover - greedy max-coverage view selection over a bool matrix
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Build a CSR grid over the xy plane.
//   points:   (n, 3) float32 row-major
//   cell:     cell edge length
// Outputs (caller-allocated):
//   cell_start: (nx*ny + 1) int64 CSR offsets
//   order:      (n) int64 point indices sorted by cell
//   meta:       [min_x, min_y, cell, nx, ny] written as 5 doubles
// Returns nx*ny, or -1 on error. Call with cell_start=nullptr to query the
// required nx*ny first.
int64_t grid_build(const float* points, int64_t n, double cell,
                   int64_t* cell_start, int64_t* order, double* meta) {
  if (n <= 0 || cell <= 0) return -1;
  float min_x = points[0], max_x = points[0];
  float min_y = points[1], max_y = points[1];
  for (int64_t i = 1; i < n; ++i) {
    min_x = std::min(min_x, points[i * 3 + 0]);
    max_x = std::max(max_x, points[i * 3 + 0]);
    min_y = std::min(min_y, points[i * 3 + 1]);
    max_y = std::max(max_y, points[i * 3 + 1]);
  }
  int64_t nx = std::max<int64_t>(1, (int64_t)((max_x - min_x) / cell) + 1);
  int64_t ny = std::max<int64_t>(1, (int64_t)((max_y - min_y) / cell) + 1);
  if (cell_start == nullptr) return nx * ny;

  std::vector<int64_t> cell_of(n);
  std::vector<int64_t> counts(nx * ny + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((points[i * 3 + 0] - min_x) / cell);
    int64_t cy = (int64_t)((points[i * 3 + 1] - min_y) / cell);
    cx = std::min(cx, nx - 1);
    cy = std::min(cy, ny - 1);
    cell_of[i] = cx * ny + cy;
    counts[cell_of[i] + 1]++;
  }
  for (int64_t c = 0; c < nx * ny; ++c) counts[c + 1] += counts[c];
  std::memcpy(cell_start, counts.data(), sizeof(int64_t) * (nx * ny + 1));
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n; ++i) order[cursor[cell_of[i]]++] = i;
  meta[0] = min_x;
  meta[1] = min_y;
  meta[2] = cell;
  meta[3] = (double)nx;
  meta[4] = (double)ny;
  return nx * ny;
}

// Gather indices of points with |x-cx|<=half and |y-cy|<=half.
// Returns the count written (capped at cap).
int64_t grid_query(const float* points, const int64_t* cell_start,
                   const int64_t* order, const double* meta, double cx,
                   double cy, double half, int64_t* out, int64_t cap) {
  double min_x = meta[0], min_y = meta[1], cell = meta[2];
  int64_t nx = (int64_t)meta[3], ny = (int64_t)meta[4];
  int64_t x0 = std::max<int64_t>(0, (int64_t)((cx - half - min_x) / cell));
  int64_t x1 = std::min<int64_t>(nx - 1, (int64_t)((cx + half - min_x) / cell));
  int64_t y0 = std::max<int64_t>(0, (int64_t)((cy - half - min_y) / cell));
  int64_t y1 = std::min<int64_t>(ny - 1, (int64_t)((cy + half - min_y) / cell));
  int64_t count = 0;
  for (int64_t gx = x0; gx <= x1; ++gx) {
    for (int64_t gy = y0; gy <= y1; ++gy) {
      int64_t c = gx * ny + gy;
      for (int64_t k = cell_start[c]; k < cell_start[c + 1]; ++k) {
        int64_t i = order[k];
        float px = points[i * 3 + 0];
        float py = points[i * 3 + 1];
        if (px >= cx - half && px <= cx + half && py >= cy - half &&
            py <= cy + half) {
          if (count < cap) out[count] = i;
          ++count;
        }
      }
    }
  }
  return std::min(count, cap);
}

// Greedy max-coverage selection: coverage (f, n) uint8 row-major.
// Writes k chosen frame ids to out (repeats first pick if f < k).
void greedy_cover(const uint8_t* coverage, int64_t f, int64_t n, int64_t k,
                  int64_t* out) {
  std::vector<uint8_t> remaining(n, 1);
  std::vector<uint8_t> used(f, 0);
  int64_t chosen = 0;
  for (; chosen < k && chosen < f; ++chosen) {
    int64_t best = -1, best_gain = -1;
    for (int64_t i = 0; i < f; ++i) {
      if (used[i]) continue;
      int64_t gain = 0;
      const uint8_t* row = coverage + i * n;
      for (int64_t j = 0; j < n; ++j) gain += (int64_t)(row[j] & remaining[j]);
      if (gain > best_gain) {
        best_gain = gain;
        best = i;
      }
    }
    out[chosen] = best;
    used[best] = 1;
    const uint8_t* row = coverage + best * n;
    for (int64_t j = 0; j < n; ++j) remaining[j] &= (uint8_t)(~row[j]);
  }
  for (; chosen < k; ++chosen) out[chosen] = out[0];
}

}  // extern "C"
