// Host-side graph-construction kernels for the input pipeline.
//
// The reference leans on torch_cluster's C++/CUDA radius_graph / knn_graph
// (SURVEY.md §2.9); on TPU graph building happens on the host CPU, so these
// cell-list kernels keep featurization off the Python hot path.  Exposed via
// ctypes (gcpnet_tpu/data/native.py).
//
// Build: make -C cpp   (produces libgraphkernels.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
  int64_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    // large-prime mixing of the three cell coordinates
    return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^
                               k.z * 83492791LL);
  }
};

using CellMap = std::unordered_map<CellKey, std::vector<int32_t>, CellHash>;

CellMap build_cells(const float* pos, int32_t n, float cell) {
  CellMap cells;
  cells.reserve(static_cast<size_t>(n));
  for (int32_t i = 0; i < n; ++i) {
    CellKey key{static_cast<int64_t>(std::floor(pos[3 * i + 0] / cell)),
                static_cast<int64_t>(std::floor(pos[3 * i + 1] / cell)),
                static_cast<int64_t>(std::floor(pos[3 * i + 2] / cell))};
    cells[key].push_back(i);
  }
  return cells;
}

}  // namespace

extern "C" {

// Radius graph with torch_cluster semantics: for each center i, up to
// max_neighbors j with ||x_i - x_j|| <= r (self excluded, nearest first).
// Writes (senders=j, receivers=i) pairs; returns the number of edges
// (capped at max_edges).
int64_t radius_graph(const float* pos, int32_t n, float r,
                     int32_t max_neighbors, int32_t* senders,
                     int32_t* receivers, int64_t max_edges) {
  if (n <= 0) return 0;
  const float r2 = r * r;
  CellMap cells = build_cells(pos, n, r);

  int64_t count = 0;
  std::vector<std::pair<float, int32_t>> nbrs;
  for (int32_t i = 0; i < n; ++i) {
    nbrs.clear();
    const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
    const int64_t cx = static_cast<int64_t>(std::floor(xi / r));
    const int64_t cy = static_cast<int64_t>(std::floor(yi / r));
    const int64_t cz = static_cast<int64_t>(std::floor(zi / r));
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          auto it = cells.find(CellKey{cx + dx, cy + dy, cz + dz});
          if (it == cells.end()) continue;
          for (int32_t j : it->second) {
            if (j == i) continue;
            const float ddx = xi - pos[3 * j];
            const float ddy = yi - pos[3 * j + 1];
            const float ddz = zi - pos[3 * j + 2];
            const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) nbrs.emplace_back(d2, j);
          }
        }
    const size_t keep =
        std::min(nbrs.size(), static_cast<size_t>(max_neighbors));
    std::partial_sort(nbrs.begin(), nbrs.begin() + keep, nbrs.end());
    for (size_t k = 0; k < keep && count < max_edges; ++k) {
      senders[count] = nbrs[k].second;
      receivers[count] = i;
      ++count;
    }
  }
  return count;
}

// kNN graph: k nearest valid neighbors per valid center (nearest first).
// valid==nullptr treats every node as valid.
int64_t knn_graph(const float* pos, int32_t n, int32_t k,
                  const uint8_t* valid, int32_t* senders, int32_t* receivers,
                  int64_t max_edges) {
  if (n <= 0) return 0;
  int64_t count = 0;
  std::vector<std::pair<float, int32_t>> dists;
  dists.reserve(static_cast<size_t>(n));
  for (int32_t i = 0; i < n; ++i) {
    if (valid && !valid[i]) continue;
    dists.clear();
    const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
    for (int32_t j = 0; j < n; ++j) {
      if (j == i || (valid && !valid[j])) continue;
      const float dx = xi - pos[3 * j];
      const float dy = yi - pos[3 * j + 1];
      const float dz = zi - pos[3 * j + 2];
      dists.emplace_back(dx * dx + dy * dy + dz * dz, j);
    }
    const size_t keep = std::min(dists.size(), static_cast<size_t>(k));
    std::partial_sort(dists.begin(), dists.begin() + keep, dists.end());
    for (size_t m = 0; m < keep && count < max_edges; ++m) {
      senders[count] = dists[m].second;
      receivers[count] = i;
      ++count;
    }
  }
  return count;
}

// Hybrid AR connectivity: top-k_max nearest OR index separation < k_min
// (reference ar_dataset.py:157-194).  Returns edge count.
int64_t hybrid_knn_graph(const float* pos, int32_t n, int32_t k_min,
                         int32_t k_max, int32_t* senders, int32_t* receivers,
                         int64_t max_edges) {
  if (n <= 0) return 0;
  std::vector<uint8_t> adj(static_cast<size_t>(n) * n, 0);
  std::vector<std::pair<float, int32_t>> dists;
  for (int32_t i = 0; i < n; ++i) {
    dists.clear();
    const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
    for (int32_t j = 0; j < n; ++j) {
      if (j == i) continue;
      const float dx = xi - pos[3 * j];
      const float dy = yi - pos[3 * j + 1];
      const float dz = zi - pos[3 * j + 2];
      dists.emplace_back(dx * dx + dy * dy + dz * dz, j);
    }
    const size_t keep = std::min(dists.size(), static_cast<size_t>(k_max));
    std::partial_sort(dists.begin(), dists.begin() + keep, dists.end());
    for (size_t m = 0; m < keep; ++m)
      adj[static_cast<size_t>(i) * n + dists[m].second] = 1;
    for (int32_t j = std::max(0, i - k_min + 1);
         j < std::min(n, i + k_min); ++j)
      if (j != i) adj[static_cast<size_t>(i) * n + j] = 1;
  }
  int64_t count = 0;
  for (int32_t i = 0; i < n && count < max_edges; ++i)
    for (int32_t j = 0; j < n && count < max_edges; ++j)
      if (adj[static_cast<size_t>(i) * n + j]) {
        senders[count] = i;
        receivers[count] = j;
        ++count;
      }
  return count;
}

}  // extern "C"
