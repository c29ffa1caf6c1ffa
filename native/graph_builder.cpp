// Native host-side graph builder for rdmnet_tpu.
//
// C++ equivalents of the reference's CPU extension kernels
// (reference: geotransformer/extensions/cpu/{grid_subsampling,radius_neighbors})
// re-designed without libtorch or nanoflann:
//   * voxel-centroid grid subsampling over an open-addressing voxel hash,
//     deterministic (x, y, z)-lexicographic output order (matches the
//     on-device op in rdmnet_tpu/ops/grid_subsample.py);
//   * radius-bounded kNN via a uniform spatial hash grid with
//     sorted-by-distance neighbor lists and sentinel padding (matches
//     rdmnet_tpu/ops/radius_search.py).
//
// Exposed as a plain C ABI for ctypes (no pybind dependency). Used by the
// host data path (preprocessing, calibration, CPU-only fallbacks); the
// jitted on-device path is primary.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelKey {
    int32_t x, y, z;
    bool operator==(const VoxelKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct VoxelKeyHash {
    size_t operator()(const VoxelKey& k) const {
        // large-prime mixing; collisions resolved by the map
        return static_cast<size_t>(k.x) * 73856093u ^
               static_cast<size_t>(k.y) * 19349669u ^
               static_cast<size_t>(k.z) * 83492791u;
    }
};

struct VoxelAccum {
    double sx = 0.0, sy = 0.0, sz = 0.0;
    int32_t count = 0;
};

}  // namespace

extern "C" {

// Voxel-centroid subsample. Returns the number of valid output points
// (<= cap). Output order: lexicographic by (x, y, z) voxel coordinate.
int32_t rdm_grid_subsample(const float* points, int32_t n, float voxel_size,
                           float* out_points, int32_t cap) {
    if (n <= 0 || cap <= 0) return 0;

    float minx = points[0], miny = points[1], minz = points[2];
    for (int32_t i = 1; i < n; ++i) {
        minx = std::min(minx, points[3 * i + 0]);
        miny = std::min(miny, points[3 * i + 1]);
        minz = std::min(minz, points[3 * i + 2]);
    }
    // anchor at floor(min / voxel) * voxel (reference semantics)
    const float ox = std::floor(minx / voxel_size) * voxel_size;
    const float oy = std::floor(miny / voxel_size) * voxel_size;
    const float oz = std::floor(minz / voxel_size) * voxel_size;

    std::unordered_map<VoxelKey, VoxelAccum, VoxelKeyHash> cells;
    cells.reserve(static_cast<size_t>(n));
    for (int32_t i = 0; i < n; ++i) {
        const float px = points[3 * i + 0];
        const float py = points[3 * i + 1];
        const float pz = points[3 * i + 2];
        VoxelKey key{
            static_cast<int32_t>(std::floor((px - ox) / voxel_size)),
            static_cast<int32_t>(std::floor((py - oy) / voxel_size)),
            static_cast<int32_t>(std::floor((pz - oz) / voxel_size)),
        };
        VoxelAccum& acc = cells[key];
        acc.sx += px;
        acc.sy += py;
        acc.sz += pz;
        acc.count += 1;
    }

    std::vector<std::pair<VoxelKey, VoxelAccum>> sorted(cells.begin(), cells.end());
    std::sort(sorted.begin(), sorted.end(),
              [](const auto& a, const auto& b) {
                  if (a.first.x != b.first.x) return a.first.x < b.first.x;
                  if (a.first.y != b.first.y) return a.first.y < b.first.y;
                  return a.first.z < b.first.z;
              });

    const int32_t n_out = std::min<int32_t>(static_cast<int32_t>(sorted.size()), cap);
    for (int32_t i = 0; i < n_out; ++i) {
        const VoxelAccum& acc = sorted[i].second;
        out_points[3 * i + 0] = static_cast<float>(acc.sx / acc.count);
        out_points[3 * i + 1] = static_cast<float>(acc.sy / acc.count);
        out_points[3 * i + 2] = static_cast<float>(acc.sz / acc.count);
    }
    return n_out;
}

// Radius-bounded kNN via a uniform hash grid of cell size = radius.
// out_indices is (nq, k) int32, `sentinel` where missing; neighbors are
// sorted by ascending distance (truncated to k).
void rdm_radius_knn(const float* q_points, int32_t nq, const float* s_points,
                    int32_t ns, float radius, int32_t k, int32_t sentinel,
                    int32_t* out_indices) {
    const float r2 = radius * radius;
    std::fill(out_indices, out_indices + static_cast<size_t>(nq) * k, sentinel);
    if (nq <= 0 || ns <= 0 || k <= 0) return;

    // bucket support points into radius-sized cells
    std::unordered_map<VoxelKey, std::vector<int32_t>, VoxelKeyHash> grid;
    grid.reserve(static_cast<size_t>(ns));
    auto cell_of = [&](const float* p) {
        return VoxelKey{
            static_cast<int32_t>(std::floor(p[0] / radius)),
            static_cast<int32_t>(std::floor(p[1] / radius)),
            static_cast<int32_t>(std::floor(p[2] / radius)),
        };
    };
    for (int32_t i = 0; i < ns; ++i) grid[cell_of(s_points + 3 * i)].push_back(i);

#pragma omp parallel for schedule(dynamic, 64)
    for (int32_t qi = 0; qi < nq; ++qi) {
        const float* q = q_points + 3 * qi;
        const VoxelKey c = cell_of(q);
        std::vector<std::pair<float, int32_t>> hits;
        for (int32_t dz = -1; dz <= 1; ++dz)
            for (int32_t dy = -1; dy <= 1; ++dy)
                for (int32_t dx = -1; dx <= 1; ++dx) {
                    auto it = grid.find(VoxelKey{c.x + dx, c.y + dy, c.z + dz});
                    if (it == grid.end()) continue;
                    for (int32_t si : it->second) {
                        const float* s = s_points + 3 * si;
                        const float ddx = q[0] - s[0];
                        const float ddy = q[1] - s[1];
                        const float ddz = q[2] - s[2];
                        const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                        if (d2 <= r2) hits.emplace_back(d2, si);
                    }
                }
        const int32_t keep = std::min<int32_t>(static_cast<int32_t>(hits.size()), k);
        std::partial_sort(hits.begin(), hits.begin() + keep, hits.end());
        for (int32_t j = 0; j < keep; ++j) out_indices[qi * k + j] = hits[j].second;
    }
}

// Full single-cloud pyramid build: subsample levels + all neighbor tables.
// The one-call pyramid builder lives in Python (graph/native.py
// build_pyramid_native), composing the two primitives above — that path
// applies the canonical level-0 voxel-key sort and the
// build_upsampling_from_level gating that the device builder defines.

}  // extern "C"
