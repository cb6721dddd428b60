// Native host-side data-pipeline kernels for mrcc_tpu.
//
// The reference delegates its host hot loops to native engines
// (MinkowskiEngine's C++ sparse_quantize for dataset voxelization,
// data/alivev2.py:289; numpy-python FPS at ~0.5 s/2048 pts,
// data/alivev2_dense.py:42).  This library provides the same operations as
// a small C++ core for the CPU input pipeline, exposed via ctypes
// (mrcc_tpu/native.py) with pure-numpy fallbacks:
//
//  - voxelize: hash-map dedup of quantized coords, feature averaging,
//    conflict-aware label merge, point->voxel map
//  - farthest_point_sample: exact FPS
//  - ball_query: radius neighbours with first-K/index-order semantics
//
// Build: see runtime/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Voxelize n points into unique voxels.
//
// points  [n*3] float32, feats [n*c] float32, labels [n] int32 (or null)
// out_coords [cap*3] int32, out_feats [cap*c] f32, out_labels [cap] i32,
// point_to_voxel [n] int32 (== n_voxels means dropped/overflow)
// Returns the number of voxels written (<= cap).
int32_t mrcc_voxelize(const float* points, const float* feats,
                      const int32_t* labels, int64_t n, int64_t c,
                      float quantization_size, int64_t cap,
                      int32_t ignore_label, int32_t* out_coords,
                      float* out_feats, int32_t* out_labels,
                      int32_t* point_to_voxel) {
  struct Acc {
    int32_t idx;
    int32_t label;
    bool label_conflict;
  };
  std::unordered_map<uint64_t, Acc> map;
  map.reserve(static_cast<size_t>(n));
  std::vector<int32_t> counts;
  counts.reserve(static_cast<size_t>(cap));
  int32_t n_vox = 0;

  const float inv = 1.0f / quantization_size;
  for (int64_t i = 0; i < n; ++i) {
    int32_t cx = (int32_t)std::floor(points[i * 3 + 0] * inv);
    int32_t cy = (int32_t)std::floor(points[i * 3 + 1] * inv);
    int32_t cz = (int32_t)std::floor(points[i * 3 + 2] * inv);
    uint64_t key = ((uint64_t)(uint32_t)(cx + (1 << 20)) << 42) |
                   ((uint64_t)(uint32_t)(cy + (1 << 20)) << 21) |
                   (uint64_t)(uint32_t)(cz + (1 << 20));
    auto it = map.find(key);
    if (it == map.end()) {
      if (n_vox >= cap) {
        point_to_voxel[i] = (int32_t)cap;  // overflow: dropped
        continue;
      }
      Acc acc;
      acc.idx = n_vox;
      acc.label = labels ? labels[i] : 0;
      acc.label_conflict = false;
      map.emplace(key, acc);
      out_coords[n_vox * 3 + 0] = cx;
      out_coords[n_vox * 3 + 1] = cy;
      out_coords[n_vox * 3 + 2] = cz;
      for (int64_t ch = 0; ch < c; ++ch)
        out_feats[n_vox * c + ch] = feats[i * c + ch];
      counts.push_back(1);
      point_to_voxel[i] = n_vox;
      ++n_vox;
    } else {
      Acc& acc = it->second;
      for (int64_t ch = 0; ch < c; ++ch)
        out_feats[acc.idx * c + ch] += feats[i * c + ch];
      counts[acc.idx] += 1;
      if (labels && labels[i] != acc.label) acc.label_conflict = true;
      point_to_voxel[i] = acc.idx;
    }
  }

  for (int32_t v = 0; v < n_vox; ++v) {
    const float s = 1.0f / (float)counts[v];
    for (int64_t ch = 0; ch < c; ++ch) out_feats[v * c + ch] *= s;
  }
  if (labels && out_labels) {
    for (auto& kv : map) {
      out_labels[kv.second.idx] =
          kv.second.label_conflict ? ignore_label : kv.second.label;
    }
  }
  return n_vox;
}

// Exact farthest point sampling: out_idx [npoint].
void mrcc_fps(const float* points, int64_t n, int64_t npoint,
              int64_t start_idx, int32_t* out_idx) {
  std::vector<float> dist(static_cast<size_t>(n), 1e30f);
  int64_t far = start_idx;
  for (int64_t s = 0; s < npoint; ++s) {
    out_idx[s] = (int32_t)far;
    const float fx = points[far * 3], fy = points[far * 3 + 1],
                fz = points[far * 3 + 2];
    float best = -1.0f;
    int64_t best_i = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float dx = points[i * 3] - fx;
      const float dy = points[i * 3 + 1] - fy;
      const float dz = points[i * 3 + 2] - fz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[i]) dist[i] = d;
      if (dist[i] > best) {
        best = dist[i];
        best_i = i;
      }
    }
    far = best_i;
  }
}

// Ball query with the reference's semantics: first `nsample` indices in
// index order within `radius` of each query; missing slots padded with the
// first hit (or 0 when the ball is empty).
void mrcc_ball_query(const float* points, int64_t n, const float* queries,
                     int64_t s, float radius, int64_t nsample,
                     int32_t* out_idx) {
  const float r2 = radius * radius;
  for (int64_t q = 0; q < s; ++q) {
    const float qx = queries[q * 3], qy = queries[q * 3 + 1],
                qz = queries[q * 3 + 2];
    int64_t found = 0;
    for (int64_t i = 0; i < n && found < nsample; ++i) {
      const float dx = points[i * 3] - qx;
      const float dy = points[i * 3 + 1] - qy;
      const float dz = points[i * 3 + 2] - qz;
      if (dx * dx + dy * dy + dz * dz < r2) {
        out_idx[q * nsample + found] = (int32_t)i;
        ++found;
      }
    }
    const int32_t fill = found > 0 ? out_idx[q * nsample] : 0;
    for (int64_t k = found; k < nsample; ++k) out_idx[q * nsample + k] = fill;
  }
}

}  // extern "C"
