// Native host-side ingestion kernels (C ABI, loaded via ctypes).
//
// The reference's host runtime is C++ (preprocess.cpp decoders feeding
// pcl::VoxelGrid scan filters); these are the equivalent hot host-path
// pieces for the TPU build: single-pass vendor decode over the raw
// point buffer and a hash-based centroid voxel filter. Both are called
// per frame before data crosses to the device.
//
//  - decode_avia: livox CustomMsg point array -> gated xyzi + t_rel(s)
//    (tag-bit filter, 1-in-N decimation of the tag-valid stream,
//    near-duplicate drop, blind cull; preprocess.cpp:137-160 semantics).
//  - voxel_downsample_f32: centroid per `leaf` voxel, first-occurrence
//    scan order (pcl::VoxelGrid replacement; laserMapping.cpp:1398).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Packed livox CustomPoint as stored in the rosbag message:
// offset_time u32 | x f32 | y f32 | z f32 | reflectivity u8 | tag u8 | line u8
#pragma pack(push, 1)
struct LivoxPt {
  uint32_t offset_time;
  float x, y, z;
  uint8_t reflectivity, tag, line;
};
#pragma pack(pop)

int decode_avia(const uint8_t *raw, int n, int n_scans, double blind,
                int filter_num, float *out_xyzi, double *out_t) {
  const LivoxPt *p = reinterpret_cast<const LivoxPt *>(raw);
  int m = 0;
  int valid_num = 0;
  const double blind2 = blind * blind;
  float px = 0.f, py = 0.f, pz = 0.f;
  if (n > 0) {
    px = p[0].x;
    py = p[0].y;
    pz = p[0].z;
  }
  for (int i = 1; i < n; i++) {
    uint8_t t30 = p[i].tag & 0x30;
    bool tag_ok = (p[i].line < n_scans) && (t30 == 0x10 || t30 == 0x00);
    float x = p[i].x, y = p[i].y, z = p[i].z;
    if (tag_ok) {
      valid_num++;
      if (valid_num % filter_num == 0) {
        bool dedup = std::fabs(x - px) > 1e-7f || std::fabs(y - py) > 1e-7f ||
                     std::fabs(z - pz) > 1e-7f;
        double r2 = (double)x * x + (double)y * y + (double)z * z;
        if (dedup && r2 > blind2) {
          out_xyzi[m * 4 + 0] = x;
          out_xyzi[m * 4 + 1] = y;
          out_xyzi[m * 4 + 2] = z;
          out_xyzi[m * 4 + 3] = (float)p[i].reflectivity;
          out_t[m] = p[i].offset_time * 1e-9;
          m++;
        }
      }
    }
    px = x;
    py = y;
    pz = z;
  }
  return m;
}

// Centroid voxel filter. out must hold max_out*cols floats.
// Returns the number of voxels written (first-occurrence order).
int voxel_downsample_f32(const float *pts, int n, int cols, float leaf,
                         float *out, int max_out) {
  struct Acc {
    int order;
    int count;
    double sum[8];
  };
  std::unordered_map<int64_t, Acc> cells;
  cells.reserve((size_t)n / 2);
  const double inv = 1.0 / leaf;
  int order = 0;
  for (int i = 0; i < n; i++) {
    const float *r = pts + (size_t)i * cols;
    int64_t kx = (int64_t)std::floor(r[0] * inv);
    int64_t ky = (int64_t)std::floor(r[1] * inv);
    int64_t kz = (int64_t)std::floor(r[2] * inv);
    int64_t key = ((kx + (1 << 20)) & 0x1FFFFF) |
                  (((ky + (1 << 20)) & 0x1FFFFF) << 21) |
                  (((kz + (1 << 20)) & 0x1FFFFF) << 42);
    auto it = cells.find(key);
    if (it == cells.end()) {
      Acc a{};
      a.order = order++;
      a.count = 1;
      for (int c = 0; c < cols && c < 8; c++) a.sum[c] = r[c];
      cells.emplace(key, a);
    } else {
      it->second.count++;
      for (int c = 0; c < cols && c < 8; c++) it->second.sum[c] += r[c];
    }
  }
  int m = (int)cells.size();
  if (m > max_out) m = max_out;
  std::vector<const Acc *> by_order(cells.size(), nullptr);
  for (auto &kv : cells) by_order[kv.second.order] = &kv.second;
  for (int i = 0; i < m; i++) {
    const Acc *a = by_order[i];
    for (int c = 0; c < cols && c < 8; c++)
      out[(size_t)i * cols + c] = (float)(a->sum[c] / a->count);
  }
  return m;
}

}  // extern "C"
