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

#include <algorithm>
#include <cmath>
#include <functional>
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
  // the reference's dedup compares against pl_full[i-1], which is the
  // ZERO vector unless point i-1 was itself tag-valid AND stride-kept
  // (pl_full only written inside the stride branch, preprocess.cpp:
  // 145-150) — track the previous point's written-ness, not raw coords
  float px = 0.f, py = 0.f, pz = 0.f;
  bool prev_written = false;
  for (int i = 1; i < n; i++) {
    uint8_t t30 = p[i].tag & 0x30;
    bool tag_ok = (p[i].line < n_scans) && (t30 == 0x10 || t30 == 0x00);
    float x = p[i].x, y = p[i].y, z = p[i].z;
    bool written = false;
    if (tag_ok) {
      valid_num++;
      if (valid_num % filter_num == 0) {
        written = true;
        float qx = prev_written ? px : 0.f;
        float qy = prev_written ? py : 0.f;
        float qz = prev_written ? pz : 0.f;
        bool dedup = std::fabs(x - qx) > 1e-7f || std::fabs(y - qy) > 1e-7f ||
                     std::fabs(z - qz) > 1e-7f;
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
    prev_written = written;
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

// ---------------------------------------------------------------------
// LOAM-style give_feature for ONE ring (the feature-mode hot host path;
// algorithmic spec: fastlivo_tpu/features.py, which mirrors
// preprocess.cpp:466-935 semantics incl. the disA double-assignment
// quirk). Sequential per-ring classification is a poor fit for the
// device; this native version replaces the pure-Python loops.
//
// Feature enum matches features.py: NOR=0, POSS_PLANE, REAL_PLANE,
// EDGE_JUMP, EDGE_PLANE, WIRE. E_jump: NR_NOR=0, NR_ZERO, NR_180,
// NR_INF, NR_BLIND.

namespace gf {
constexpr double INF_BOUND = 10.0;
constexpr int GROUP_SIZE = 8;
constexpr double DIS_A = 0.1, DIS_B = 0.0;
constexpr double P2L_RATIO = 225.0;
constexpr double LIMIT_MAXMID = 6.25, LIMIT_MIDMIN = 6.25,
                 LIMIT_MAXMIN = 3.24;
constexpr double EDGE_A = 2.0, EDGE_B = 0.1;
constexpr double SMALLP_RATIO = 1.2;
enum { NOR = 0, POSS_PLANE, REAL_PLANE, EDGE_JUMP, EDGE_PLANE, WIRE };
enum { NR_NOR = 0, NR_ZERO, NR_180, NR_INF, NR_BLIND };

static int plane_judge(const double *pl, const double *rng,
                       const double *dista, int n, double blind, int i_cur,
                       int is_avia, int *i_nex_out, double *dir_out) {
  double group_dis = DIS_A * rng[i_cur] + DIS_B;
  group_dis *= group_dis;
  std::vector<double> disarr;
  disarr.reserve(GROUP_SIZE + 16);
  int i_nex = i_cur;
  for (i_nex = i_cur; i_nex < i_cur + GROUP_SIZE; i_nex++) {
    if (i_nex >= n || rng[i_nex] < blind) {
      *i_nex_out = i_nex;
      dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
      return 2;
    }
    disarr.push_back(dista[i_nex]);
  }
  i_nex = i_cur + GROUP_SIZE;
  double vx = 0, vy = 0, vz = 0;
  for (;;) {
    if (i_cur >= n || i_nex >= n) break;
    if (rng[i_nex] < blind) {
      *i_nex_out = i_nex;
      dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
      return 2;
    }
    vx = pl[3 * i_nex] - pl[3 * i_cur];
    vy = pl[3 * i_nex + 1] - pl[3 * i_cur + 1];
    vz = pl[3 * i_nex + 2] - pl[3 * i_cur + 2];
    double two_dis = vx * vx + vy * vy + vz * vz;
    if (two_dis >= group_dis) break;
    disarr.push_back(dista[i_nex]);
    i_nex++;
  }
  double two_dis = vx * vx + vy * vy + vz * vz;

  double leng_wid = 0.0;
  for (int j = i_cur + 1; j < i_nex; j++) {
    double sx = pl[3 * j] - pl[3 * i_cur];
    double sy = pl[3 * j + 1] - pl[3 * i_cur + 1];
    double sz = pl[3 * j + 2] - pl[3 * i_cur + 2];
    double cx = sy * vz - sz * vy;
    double cy = sz * vx - sx * vz;
    double cz = sx * vy - sy * vx;
    double lw = cx * cx + cy * cy + cz * cz;
    if (lw > leng_wid) leng_wid = lw;
  }
  *i_nex_out = i_nex;
  // reference semantics: two_dis^2 / 0 = inf >= P2L_RATIO, so exactly
  // collinear groups PROCEED to classification (preprocess.cpp:848)
  if (leng_wid > 0.0 && (two_dis * two_dis / leng_wid) < P2L_RATIO) {
    dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
    return 0;
  }
  std::vector<double> ds(disarr);
  std::sort(ds.begin(), ds.end(), std::greater<double>());
  int m = (int)ds.size();
  if (ds[m - 2] < 1e-16) {
    dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
    return 0;
  }
  if (is_avia) {
    double dismax_mid = ds[0] / ds[m / 2];
    double dismid_min = ds[m / 2] / ds[m - 2];
    if (dismax_mid >= LIMIT_MAXMID || dismid_min >= LIMIT_MIDMIN) {
      dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
      return 0;
    }
  } else {
    double dismax_min = ds[0] / ds[m - 2];
    if (dismax_min >= LIMIT_MAXMIN) {
      dir_out[0] = dir_out[1] = dir_out[2] = 0.0;
      return 0;
    }
  }
  double nrm = std::sqrt(two_dis);
  if (nrm > 0) {
    dir_out[0] = vx / nrm;
    dir_out[1] = vy / nrm;
    dir_out[2] = vz / nrm;
  } else {
    dir_out[0] = vx;
    dir_out[1] = vy;
    dir_out[2] = vz;
  }
  return 1;
}

static bool edge_jump_judge(const double *rng, const double *dista, int n,
                            double blind, int i, int nor_dir) {
  if (nor_dir == 0) {  // PREV
    if (i < 2 || rng[i - 1] < blind || rng[i - 2] < blind) return false;
  } else {  // NEXT
    if (i + 2 >= n || rng[i + 1] < blind || rng[i + 2] < blind) return false;
  }
  double d1 = dista[i + nor_dir - 1];
  double d2 = dista[i + 3 * nor_dir - 2];
  if (d1 < d2) std::swap(d1, d2);
  d1 = std::sqrt(d1);
  d2 = std::sqrt(d2);
  if (d1 > EDGE_A * d2 || (d1 - d2) > EDGE_B) return false;
  return true;
}
}  // namespace gf

// One ring. pl: (n,3) f64 row-major; curv/rng/dista: (n,) f64.
// surf_out/corn_out: (cap,4) f64. Returns 0 on success (counts in
// out_counts[0]=surf, [1]=corn), -1 on capacity overflow.
int give_feature_ring(const double *pl, const double *curv, const double *rng,
                      const double *dista, int n, double blind,
                      int point_filter_num, int is_avia,
                      double *surf_out, int surf_cap,
                      double *corn_out, int corn_cap, int *out_counts) {
  using namespace gf;
  out_counts[0] = out_counts[1] = 0;
  if (n == 0) return 0;
  std::vector<int> ftype(n, NOR);
  std::vector<int> edj(2 * (size_t)n, NR_NOR);
  std::vector<double> intersect(n, 2.0);
  const double JUMP_UP_LIMIT = std::cos(170.0 / 180.0 * M_PI);
  const double JUMP_DOWN_LIMIT = std::cos(8.0 / 180.0 * M_PI);
  const double COS160 = std::cos(160.0 / 180.0 * M_PI);
  const double SMALLP_INTERSECT = std::cos(172.5 / 180.0 * M_PI);

  int head = 0;
  while (head < n && rng[head] < blind) head++;

  // pass 1: plane groups
  int plsize2 = n > GROUP_SIZE ? n - GROUP_SIZE : 0;
  int last_state = 0;
  double last_direct[3] = {0, 0, 0};
  for (int i = head; i < plsize2; i++) {
    if (rng[i] < blind) continue;
    int i_nex;
    double curr_direct[3];
    int plane_type =
        plane_judge(pl, rng, dista, n, blind, i, is_avia, &i_nex, curr_direct);
    if (plane_type == 1) {
      int jend = i_nex < n - 1 ? i_nex : n - 1;
      for (int j = i; j <= jend; j++)
        ftype[j] = (j != i && j != i_nex) ? REAL_PLANE : POSS_PLANE;
      double ldn = std::sqrt(last_direct[0] * last_direct[0] +
                             last_direct[1] * last_direct[1] +
                             last_direct[2] * last_direct[2]);
      if (last_state == 1 && ldn > 0.1) {
        double mod = last_direct[0] * curr_direct[0] +
                     last_direct[1] * curr_direct[1] +
                     last_direct[2] * curr_direct[2];
        ftype[i] = (mod > -0.707 && mod < 0.707) ? EDGE_PLANE : REAL_PLANE;
      }
      i = i_nex - 1;
      last_state = 1;
    } else {
      i = i_nex;
      last_state = 0;
    }
    last_direct[0] = curr_direct[0];
    last_direct[1] = curr_direct[1];
    last_direct[2] = curr_direct[2];
  }

  // pass 2: edge jumps
  plsize2 = n > 3 ? n - 3 : 0;
  for (int i = head + 3; i < plsize2; i++) {
    if (rng[i] < blind || ftype[i] >= REAL_PLANE) continue;
    if (dista[i - 1] < 1e-16 || dista[i] < 1e-16) continue;
    const double *va = &pl[3 * i];
    double vprev[3], vnext[3];
    bool have_prev = false, have_next = false;
    for (int j = 0; j < 2; j++) {
      int mstep = j == 0 ? -1 : 1;
      if (rng[i + mstep] < blind) {
        edj[2 * (size_t)i + j] = rng[i] > INF_BOUND ? NR_INF : NR_BLIND;
        continue;
      }
      double v[3] = {pl[3 * (i + mstep)] - va[0],
                     pl[3 * (i + mstep) + 1] - va[1],
                     pl[3 * (i + mstep) + 2] - va[2]};
      if (j == 0) {
        std::memcpy(vprev, v, sizeof(v));
        have_prev = true;
      } else {
        std::memcpy(vnext, v, sizeof(v));
        have_next = true;
      }
      double na = std::sqrt(va[0] * va[0] + va[1] * va[1] + va[2] * va[2]);
      double nv = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
      double ang = na * nv > 0
                       ? (va[0] * v[0] + va[1] * v[1] + va[2] * v[2]) / (na * nv)
                       : 2.0;
      if (ang < JUMP_UP_LIMIT)
        edj[2 * (size_t)i + j] = NR_180;
      else if (ang > JUMP_DOWN_LIMIT)
        edj[2 * (size_t)i + j] = NR_ZERO;
    }
    if (have_prev && have_next) {
      double np_ = std::sqrt(vprev[0] * vprev[0] + vprev[1] * vprev[1] +
                             vprev[2] * vprev[2]);
      double nn = std::sqrt(vnext[0] * vnext[0] + vnext[1] * vnext[1] +
                            vnext[2] * vnext[2]);
      if (np_ * nn > 0)
        intersect[i] = (vprev[0] * vnext[0] + vprev[1] * vnext[1] +
                        vprev[2] * vnext[2]) /
                       (np_ * nn);
    }
    int ep = edj[2 * (size_t)i], en = edj[2 * (size_t)i + 1];
    if (ep == NR_NOR && en == NR_ZERO && dista[i] > 0.0225 &&
        dista[i] > 4 * dista[i - 1]) {
      if (intersect[i] > COS160 && edge_jump_judge(rng, dista, n, blind, i, 0))
        ftype[i] = EDGE_JUMP;
    } else if (ep == NR_ZERO && en == NR_NOR && dista[i - 1] > 0.0225 &&
               dista[i - 1] > 4 * dista[i]) {
      if (intersect[i] > COS160 && edge_jump_judge(rng, dista, n, blind, i, 1))
        ftype[i] = EDGE_JUMP;
    } else if (ep == NR_NOR && en == NR_INF) {
      if (edge_jump_judge(rng, dista, n, blind, i, 0)) ftype[i] = EDGE_JUMP;
    } else if (ep == NR_INF && en == NR_NOR) {
      if (edge_jump_judge(rng, dista, n, blind, i, 1)) ftype[i] = EDGE_JUMP;
    } else if (ep > NR_NOR && en > NR_NOR) {
      if (ftype[i] == NOR) ftype[i] = WIRE;
    }
  }

  // pass 3: small planes
  for (int i = head + 1; i + 1 < n; i++) {
    if (rng[i] < blind || rng[i - 1] < blind || rng[i + 1] < blind) continue;
    if (dista[i - 1] < 1e-8 || dista[i] < 1e-8) continue;
    if (ftype[i] == NOR) {
      double ratio = dista[i - 1] > dista[i] ? dista[i - 1] / dista[i]
                                             : dista[i] / dista[i - 1];
      if (intersect[i] < SMALLP_INTERSECT && ratio < SMALLP_RATIO) {
        if (ftype[i - 1] == NOR) ftype[i - 1] = REAL_PLANE;
        if (ftype[i + 1] == NOR) ftype[i + 1] = REAL_PLANE;
        ftype[i] = REAL_PLANE;
      }
    }
  }

  // pass 4: emission
  int ns = 0, nc = 0;
  int last_surface = -1;
  for (int j = head; j < n; j++) {
    if (ftype[j] == POSS_PLANE || ftype[j] == REAL_PLANE) {
      if (last_surface == -1) last_surface = j;
      if (j == last_surface + point_filter_num - 1) {
        if (ns >= surf_cap) return -1;
        surf_out[4 * ns] = pl[3 * j];
        surf_out[4 * ns + 1] = pl[3 * j + 1];
        surf_out[4 * ns + 2] = pl[3 * j + 2];
        surf_out[4 * ns + 3] = curv[j];
        ns++;
        last_surface = -1;
      }
    } else {
      if (ftype[j] == EDGE_JUMP || ftype[j] == EDGE_PLANE) {
        if (nc >= corn_cap) return -1;
        corn_out[4 * nc] = pl[3 * j];
        corn_out[4 * nc + 1] = pl[3 * j + 1];
        corn_out[4 * nc + 2] = pl[3 * j + 2];
        corn_out[4 * nc + 3] = curv[j];
        nc++;
      }
      if (last_surface != -1) {
        double sx = 0, sy = 0, sz = 0, sc = 0;
        for (int k = last_surface; k < j; k++) {
          sx += pl[3 * k];
          sy += pl[3 * k + 1];
          sz += pl[3 * k + 2];
          sc += curv[k];
        }
        double cnt = (double)(j - last_surface);
        if (ns >= surf_cap) return -1;
        surf_out[4 * ns] = sx / cnt;
        surf_out[4 * ns + 1] = sy / cnt;
        surf_out[4 * ns + 2] = sz / cnt;
        surf_out[4 * ns + 3] = sc / cnt;
        ns++;
        last_surface = -1;
      }
    }
  }
  out_counts[0] = ns;
  out_counts[1] = nc;
  return 0;
}

// ---------------------------------------------------------------------------
// LZ4 block decode + xxHash32: the rosbag chunk-decompression hot path
// (io/lz4.py holds the pure-Python spec; these are drop-in equivalents
// dispatched by io.lz4 when the library is present). The reference
// reads lz4 bag chunks through roslz4 (C); a pure-Python inner loop is
// ~100x slower on MB-scale chunks.

// Decode one LZ4 block appending at out+out_len (match offsets may
// reach the already-present prefix: linked-block window semantics).
// Returns the new out length, -1 on malformed input, -2 if out_cap
// would be exceeded (caller grows and retries).
long long lz4_decompress_block(const uint8_t *src, long long n,
                               uint8_t *out, long long out_len,
                               long long out_cap) {
  long long i = 0, o = out_len;
  while (i < n) {
    unsigned token = src[i++];
    long long lit = token >> 4;
    if (lit == 15) {
      unsigned b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (lit) {
      if (i + lit > n) return -1;
      if (o + lit > out_cap) return -2;
      memcpy(out + o, src + i, (size_t)lit);
      o += lit;
      i += lit;
    }
    if (i >= n) break;  // last sequence: literals only
    if (i + 2 > n) return -1;
    long long offset = src[i] | ((long long)src[i + 1] << 8);
    i += 2;
    if (offset == 0 || offset > o) return -1;
    long long mlen = token & 15;
    if (mlen == 15) {
      unsigned b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (o + mlen > out_cap) return -2;
    const uint8_t *m = out + o - offset;
    if (offset >= mlen) {
      memcpy(out + o, m, (size_t)mlen);
      o += mlen;
    } else {
      for (long long k = 0; k < mlen; k++) out[o + k] = m[k];  // overlap
      o += mlen;
    }
  }
  return o;
}

// xxHash32 (the LZ4 frame checksum), byte-exact with io/lz4.xxh32.
uint32_t xxh32_native(const uint8_t *p, long long n, uint32_t seed) {
  const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;
  auto rotl = [](uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
  };
  const uint8_t *end = p + n;
  uint32_t h;
  if (n >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed,
             v4 = seed - P1;
    const uint8_t *lim = end - 16;
    do {
      uint32_t a, b, c, d;
      memcpy(&a, p, 4); memcpy(&b, p + 4, 4);
      memcpy(&c, p + 8, 4); memcpy(&d, p + 12, 4);
      v1 = rotl(v1 + a * P2, 13) * P1;
      v2 = rotl(v2 + b * P2, 13) * P1;
      v3 = rotl(v3 + c * P2, 13) * P1;
      v4 = rotl(v4 + d * P2, 13) * P1;
      p += 16;
    } while (p <= lim);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)n;
  while (p + 4 <= end) {
    uint32_t a;
    memcpy(&a, p, 4);
    h = rotl(h + a * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl(h + (*p) * P5, 11) * P1;
    p++;
  }
  h ^= h >> 15;
  h *= P2;
  h ^= h >> 13;
  h *= P3;
  h ^= h >> 16;
  return h;
}

}  // extern "C"
