// Single-core C++ baseline for the LIO hot loop (BASELINE.md).
//
// Re-creates the computational shape of the reference's per-scan
// iterated-EKF work (hku-mars/FAST-LIVO, src/laserMapping.cpp:1506-1732)
// as an honest single-thread CPU baseline to benchmark the TPU build
// against: a static median-split kd-tree over the map (stand-in for the
// incremental ikd-Tree's query side), per-point 5-NN search with a
// bounded insertion heap, 5-point plane fit via 3x3 normal equations,
// residual gating, Jacobian-row assembly and 6x6 Gram accumulation, plus
// the 18x18 gain solve per iteration. Re-searches happen on 3 of the 6
// iterations, mirroring the rematch protocol.
//
// This is new code, not a copy: the reference's ikd-Tree carries
// incremental insert/delete machinery irrelevant to steady-state query
// throughput; a static kd-tree is, if anything, generous to the
// baseline.
//
// Output: one line "points_per_sec <value>".

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

struct P3 {
  float x, y, z;
};

static inline float sqdist(const P3 &a, const P3 &b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

// ---------------- static kd-tree ----------------
struct KdTree {
  std::vector<P3> pts;   // reordered
  std::vector<int> axis; // split axis per node (implicit balanced layout)

  void build(std::vector<P3> v) {
    pts = std::move(v);
    axis.assign(pts.size(), 0);
    build_rec(0, (int)pts.size(), 0);
  }

  void build_rec(int lo, int hi, int depth) {
    if (hi - lo <= 1) return;
    int mid = (lo + hi) / 2;
    int ax = depth % 3;
    std::nth_element(
        pts.begin() + lo, pts.begin() + mid, pts.begin() + hi,
        [ax](const P3 &a, const P3 &b) {
          return (&a.x)[ax] < (&b.x)[ax];
        });
    if (lo < (int)axis.size()) axis[mid] = ax;
    build_rec(lo, mid, depth + 1);
    build_rec(mid + 1, hi, depth + 1);
  }

  // bounded 5-NN with a small insertion heap (MANUAL_HEAP equivalent)
  void knn5(const P3 &q, float *d2, P3 *out) const {
    for (int i = 0; i < 5; i++) d2[i] = 1e30f;
    search_rec(q, 0, (int)pts.size(), 0, d2, out);
  }

  void search_rec(const P3 &q, int lo, int hi, int depth, float *d2,
                  P3 *out) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    const P3 &p = pts[mid];
    float d = sqdist(q, p);
    if (d < d2[4]) {
      int i = 4;
      while (i > 0 && d2[i - 1] > d) {
        d2[i] = d2[i - 1];
        out[i] = out[i - 1];
        i--;
      }
      d2[i] = d;
      out[i] = p;
    }
    int ax = depth % 3;
    float diff = (&q.x)[ax] - (&p.x)[ax];
    int first_lo = diff < 0;
    if (first_lo) {
      search_rec(q, lo, mid, depth + 1, d2, out);
      if (diff * diff < d2[4]) search_rec(q, mid + 1, hi, depth + 1, d2, out);
    } else {
      search_rec(q, mid + 1, hi, depth + 1, d2, out);
      if (diff * diff < d2[4]) search_rec(q, lo, mid, depth + 1, d2, out);
    }
  }
};

// 3x3 solve (Cramer) for the plane normal equations A n = -1
static bool esti_plane(const P3 *nb, float thresh, float *pabcd) {
  double A[3][3] = {{0}};
  double b[3] = {0};
  for (int i = 0; i < 5; i++) {
    double r[3] = {nb[i].x, nb[i].y, nb[i].z};
    for (int j = 0; j < 3; j++) {
      for (int k = 0; k < 3; k++) A[j][k] += r[j] * r[k];
      b[j] += -r[j];
    }
  }
  double det = A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1]) -
               A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0]) +
               A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]);
  if (std::fabs(det) < 1e-12) return false;
  double inv = 1.0 / det;
  double n0 = inv * (b[0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1]) -
                     A[0][1] * (b[1] * A[2][2] - A[1][2] * b[2]) +
                     A[0][2] * (b[1] * A[2][1] - A[1][1] * b[2]));
  double n1 = inv * (A[0][0] * (b[1] * A[2][2] - A[1][2] * b[2]) -
                     b[0] * (A[1][0] * A[2][2] - A[1][2] * A[2][0]) +
                     A[0][2] * (A[1][0] * b[2] - b[1] * A[2][0]));
  double n2 = inv * (A[0][0] * (A[1][1] * b[2] - b[1] * A[2][1]) -
                     A[0][1] * (A[1][0] * b[2] - b[1] * A[2][0]) +
                     b[0] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]));
  double norm = std::sqrt(n0 * n0 + n1 * n1 + n2 * n2);
  pabcd[0] = (float)(n0 / norm);
  pabcd[1] = (float)(n1 / norm);
  pabcd[2] = (float)(n2 / norm);
  pabcd[3] = (float)(1.0 / norm);
  for (int i = 0; i < 5; i++) {
    float d = pabcd[0] * nb[i].x + pabcd[1] * nb[i].y + pabcd[2] * nb[i].z +
              pabcd[3];
    if (std::fabs(d) > thresh) return false;
  }
  return true;
}

// 18x18 gaussian elimination (the K_1 solve stand-in)
static void solve18(double A[18][18], double B[18][6]) {
  for (int k = 0; k < 18; k++) {
    int piv = k;
    for (int i = k + 1; i < 18; i++)
      if (std::fabs(A[i][k]) > std::fabs(A[piv][k])) piv = i;
    std::swap(A[k], A[piv]);
    for (int j = 0; j < 6; j++) std::swap(B[k][j], B[piv][j]);
    double d = A[k][k];
    for (int j = k; j < 18; j++) A[k][j] /= d;
    for (int j = 0; j < 6; j++) B[k][j] /= d;
    for (int i = 0; i < 18; i++) {
      if (i == k) continue;
      double f = A[i][k];
      if (f == 0.0) continue;
      for (int j = k; j < 18; j++) A[i][j] -= f * A[k][j];
      for (int j = 0; j < 6; j++) B[i][j] -= f * B[k][j];
    }
  }
}

int main(int argc, char **argv) {
  int n_map = 400000, n_scan = 16384, iters = 6, reps = 5;
  if (argc > 1) n_scan = std::atoi(argv[1]);
  std::mt19937_64 rng(0);
  std::uniform_real_distribution<float> u(0.f, 1.f);

  // box world (same generator shape as bench.py::build_world)
  float lo[3] = {-20.f, -20.f, 0.f}, hi[3] = {20.f, 20.f, 8.f};
  std::vector<P3> map_pts(n_map);
  for (auto &p : map_pts) {
    int face = (int)(u(rng) * 6);
    int ax = face / 2;
    float v[3];
    for (int j = 0; j < 3; j++) v[j] = lo[j] + u(rng) * (hi[j] - lo[j]);
    v[ax] = (face % 2) ? hi[ax] : lo[ax];
    p = {v[0], v[1], v[2]};
  }
  std::vector<P3> scan(n_scan);
  for (int i = 0; i < n_scan; i++) {
    P3 p = map_pts[(size_t)(u(rng) * n_map)];
    scan[i] = {p.x - 0.03f, p.y + 0.02f, p.z - 2.0f};
  }

  KdTree tree;
  tree.build(map_pts);

  std::vector<float> nbr_d2(n_scan * 5);
  std::vector<P3> nbr(n_scan * 5);
  double t_total = 0;
  double sink = 0;
  for (int rep = 0; rep < reps; rep++) {
    auto t0 = std::chrono::steady_clock::now();
    double pose[3] = {0.03, -0.02, 2.01};
    for (int it = 0; it < iters; it++) {
      bool research = (it == 0 || it == 2 || it == 4);
      double HTH[6][6] = {{0}};
      double HTz[6] = {0};
      for (int i = 0; i < n_scan; i++) {
        P3 q = {scan[i].x + (float)pose[0], scan[i].y + (float)pose[1],
                scan[i].z + (float)pose[2]};
        if (research) tree.knn5(q, &nbr_d2[i * 5], &nbr[i * 5]);
        if (nbr_d2[i * 5 + 4] > 5.f) continue;
        float pabcd[4];
        if (!esti_plane(&nbr[i * 5], 0.1f, pabcd)) continue;
        float pd2 = pabcd[0] * q.x + pabcd[1] * q.y + pabcd[2] * q.z + pabcd[3];
        float norm = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z);
        float s = 1.f - 0.9f * std::fabs(pd2) / std::sqrt(norm);
        if (s <= 0.9f || std::fabs(pd2) > 2.f) continue;
        // H row: [ p x (R^T n), n ] with R = I here
        float cx = q.y * pabcd[2] - q.z * pabcd[1];
        float cy = q.z * pabcd[0] - q.x * pabcd[2];
        float cz = q.x * pabcd[1] - q.y * pabcd[0];
        double h[6] = {cx, cy, cz, pabcd[0], pabcd[1], pabcd[2]};
        for (int a = 0; a < 6; a++) {
          for (int b = 0; b <= a; b++) HTH[a][b] += h[a] * h[b];
          HTz[a] += h[a] * (-pd2);
        }
      }
      for (int a = 0; a < 6; a++)
        for (int b = a + 1; b < 6; b++) HTH[a][b] = HTH[b][a];
      // 18x18 gain solve as in the reference (K_1)
      double S[18][18] = {{0}}, Bm[18][6] = {{0}};
      for (int a = 0; a < 18; a++) S[a][a] = 1.0;
      for (int a = 0; a < 6; a++)
        for (int b = 0; b < 6; b++) S[a][b] += HTH[a][b] * 1e-3;
      for (int a = 0; a < 18; a++)
        for (int b = 0; b < 6; b++) Bm[a][b] = (a == b) ? 1.0 : 0.0;
      solve18(S, Bm);
      double sol[6] = {0};
      for (int a = 0; a < 6; a++)
        for (int b = 0; b < 6; b++) sol[a] += Bm[a][b] * HTz[b] * 1e-6;
      pose[0] -= sol[3];
      pose[1] -= sol[4];
      pose[2] -= sol[5];
      sink += sol[0] + sol[1] + sol[2];
    }
    auto t1 = std::chrono::steady_clock::now();
    t_total += std::chrono::duration<double>(t1 - t0).count();
  }
  double per_scan = t_total / reps;
  std::fprintf(stderr, "scan_time_ms %.2f (sink %.3g)\n", per_scan * 1e3, sink);
  std::printf("points_per_sec %.1f\n", n_scan / per_scan);

  // ---------------- VIO photometric baseline ----------------
  // Computational shape of the reference's UpdateState inner loop
  // (hku-mars/FAST-LIVO, src/lidar_selection.cpp:789-879): per tracked
  // point per patch pixel, bilinear-sample the current image and its
  // half-difference gradients, chain Jimg*Jdpi*[pf]x into a 6-column H
  // row, accumulate H^T H / H^T z, then the 18x18 gain solve per
  // iteration; 3 pyramid levels (ComputeJ, :967-983), 10 iterations
  // each (max_iteration, config/avia.yaml:3). Single thread, like the
  // reference's VIO path (no omp there).
  {
    const int W = 640, Hh = 512, PS = 8, n_pts = 400, vio_iters = 10;
    const int levels = 3;
    std::vector<float> img((size_t)W * Hh);
    for (int y = 0; y < Hh; y++)
      for (int x = 0; x < W; x++)
        img[(size_t)y * W + x] =
            128.f + 60.f * std::sin(0.17f * x) * std::cos(0.23f * y) +
            20.f * u(rng);
    struct VPt { float x, y, z; float patch[3][64]; };
    std::vector<VPt> pts(n_pts);
    std::uniform_real_distribution<float> ux(-2.f, 2.f), uz(3.f, 10.f);
    const float fx = 400.f, fy = 400.f, cx0 = 320.f, cy0 = 256.f;
    auto bil = [&](float x, float y) -> float {
      if (x < 1 || y < 1 || x >= W - 2 || y >= Hh - 2) return 0.f;
      int x0 = (int)x, y0 = (int)y;
      float ax = x - x0, ay = y - y0;
      const float *r0 = &img[(size_t)y0 * W + x0];
      const float *r1 = r0 + W;
      return (1 - ax) * (1 - ay) * r0[0] + ax * (1 - ay) * r0[1] +
             (1 - ax) * ay * r1[0] + ax * ay * r1[1];
    };
    for (auto &p : pts) {
      p.z = uz(rng);
      p.x = ux(rng) * p.z / 4.f;
      p.y = ux(rng) * p.z / 5.f;
      for (int l = 0; l < levels; l++) {
        float sc = 1.f / (1 << l);
        float u0 = fx * p.x / p.z * sc + cx0 * sc, v0 = fy * p.y / p.z * sc + cy0 * sc;
        for (int k = 0; k < 64; k++)
          p.patch[l][k] = bil(u0 + (k % PS) - PS / 2 + 0.3f,
                              v0 + (k / PS) - PS / 2 + 0.2f);
      }
    }
    double pose2[6] = {0.002, -0.001, 0.001, 0.01, -0.008, 0.005};
    double vsink = 0;
    auto tv0 = std::chrono::steady_clock::now();
    int vio_reps = 20;
    for (int rep = 0; rep < vio_reps; rep++) {
      for (int l = levels - 1; l >= 0; l--) {
        float sc = 1.f / (1 << l);
        for (int it = 0; it < vio_iters; it++) {
          double HTH[6][6] = {{0}}, HTz[6] = {0};
          for (int i = 0; i < n_pts; i++) {
            const VPt &p = pts[i];
            // pf = R p + t with small-angle R(pose2[0:3])
            float pfx = p.x + pose2[1] * p.z - pose2[2] * p.y + pose2[3];
            float pfy = p.y + pose2[2] * p.x - pose2[0] * p.z + pose2[4];
            float pfz = p.z + pose2[0] * p.y - pose2[1] * p.x + pose2[5];
            float iz = 1.f / pfz;
            float u0 = fx * pfx * iz * sc + cx0 * sc;
            float v0 = fy * pfy * iz * sc + cy0 * sc;
            // dpi (2x3) at this point
            float d00 = fx * iz * sc, d02 = -fx * pfx * iz * iz * sc;
            float d11 = fy * iz * sc, d12 = -fy * pfy * iz * iz * sc;
            for (int k = 0; k < 64; k++) {
              float uu = u0 + (k % PS) - PS / 2, vv = v0 + (k / PS) - PS / 2;
              float val = bil(uu, vv);
              float du = 0.5f * (bil(uu + 1, vv) - bil(uu - 1, vv));
              float dv = 0.5f * (bil(uu, vv + 1) - bil(uu, vv - 1));
              float res = p.patch[l][k] - val;
              // Jimg*Jdpi (1x3), then [pf]x chain for rotation cols
              float jx = du * d00, jy = dv * d11, jz = du * d02 + dv * d12;
              double h[6] = {jy * pfz - jz * pfy, jz * pfx - jx * pfz,
                             jx * pfy - jy * pfx, jx, jy, jz};
              for (int a = 0; a < 6; a++) {
                for (int b = 0; b <= a; b++) HTH[a][b] += h[a] * h[b];
                HTz[a] += h[a] * res;
              }
            }
          }
          for (int a = 0; a < 6; a++)
            for (int b = a + 1; b < 6; b++) HTH[a][b] = HTH[b][a];
          double S[18][18] = {{0}}, Bm[18][6] = {{0}};
          for (int a = 0; a < 18; a++) S[a][a] = 1.0;
          for (int a = 0; a < 6; a++)
            for (int b = 0; b < 6; b++) S[a][b] += HTH[a][b] * 1e-2;
          for (int a = 0; a < 18; a++)
            for (int b = 0; b < 6; b++) Bm[a][b] = (a == b) ? 1.0 : 0.0;
          solve18(S, Bm);
          double sol[6] = {0};
          for (int a = 0; a < 6; a++)
            for (int b = 0; b < 6; b++) sol[a] += Bm[a][b] * HTz[b] * 1e-8;
          for (int a = 0; a < 6; a++) pose2[a] -= sol[a];
          vsink += sol[0];
        }
      }
    }
    auto tv1 = std::chrono::steady_clock::now();
    double vt = std::chrono::duration<double>(tv1 - tv0).count();
    double rows = (double)vio_reps * levels * vio_iters * n_pts * 64;
    std::fprintf(stderr, "vio_time_ms %.2f (sink %.3g)\n", vt * 1e3, vsink);
    std::printf("vio_pixels_per_sec %.1f\n", rows / vt);
  }
  return 0;
}
