// nsc_geom: native geometric kernels for neural_spectral_codec_tpu.
//
// The reference leans on Open3D's C++ for voxel downsampling, normal
// estimation and ICP/GICP registration (reference
// src/retrieval/geometric_verification.py:48-145) and on numpy for the
// voxel-IoU keyframe overlap (reference src/data/pose_utils.py:323-389).
// These are host-side, irregular workloads — the idiomatic TPU-framework
// split keeps them in native code next to the device pipeline.
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline int64_t voxel_key(float x, float y, float z, float inv_voxel) {
  // 21 bits per axis with a large offset — same packing as the Python
  // voxel_downsample (retrieval/verification.py:33-47)
  const int64_t off = 1 << 20;
  int64_t vx = (int64_t)std::floor(x * inv_voxel) + off;
  int64_t vy = (int64_t)std::floor(y * inv_voxel) + off;
  int64_t vz = (int64_t)std::floor(z * inv_voxel) + off;
  return (vx << 42) | (vy << 21) | vz;
}

// --- sorted flat grid for batch kNN sweeps ---------------------------------
//
// For per-point kNN over a whole cloud (normals / GICP covariances) the
// hash grid's 27 unordered_map lookups per query dominate (memory-scattered
// buckets). This variant keeps points sorted by cell key in two flat
// arrays; each neighbor cell is an equal_range over the contiguous keys
// (binary search in cache-resident memory), ~2x faster end to end.

struct SortedGrid {
  float inv_cell;
  std::vector<int64_t> keys;   // sorted cell key per point
  std::vector<int> order;      // point index per sorted slot
  const float* pts;
  int n;

  void build(const float* p, int count, float cell_size) {
    pts = p;
    n = count;
    inv_cell = 1.0f / cell_size;
    std::vector<std::pair<int64_t, int>> kv(count);
    for (int i = 0; i < count; i++)
      kv[i] = {voxel_key(p[3 * i], p[3 * i + 1], p[3 * i + 2], inv_cell), i};
    std::sort(kv.begin(), kv.end());
    keys.resize(count);
    order.resize(count);
    for (int i = 0; i < count; i++) {
      keys[i] = kv[i].first;
      order[i] = kv[i].second;
    }
  }

  void cell_range(int64_t key, int& lo, int& hi) const {
    auto l = std::lower_bound(keys.begin(), keys.end(), key);
    auto h = std::upper_bound(l, keys.end(), key);
    lo = (int)(l - keys.begin());
    hi = (int)(h - keys.begin());
  }

  // nearest neighbor of q within `radius` (radius <= cell); -1 if none.
  // 9 contiguous z-row scans instead of Grid's 27 hash probes.
  int nearest(const float* q, float radius) const {
    const int64_t off = 1 << 20;
    int64_t cx = (int64_t)std::floor(q[0] * inv_cell) + off;
    int64_t cy = (int64_t)std::floor(q[1] * inv_cell) + off;
    int64_t cz = (int64_t)std::floor(q[2] * inv_cell) + off;
    float best = radius * radius;
    int best_i = -1;
    for (int dx = -1; dx <= 1; dx++)
      for (int dy = -1; dy <= 1; dy++) {
        int64_t base = ((cx + dx) << 42) | ((cy + dy) << 21);
        auto l = std::lower_bound(keys.begin(), keys.end(),
                                  base | (cz - 1));
        auto h = std::upper_bound(l, keys.end(), base | (cz + 1));
        for (auto it = l; it != h; ++it) {
          int i = order[it - keys.begin()];
          float ddx = pts[3 * i] - q[0];
          float ddy = pts[3 * i + 1] - q[1];
          float ddz = pts[3 * i + 2] - q[2];
          float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
          if (d2 < best) {
            best = d2;
            best_i = i;
          }
        }
      }
    return best_i;
  }

  // same ring-growth contract as Grid::candidates
  void candidates(const float* q, int want, std::vector<int>& out) const {
    const int64_t off = 1 << 20;
    int64_t cx = (int64_t)std::floor(q[0] * inv_cell) + off;
    int64_t cy = (int64_t)std::floor(q[1] * inv_cell) + off;
    int64_t cz = (int64_t)std::floor(q[2] * inv_cell) + off;
    for (int ring = 1; ring <= 4; ring++) {
      out.clear();
      for (int dx = -ring; dx <= ring; dx++)
        for (int dy = -ring; dy <= ring; dy++) {
          // z-cells are key-contiguous: one range scan per (dx, dy) row
          int64_t base = ((cx + dx) << 42) | ((cy + dy) << 21);
          int lo, hi;
          auto l = std::lower_bound(keys.begin(), keys.end(),
                                    base | (cz - ring));
          auto h = std::upper_bound(l, keys.end(), base | (cz + ring));
          lo = (int)(l - keys.begin());
          hi = (int)(h - keys.begin());
          for (int s = lo; s < hi; s++) out.push_back(order[s]);
        }
      if ((int)out.size() >= want) return;
    }
  }
};


// k-NN PCA covariance of q's neighborhood: gather candidates from the
// grid, keep the k nearest (nth_element — PCA needs the SET, not its
// order), accumulate centered second moments into C. Returns the
// neighbor count used. Shared by normal and GICP-covariance estimation.
static int knn_pca_covariance(const SortedGrid& grid, const float* pts,
                              const float* q, int k,
                              std::vector<int>& cand,
                              std::vector<std::pair<float, int>>& dist,
                              double C[3][3]) {
  grid.candidates(q, k, cand);
  dist.clear();
  for (int j : cand) {
    float dx = pts[3 * j] - q[0], dy = pts[3 * j + 1] - q[1],
          dz = pts[3 * j + 2] - q[2];
    dist.push_back({dx * dx + dy * dy + dz * dz, j});
  }
  int kk = std::min((int)dist.size(), k);
  std::nth_element(dist.begin(), dist.begin() + (kk ? kk - 1 : 0),
                   dist.end());
  double mx = 0, my = 0, mz = 0;
  for (int t = 0; t < kk; t++) {
    int j = dist[t].second;
    mx += pts[3 * j]; my += pts[3 * j + 1]; mz += pts[3 * j + 2];
  }
  if (kk > 0) { mx /= kk; my /= kk; mz /= kk; }
  for (int a = 0; a < 3; a++)
    for (int c = 0; c < 3; c++) C[a][c] = 0.0;
  for (int t = 0; t < kk; t++) {
    int j = dist[t].second;
    double cx = pts[3 * j] - mx, cy = pts[3 * j + 1] - my,
           cz = pts[3 * j + 2] - mz;
    C[0][0] += cx * cx; C[0][1] += cx * cy; C[0][2] += cx * cz;
    C[1][1] += cy * cy; C[1][2] += cy * cz; C[2][2] += cz * cz;
  }
  C[1][0] = C[0][1]; C[2][0] = C[0][2]; C[2][1] = C[1][2];
  return kk;
}

// --- tiny linear algebra --------------------------------------------------

// symmetric 3x3 eigen-decomposition by Jacobi rotations; eigenvalues land
// on the diagonal of `a` and eigenvectors in the COLUMNS of `v`
static void jacobi_eig3(double a[3][3], double v[3][3]) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) v[i][j] = (i == j) ? 1.0 : 0.0;
  const double scale = std::fabs(a[0][0]) + std::fabs(a[1][1]) +
                       std::fabs(a[2][2]) + 1e-30;
  for (int sweep = 0; sweep < 16; sweep++) {
    double offdiag = std::fabs(a[0][1]) + std::fabs(a[0][2]) +
                     std::fabs(a[1][2]);
    if (offdiag < 1e-12 * scale) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::fabs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
  }
}

static void smallest_eigvec3(double a[3][3], float out[3]) {
  double v[3][3];
  jacobi_eig3(a, v);
  int mi = 0;
  if (a[1][1] < a[mi][mi]) mi = 1;
  if (a[2][2] < a[mi][mi]) mi = 2;
  for (int k = 0; k < 3; k++) out[k] = (float)v[k][mi];
}

// inverse of a symmetric 3x3 via adjugate; falls back to a damped inverse
// when near-singular
static void inv3_sym(const double m[3][3], double out[3][3]) {
  double a = m[0][0], b = m[0][1], c = m[0][2];
  double d = m[1][1], e = m[1][2], f = m[2][2];
  double det = a * (d * f - e * e) - b * (b * f - e * c) +
               c * (b * e - d * c);
  if (std::fabs(det) < 1e-18) {
    double md[3][3] = {{a + 1e-6, b, c}, {b, d + 1e-6, e}, {c, e, f + 1e-6}};
    inv3_sym(md, out);
    return;
  }
  double inv = 1.0 / det;
  out[0][0] = (d * f - e * e) * inv;
  out[0][1] = out[1][0] = (c * e - b * f) * inv;
  out[0][2] = out[2][0] = (b * e - c * d) * inv;
  out[1][1] = (a * f - c * c) * inv;
  out[1][2] = out[2][1] = (b * c - a * e) * inv;
  out[2][2] = (a * d - b * b) * inv;
}

// solve 6x6 SPD system in-place via Cholesky; returns false if singular
static bool solve6(double A[6][6], double b[6], double x[6]) {
  for (int i = 0; i < 6; i++) A[i][i] += 1e-9;  // Levenberg damping
  double L[6][6] = {};
  for (int i = 0; i < 6; i++) {
    for (int j = 0; j <= i; j++) {
      double s = A[i][j];
      for (int k = 0; k < j; k++) s -= L[i][k] * L[j][k];
      if (i == j) {
        if (s <= 0) return false;
        L[i][i] = std::sqrt(s);
      } else {
        L[i][j] = s / L[j][j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; i++) {
    double s = b[i];
    for (int k = 0; k < i; k++) s -= L[i][k] * y[k];
    y[i] = s / L[i][i];
  }
  for (int i = 5; i >= 0; i--) {
    double s = y[i];
    for (int k = i + 1; k < 6; k++) s -= L[k][i] * x[k];
    x[i] = s / L[i][i];
  }
  return true;
}

// T_out = exp([w, t]) * T  (small-angle Rodrigues, matches _se3_exp in
// retrieval/verification.py:81-93)
static void se3_update(const double xi[6], float T[16]) {
  double w0 = xi[0], w1 = xi[1], w2 = xi[2];
  double th = std::sqrt(w0 * w0 + w1 * w1 + w2 * w2) + 1e-12;
  double K[3][3] = {{0, -w2, w1}, {w2, 0, -w0}, {-w1, w0, 0}};
  double A = std::sin(th) / th, B = (1 - std::cos(th)) / (th * th);
  double R[3][3];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double kk = 0;
      for (int k = 0; k < 3; k++) kk += K[i][k] * K[k][j];
      R[i][j] = (i == j ? 1.0 : 0.0) + A * K[i][j] + B * kk;
    }
  float Tn[16];
  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 4; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += R[i][k] * T[4 * k + j];
      Tn[4 * i + j] = (float)s;
    }
    Tn[4 * i + 3] += (float)xi[3 + i];
  }
  Tn[12] = 0; Tn[13] = 0; Tn[14] = 0; Tn[15] = 1;
  std::memcpy(T, Tn, sizeof(Tn));
}

}  // namespace

extern "C" {

// Mean-per-voxel downsampling (Open3D voxel_down_sample semantics,
// reference geometric_verification.py:67). Output ordered by voxel key
// (ascending) to match the numpy implementation exactly.
// Returns the number of output points written (<= max_out).
int nsc_voxel_downsample(const float* pts, int n, float voxel,
                         float* out, int max_out) {
  if (voxel <= 0 || n <= 0) return 0;
  float inv = 1.0f / voxel;
  struct Acc { double x = 0, y = 0, z = 0; int c = 0; };
  std::unordered_map<int64_t, Acc> acc;
  acc.reserve(n);
  for (int i = 0; i < n; i++) {
    float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z))
      continue;
    Acc& a = acc[voxel_key(x, y, z, inv)];
    a.x += x; a.y += y; a.z += z; a.c++;
  }
  std::vector<std::pair<int64_t, Acc>> items(acc.begin(), acc.end());
  std::sort(items.begin(), items.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  int m = std::min((int)items.size(), max_out);
  for (int i = 0; i < m; i++) {
    const Acc& a = items[i].second;
    out[3 * i] = (float)(a.x / a.c);
    out[3 * i + 1] = (float)(a.y / a.c);
    out[3 * i + 2] = (float)(a.z / a.c);
  }
  return m;
}

// kNN-PCA unit normals (Open3D estimate_normals semantics, reference
// geometric_verification.py:88-94). grid_cell should be ~ the expected
// neighbor radius (e.g. 2x the voxel size).
void nsc_estimate_normals(const float* pts, int n, int k, float grid_cell,
                          float* out) {
  SortedGrid grid;
  grid.build(pts, n, grid_cell);
  std::vector<int> cand;
  std::vector<std::pair<float, int>> dist;
  for (int i = 0; i < n; i++) {
    double C[3][3];
    knn_pca_covariance(grid, pts, &pts[3 * i], k, cand, dist, C);
    smallest_eigvec3(C, &out[3 * i]);
  }
}

// GICP-regularized per-point covariances (Segal et al. 2009, as used by
// Open3D's TransformationEstimationForGeneralizedICP — reference
// geometric_verification.py:96-117): kNN-PCA covariance with its
// eigenvalues replaced by (1, 1, eps) — a disk orthogonal to the local
// normal. out is n row-major 3x3 matrices (9 floats per point).
void nsc_estimate_covariances(const float* pts, int n, int k,
                              float grid_cell, float eps, float* out) {
  SortedGrid grid;
  grid.build(pts, n, grid_cell);
  std::vector<int> cand;
  std::vector<std::pair<float, int>> dist;
  for (int i = 0; i < n; i++) {
    double C[3][3];
    knn_pca_covariance(grid, pts, &pts[3 * i], k, cand, dist, C);
    double V[3][3];
    jacobi_eig3(C, V);
    // rank eigenvalues: the two largest directions get 1, smallest gets eps
    double ev[3] = {C[0][0], C[1][1], C[2][2]};
    int mi = 0;
    if (ev[1] < ev[mi]) mi = 1;
    if (ev[2] < ev[mi]) mi = 2;
    // C_reg = sum_r d_r * v_r v_r^T with d = 1 except eps on the normal
    double Cr[3][3] = {};
    for (int r = 0; r < 3; r++) {
      double d = (r == mi) ? (double)eps : 1.0;
      for (int a = 0; a < 3; a++)
        for (int c = 0; c < 3; c++) Cr[a][c] += d * V[a][r] * V[c][r];
    }
    for (int a = 0; a < 3; a++)
      for (int c = 0; c < 3; c++) out[9 * i + 3 * a + c] = (float)Cr[a][c];
  }
}

// Generalized ICP (Segal et al.): Gauss-Newton on the Mahalanobis residual
// r^T (C_q + R C_p R^T)^{-1} r per correspondence — the formulation behind
// Open3D's registration_generalized_icp (reference
// geometric_verification.py:96-133). cov_src/cov_dst are the regularized
// per-point covariances from nsc_estimate_covariances. fitness/rmse are the
// same point-point inlier statistics as nsc_icp (Open3D reports these too).
void nsc_gicp(const float* src, int ns, const float* cov_src,
              const float* dst, int nd, const float* cov_dst,
              const float* T_init, int max_iters, float max_corr,
              float* T_out, float* fitness, float* rmse) {
  float T[16];
  std::memcpy(T, T_init, sizeof(T));
  SortedGrid grid;
  grid.build(dst, nd, max_corr);

  for (int iter = 0; iter < max_iters; iter++) {
    double A[6][6] = {}, b[6] = {};
    int inliers = 0;
    const double R[3][3] = {{T[0], T[1], T[2]},
                            {T[4], T[5], T[6]},
                            {T[8], T[9], T[10]}};
    for (int i = 0; i < ns; i++) {
      float p[3] = {src[3 * i], src[3 * i + 1], src[3 * i + 2]};
      float tp[3] = {
          T[0] * p[0] + T[1] * p[1] + T[2] * p[2] + T[3],
          T[4] * p[0] + T[5] * p[1] + T[6] * p[2] + T[7],
          T[8] * p[0] + T[9] * p[1] + T[10] * p[2] + T[11]};
      int j = grid.nearest(tp, max_corr);
      if (j < 0) continue;
      inliers++;
      const float* q = &dst[3 * j];
      double r[3] = {tp[0] - q[0], tp[1] - q[1], tp[2] - q[2]};
      // S = C_q + R C_p R^T ; M = S^{-1}
      const float* Cp = &cov_src[9 * i];
      const float* Cq = &cov_dst[9 * j];
      double RC[3][3];
      for (int a = 0; a < 3; a++)
        for (int c = 0; c < 3; c++) {
          double s = 0;
          for (int k = 0; k < 3; k++) s += R[a][k] * Cp[3 * k + c];
          RC[a][c] = s;
        }
      double S[3][3];
      for (int a = 0; a < 3; a++)
        for (int c = 0; c < 3; c++) {
          double s = 0;
          for (int k = 0; k < 3; k++) s += RC[a][k] * R[c][k];
          S[a][c] = Cq[3 * a + c] + s;
        }
      double M[3][3];
      inv3_sym(S, M);
      // J (3x6) = [ -[tp]x | I ] row-blocks
      double J[3][6] = {{0, tp[2], -tp[1], 1, 0, 0},
                        {-tp[2], 0, tp[0], 0, 1, 0},
                        {tp[1], -tp[0], 0, 0, 0, 1}};
      // A += J^T M J ; b -= J^T M r
      double MJ[3][6], Mr[3];
      for (int a = 0; a < 3; a++) {
        Mr[a] = M[a][0] * r[0] + M[a][1] * r[1] + M[a][2] * r[2];
        for (int c = 0; c < 6; c++)
          MJ[a][c] = M[a][0] * J[0][c] + M[a][1] * J[1][c] +
                     M[a][2] * J[2][c];
      }
      for (int a = 0; a < 6; a++) {
        b[a] -= J[0][a] * Mr[0] + J[1][a] * Mr[1] + J[2][a] * Mr[2];
        for (int c = a; c < 6; c++)
          A[a][c] += J[0][a] * MJ[0][c] + J[1][a] * MJ[1][c] +
                     J[2][a] * MJ[2][c];
      }
    }
    if (inliers < 6) break;
    for (int a = 0; a < 6; a++)
      for (int c = 0; c < a; c++) A[a][c] = A[c][a];
    double xi[6];
    if (!solve6(A, b, xi)) break;
    se3_update(xi, T);
    double step = 0;
    for (int a = 0; a < 6; a++) step += xi[a] * xi[a];
    if (step < 1e-14) break;
  }
  std::memcpy(T_out, T, sizeof(T));
  // final point-point inlier statistics of T_out
  int inliers = 0;
  double sq_sum = 0;
  for (int i = 0; i < ns; i++) {
    float p[3] = {src[3 * i], src[3 * i + 1], src[3 * i + 2]};
    float tp[3] = {
        T[0] * p[0] + T[1] * p[1] + T[2] * p[2] + T[3],
        T[4] * p[0] + T[5] * p[1] + T[6] * p[2] + T[7],
        T[8] * p[0] + T[9] * p[1] + T[10] * p[2] + T[11]};
    int j = grid.nearest(tp, max_corr);
    if (j < 0) continue;
    const float* q = &dst[3 * j];
    double dx = tp[0] - q[0], dy = tp[1] - q[1], dz = tp[2] - q[2];
    inliers++;
    sq_sum += dx * dx + dy * dy + dz * dz;
  }
  *fitness = ns > 0 ? (float)((double)inliers / ns) : 0.0f;
  *rmse = inliers > 0 ? (float)std::sqrt(sq_sum / inliers) : 0.0f;
}

// Gauss-Newton ICP (point-to-point) / point-to-plane.
// src (ns,3), dst (nd,3), normals (nd,3) or null for p2p, T row-major 4x4
// in/out. fitness = inliers/ns, rmse over inlier point-point distances —
// same accept statistics as the reference (geometric_verification.py:133).
void nsc_icp(const float* src, int ns, const float* dst, int nd,
             const float* normals, const float* T_init, int max_iters,
             float max_corr, float* T_out, float* fitness, float* rmse) {
  float T[16];
  std::memcpy(T, T_init, sizeof(T));
  SortedGrid grid;
  grid.build(dst, nd, max_corr);

  // correspondence statistics of a FIXED transform (reported stats must
  // describe T_out, so they are recomputed after the final update — the
  // JAX kernel does the same)
  auto stats = [&](const float* Tm, double* fit, double* err) {
    int inliers = 0;
    double sq_sum = 0;
    for (int i = 0; i < ns; i++) {
      float p[3] = {src[3 * i], src[3 * i + 1], src[3 * i + 2]};
      float tp[3] = {
          Tm[0] * p[0] + Tm[1] * p[1] + Tm[2] * p[2] + Tm[3],
          Tm[4] * p[0] + Tm[5] * p[1] + Tm[6] * p[2] + Tm[7],
          Tm[8] * p[0] + Tm[9] * p[1] + Tm[10] * p[2] + Tm[11]};
      int j = grid.nearest(tp, max_corr);
      if (j < 0) continue;
      const float* q = &dst[3 * j];
      double dx = tp[0] - q[0], dy = tp[1] - q[1], dz = tp[2] - q[2];
      inliers++;
      sq_sum += dx * dx + dy * dy + dz * dz;
    }
    *fit = ns > 0 ? (double)inliers / ns : 0.0;
    *err = inliers > 0 ? std::sqrt(sq_sum / inliers) : 0.0;
  };

  for (int iter = 0; iter < max_iters; iter++) {
    double A[6][6] = {}, b[6] = {};
    int inliers = 0;
    double sq_sum = 0;
    for (int i = 0; i < ns; i++) {
      float p[3] = {src[3 * i], src[3 * i + 1], src[3 * i + 2]};
      float tp[3] = {
          T[0] * p[0] + T[1] * p[1] + T[2] * p[2] + T[3],
          T[4] * p[0] + T[5] * p[1] + T[6] * p[2] + T[7],
          T[8] * p[0] + T[9] * p[1] + T[10] * p[2] + T[11]};
      int j = grid.nearest(tp, max_corr);
      if (j < 0) continue;
      const float* q = &dst[3 * j];
      float r[3] = {tp[0] - q[0], tp[1] - q[1], tp[2] - q[2]};
      double d2 = (double)r[0] * r[0] + (double)r[1] * r[1] +
                  (double)r[2] * r[2];
      inliers++;
      sq_sum += d2;
      if (normals) {
        const float* nrm = &normals[3 * j];
        double rn = r[0] * nrm[0] + r[1] * nrm[1] + r[2] * nrm[2];
        // J = [ tp x n ; n ]
        double J[6] = {
            (double)tp[1] * nrm[2] - (double)tp[2] * nrm[1],
            (double)tp[2] * nrm[0] - (double)tp[0] * nrm[2],
            (double)tp[0] * nrm[1] - (double)tp[1] * nrm[0],
            nrm[0], nrm[1], nrm[2]};
        for (int a = 0; a < 6; a++) {
          b[a] -= J[a] * rn;
          for (int c = a; c < 6; c++) A[a][c] += J[a] * J[c];
        }
      } else {
        // three residual rows with J_row = [ -[tp]x | I ] per axis
        double Jw[3][3] = {{0, tp[2], -tp[1]},
                           {-tp[2], 0, tp[0]},
                           {tp[1], -tp[0], 0}};
        for (int row = 0; row < 3; row++) {
          double J[6] = {Jw[row][0], Jw[row][1], Jw[row][2], 0, 0, 0};
          J[3 + row] = 1.0;
          for (int a = 0; a < 6; a++) {
            b[a] -= J[a] * r[row];
            for (int c = a; c < 6; c++) A[a][c] += J[a] * J[c];
          }
        }
      }
    }
    if (inliers < 6) break;
    for (int a = 0; a < 6; a++)
      for (int c = 0; c < a; c++) A[a][c] = A[c][a];
    double xi[6];
    if (!solve6(A, b, xi)) break;
    se3_update(xi, T);
    double step = 0;
    for (int a = 0; a < 6; a++) step += xi[a] * xi[a];
    if (step < 1e-14) break;
  }
  std::memcpy(T_out, T, sizeof(T));
  double fit, err;
  stats(T, &fit, &err);
  *fitness = (float)fit;
  *rmse = (float)err;
}

// Voxel-IoU overlap between two clouds after transforming cloud2 by T_rel
// (reference pose_utils.py:323-389: 5k-point stride subsample, 0.2 m
// voxels, |A∩B| / |A∪B|).
float nsc_voxel_overlap(const float* pts1, int n1, const float* pts2, int n2,
                        const float* T_rel, float voxel, int max_points) {
  auto subsample = [max_points](int n) {
    return n > max_points ? (n + max_points - 1) / max_points : 1;
  };
  float inv = 1.0f / voxel;
  std::unordered_map<int64_t, uint8_t> seen;
  seen.reserve(2 * max_points);
  int s1 = subsample(n1);
  for (int i = 0; i < n1; i += s1) {
    float x = pts1[3 * i], y = pts1[3 * i + 1], z = pts1[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    seen[voxel_key(x, y, z, inv)] |= 1;
  }
  int s2 = subsample(n2);
  for (int i = 0; i < n2; i += s2) {
    float x = pts2[3 * i], y = pts2[3 * i + 1], z = pts2[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    float tx = T_rel[0] * x + T_rel[1] * y + T_rel[2] * z + T_rel[3];
    float ty = T_rel[4] * x + T_rel[5] * y + T_rel[6] * z + T_rel[7];
    float tz = T_rel[8] * x + T_rel[9] * y + T_rel[10] * z + T_rel[11];
    seen[voxel_key(tx, ty, tz, inv)] |= 2;
  }
  int inter = 0, uni = 0;
  for (auto& kv : seen) {
    uni++;
    if (kv.second == 3) inter++;
  }
  return uni > 0 ? (float)inter / uni : 0.0f;
}

}  // extern "C"
