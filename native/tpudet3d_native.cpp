// Native runtime helpers for the host-side tracking loop.
//
// The reference leans on scipy's C LAPJV implementation for the tracker's
// Hungarian assignment (torchdet3d/utils/tracking_tools.py:203) and computes
// the GIoU cost matrix in Python loops (:234-243).  Here both live in one
// C++ translation unit: a dense O(n^3) Jonker-Volgenant solver plus a fused
// cost-matrix builder, exposed with C linkage for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libtpudet3d_native.so tpudet3d_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Jonker-Volgenant style shortest augmenting path assignment.
// cost: n_rows x n_cols row-major; solves min-cost rectangular assignment
// (n_rows <= n_cols expected; caller pads otherwise).
void solve_lap(const double* cost, int n_rows, int n_cols,
               int* row_to_col) {
  std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
  std::vector<int> p(n_cols + 1, n_rows);  // col -> assigned row (n_rows = none)
  std::vector<int> way(n_cols + 1, 0);

  for (int i = 0; i < n_rows; ++i) {
    std::vector<double> minv(n_cols + 1, kInf);
    std::vector<char> used(n_cols + 1, 0);
    int j0 = n_cols;  // virtual start column
    p[j0] = i;
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = kInf;
      for (int j = 0; j < n_cols; ++j) {
        if (used[j]) continue;
        double cur = cost[i0 * n_cols + j] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n_cols; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != n_rows);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != n_cols);
  }

  for (int i = 0; i < n_rows; ++i) row_to_col[i] = -1;
  for (int j = 0; j < n_cols; ++j) {
    if (p[j] != n_rows && p[j] >= 0) row_to_col[p[j]] = j;
  }
}

inline double box_area(const double* b) {
  return std::max(b[2] - b[0], 0.0) * std::max(b[3] - b[1], 0.0);
}

double giou(const double* b1, const double* b2) {
  const double a1 = box_area(b1), a2 = box_area(b2);
  const double ib[4] = {std::max(b1[0], b2[0]), std::max(b1[1], b2[1]),
                        std::min(b1[2], b2[2]), std::min(b1[3], b2[3])};
  const double eb[4] = {std::min(b1[0], b2[0]), std::min(b1[1], b2[1]),
                        std::max(b1[2], b2[2]), std::max(b1[3], b2[3])};
  const double inter = box_area(ib);
  const double enclose = box_area(eb);
  const double uni = a1 + a2 - inter;
  const double iou = uni > 0.0 ? inter / uni : 0.0;
  return enclose > 0.0 ? iou - (enclose - uni) / enclose : -1.0;
}

}  // namespace

extern "C" {

// detections [n_det,4], tracks [n_trk,4] -> cost [n_det, n_trk]
// cost = 0.5 * (1 - GIoU), matching the reference tracker
// (tracking_tools.py:240).
void giou_cost_matrix(const double* detections, int n_det,
                      const double* tracks, int n_trk, double* cost) {
  for (int i = 0; i < n_det; ++i) {
    for (int j = 0; j < n_trk; ++j) {
      cost[i * n_trk + j] = 0.5 * (1.0 - giou(detections + 4 * i,
                                              tracks + 4 * j));
    }
  }
}

// Rectangular linear assignment; writes row_to_col (-1 = unassigned).
void linear_assignment(const double* cost, int n_rows, int n_cols,
                       int* row_to_col) {
  if (n_rows <= 0 || n_cols <= 0) return;
  if (n_rows <= n_cols) {
    solve_lap(cost, n_rows, n_cols, row_to_col);
    return;
  }
  // transpose so rows <= cols, then invert the mapping
  std::vector<double> t(static_cast<size_t>(n_rows) * n_cols);
  for (int i = 0; i < n_rows; ++i)
    for (int j = 0; j < n_cols; ++j) t[j * n_rows + i] = cost[i * n_cols + j];
  std::vector<int> col_to_row(n_cols, -1);
  solve_lap(t.data(), n_cols, n_rows, col_to_row.data());
  for (int i = 0; i < n_rows; ++i) row_to_col[i] = -1;
  for (int j = 0; j < n_cols; ++j) {
    if (col_to_row[j] >= 0) row_to_col[col_to_row[j]] = j;
  }
}

}  // extern "C"
