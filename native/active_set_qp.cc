// Dense primal active-set QP solver (host-side runtime + validation oracle).
//
// Native counterpart of solver/reference.py — the role qpOASES plays for the
// reference stack (balance_controller.cpp:177-208): a double-precision
// active-set solver for
//
//     min 1/2 x^T Q x + c^T x   s.t.   G x <= h
//
// used to certify the TPU solver's solutions at scale (thousands of
// instances per second on host CPU, OpenMP across instances) and as the
// host-side fallback runtime. Algorithm: Nocedal & Wright 16.3 (primal
// active set for strictly convex QP) with a KKT self-check on every
// solution, matching the Python oracle bit-for-bit in structure.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Solve the dense symmetric-indefinite KKT system via Gaussian elimination
// with partial pivoting (sizes here are <= ~48; LAPACK not required).
bool solve_dense(std::vector<double> A, std::vector<double> b, int n,
                 double* out) {
  std::vector<int> piv(n);
  for (int k = 0; k < n; ++k) {
    int p = k;
    double best = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(A[i * n + k]);
      if (v > best) {
        best = v;
        p = i;
      }
    }
    if (best < 1e-14) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
      std::swap(b[k], b[p]);
    }
    double inv = 1.0 / A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      double f = A[i * n + k] * inv;
      if (f == 0.0) continue;
      for (int j = k; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int j = i + 1; j < n; ++j) v -= A[i * n + j] * out[j];
    out[i] = v / A[i * n + i];
  }
  return true;
}

struct Workspace {
  std::vector<double> x, p, lam_w, kkt, rhs, sol, gx, slack, gp;
  std::vector<int> active_idx;
  std::vector<char> active;
};

// Equality-constrained QP on the working set: KKT solve.
bool eqp_solve(const double* Q, const double* c, const double* G,
               const double* h, int n, const std::vector<int>& idx,
               Workspace& ws, double* x_eq, double* lam_w) {
  int k = static_cast<int>(idx.size());
  int dim = n + k;
  ws.kkt.assign(dim * dim, 0.0);
  ws.rhs.assign(dim, 0.0);
  ws.sol.assign(dim, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) ws.kkt[i * dim + j] = Q[i * n + j];
    ws.rhs[i] = -c[i];
  }
  for (int a = 0; a < k; ++a) {
    const double* row = G + idx[a] * n;
    for (int j = 0; j < n; ++j) {
      ws.kkt[(n + a) * dim + j] = row[j];
      ws.kkt[j * dim + (n + a)] = row[j];
    }
    ws.rhs[n + a] = h[idx[a]];
  }
  if (!solve_dense(ws.kkt, ws.rhs, dim, ws.sol.data())) return false;
  std::memcpy(x_eq, ws.sol.data(), n * sizeof(double));
  std::memcpy(lam_w, ws.sol.data() + n, k * sizeof(double));
  return true;
}

double kkt_error(const double* Q, const double* c, const double* G,
                 const double* h, int n, int m, const double* x,
                 const double* lam) {
  double err = 0.0;
  for (int i = 0; i < n; ++i) {
    double v = c[i];
    for (int j = 0; j < n; ++j) v += Q[i * n + j] * x[j];
    for (int r = 0; r < m; ++r) v += G[r * n + i] * lam[r];
    err = std::max(err, std::fabs(v));
  }
  for (int r = 0; r < m; ++r) {
    double gx = 0.0;
    for (int j = 0; j < n; ++j) gx += G[r * n + j] * x[j];
    err = std::max(err, std::max(gx - h[r], 0.0));      // primal
    err = std::max(err, std::max(-lam[r], 0.0));        // dual sign
    err = std::max(err, std::fabs(lam[r] * (gx - h[r])));  // complementarity
  }
  return err;
}

// status: 0 optimal, 1 max_iter, 2 infeasible start, 3 singular KKT.
int solve_one(const double* Q, const double* c, const double* G,
              const double* h, const double* x0, int n, int m, int max_iter,
              double* x_out, double* lam_out, double* kkt_out,
              Workspace& ws) {
  ws.x.assign(x0, x0 + n);
  ws.active.assign(m, 0);
  ws.p.assign(n, 0.0);
  ws.lam_w.assign(m, 0.0);
  ws.gx.assign(m, 0.0);
  ws.slack.assign(m, 0.0);
  ws.gp.assign(m, 0.0);
  std::fill(lam_out, lam_out + m, 0.0);

  for (int r = 0; r < m; ++r) {
    double gx = 0.0;
    for (int j = 0; j < n; ++j) gx += G[r * n + j] * ws.x[j];
    if (gx - h[r] > 1e-10) return 2;
    if (gx - h[r] > -1e-12) ws.active[r] = 1;
  }

  for (int it = 0; it < max_iter; ++it) {
    ws.active_idx.clear();
    for (int r = 0; r < m; ++r)
      if (ws.active[r]) ws.active_idx.push_back(r);

    std::vector<double> x_eq(n), lamw(ws.active_idx.size());
    if (!eqp_solve(Q, c, G, h, n, ws.active_idx, ws, x_eq.data(),
                   lamw.data()))
      return 3;

    double step_norm = 0.0;
    for (int j = 0; j < n; ++j) {
      ws.p[j] = x_eq[j] - ws.x[j];
      step_norm = std::max(step_norm, std::fabs(ws.p[j]));
    }

    if (step_norm < 1e-12) {
      // Stationary on the working set: check multiplier signs.
      double lam_min = 0.0;
      int drop = -1;
      for (size_t a = 0; a < ws.active_idx.size(); ++a) {
        if (lamw[a] < lam_min) {
          lam_min = lamw[a];
          drop = ws.active_idx[a];
        }
      }
      if (lam_min >= -1e-11) {
        std::memcpy(x_out, ws.x.data(), n * sizeof(double));
        for (size_t a = 0; a < ws.active_idx.size(); ++a)
          lam_out[ws.active_idx[a]] = std::max(lamw[a], 0.0);
        *kkt_out = kkt_error(Q, c, G, h, n, m, x_out, lam_out);
        return 0;
      }
      ws.active[drop] = 0;
      continue;
    }

    // Step toward x_eq; find the blocking constraint.
    double alpha = 1.0;
    int block = -1;
    for (int r = 0; r < m; ++r) {
      if (ws.active[r]) continue;
      double gp = 0.0, gx = 0.0;
      for (int j = 0; j < n; ++j) {
        gp += G[r * n + j] * ws.p[j];
        gx += G[r * n + j] * ws.x[j];
      }
      if (gp > 1e-14) {
        double ratio = (h[r] - gx) / gp;
        if (ratio < alpha) {
          alpha = ratio > 0.0 ? ratio : 0.0;
          block = r;
        }
      }
    }
    for (int j = 0; j < n; ++j) ws.x[j] += alpha * ws.p[j];
    if (block >= 0) ws.active[block] = 1;
  }

  std::memcpy(x_out, ws.x.data(), n * sizeof(double));
  *kkt_out = kkt_error(Q, c, G, h, n, m, x_out, lam_out);
  return 1;
}

}  // namespace

extern "C" {

// Batched solve. Arrays are row-major, instance-major:
//   Q: batch*n*n, c: batch*n, G: batch*m*n, h: batch*m, x0: batch*n.
// Outputs: x: batch*n, lam: batch*m, kkt_err: batch, status: batch.
// Returns the number of optimal instances.
int qp_active_set_solve_batch(const double* Q, const double* c,
                              const double* G, const double* h,
                              const double* x0, int n, int m, int batch,
                              int max_iter, double* x_out, double* lam_out,
                              double* kkt_out, int* status_out) {
  int n_ok = 0;
#ifdef _OPENMP
#pragma omp parallel reduction(+ : n_ok)
#endif
  {
    Workspace ws;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int b = 0; b < batch; ++b) {
      int st = solve_one(Q + (size_t)b * n * n, c + (size_t)b * n,
                         G + (size_t)b * m * n, h + (size_t)b * m,
                         x0 + (size_t)b * n, n, m, max_iter,
                         x_out + (size_t)b * n, lam_out + (size_t)b * m,
                         kkt_out + b, ws);
      status_out[b] = st;
      if (st == 0) ++n_ok;
    }
  }
  return n_ok;
}

int qp_native_abi_version() { return 1; }

}  // extern "C"
