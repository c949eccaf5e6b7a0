// qpref — in-house dense ADMM QP reference solver (double precision).
//
// The reference package reaches its native code through the OSQP C solver
// (solver_selection.jl:92-98). This is the TPU framework's own native
// counterpart: an operator-splitting QP solver with the same algorithm
// family as the on-device f32 engine (ops/admm.py), but in f64 on the host.
// Roles: (a) independent golden oracle for parity tests, (b) CPU fallback
// runtime where no accelerator/JAX is present.
//
//   minimize   0.5 z'Pz + q'z
//   subject to l <= A z <= u      (rows with l == u are equalities)
//
// C ABI only — consumed via ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Dense Cholesky factorization (in place, lower). Returns 0 on success.
int cholesky(std::vector<double>& K, int n) {
  for (int j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0) return 1;
    const double Ljj = std::sqrt(d);
    K[j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = K[i * n + j];
      for (int k = 0; k < j; ++k) s -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = s / Ljj;
    }
  }
  return 0;
}

void chol_solve(const std::vector<double>& L, int n, double* x) {
  for (int i = 0; i < n; ++i) {
    double s = x[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

inline double clamp(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Dense LU with partial pivoting; solves in place. Returns 0 on success.
int lu_solve(std::vector<double>& M, std::vector<double>& b, int n) {
  std::vector<int> piv(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double mx = std::fabs(M[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      const double v = std::fabs(M[i * n + k]);
      if (v > mx) {
        mx = v;
        p = i;
      }
    }
    if (mx < 1e-14) return 1;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(M[k * n + j], M[p * n + j]);
      std::swap(b[k], b[p]);
    }
    const double inv = 1.0 / M[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double f = M[i * n + k] * inv;
      if (f == 0.0) continue;
      M[i * n + k] = f;
      for (int j = k + 1; j < n; ++j) M[i * n + j] -= f * M[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= M[i * n + j] * b[j];
    b[i] = s / M[i * n + i];
  }
  return 0;
}

}  // namespace

extern "C" {

// Status codes match the Python engine (types.py STATUS_*).
enum QprefStatus {
  QPREF_CONVERGED = 0,
  QPREF_MAX_ITER = 1,
  QPREF_PRIMAL_INFEASIBLE = 2,
  QPREF_DUAL_INFEASIBLE = 3,
};

// Solve one QP. Arrays are row-major, caller-allocated.
//   P: n*n, q: n, A: m*n, l,u: m, z: n (in: warm start, out: solution),
//   y: m (in: warm start, out: duals).
// Returns a QprefStatus; *iters, *rprim, *rdual report the final state.
int qpref_solve(int n, int m, const double* P_in, const double* q_in,
                const double* A_in, const double* l_in, const double* u_in,
                int max_iter, double eps_abs, double eps_rel, double rho0,
                double sigma, double alpha, double* z, double* y, int* iters,
                double* rprim, double* rdual) {
  const double kEqRhoScale = 1e3;
  const double kEpsInfeas = 1e-7;
  const int kRuizIters = 10;

  // --- modified Ruiz equilibration (OSQP §5): P_s = c D P D, A_s = E A D ---
  std::vector<double> P(P_in, P_in + static_cast<size_t>(n) * n);
  std::vector<double> A(A_in, A_in + static_cast<size_t>(m) * n);
  std::vector<double> D(n, 1.0), E(m, 1.0);
  double c = 1.0;
  {
    std::vector<double> d(n), e(m);
    for (int sweep = 0; sweep < kRuizIters; ++sweep) {
      for (int j = 0; j < n; ++j) {
        double cn = 0.0;
        for (int i = 0; i < n; ++i) cn = std::max(cn, std::fabs(P[i * n + j]));
        for (int r = 0; r < m; ++r) cn = std::max(cn, std::fabs(A[r * n + j]));
        d[j] = cn > 1e-12 ? 1.0 / std::sqrt(clamp(cn, 1e-8, 1e8)) : 1.0;
      }
      for (int r = 0; r < m; ++r) {
        double rn = 0.0;
        for (int j = 0; j < n; ++j) rn = std::max(rn, std::fabs(A[r * n + j]));
        e[r] = rn > 1e-12 ? 1.0 / std::sqrt(clamp(rn, 1e-8, 1e8)) : 1.0;
      }
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) P[i * n + j] *= d[i] * d[j];
      for (int r = 0; r < m; ++r)
        for (int j = 0; j < n; ++j) A[r * n + j] *= e[r] * d[j];
      for (int j = 0; j < n; ++j) D[j] *= d[j];
      for (int r = 0; r < m; ++r) E[r] *= e[r];
      double mean_col = 0.0;
      for (int j = 0; j < n; ++j) {
        double cn = 0.0;
        for (int i = 0; i < n; ++i) cn = std::max(cn, std::fabs(P[i * n + j]));
        mean_col += cn;
      }
      mean_col /= n;
      const double gamma = 1.0 / clamp(std::max(mean_col, 1e-8), 1e-8, 1e8);
      for (size_t i = 0; i < P.size(); ++i) P[i] *= gamma;
      c *= gamma;
    }
  }
  // scaled vectors: q_s = c D q, l_s = E l, u_s = E u
  std::vector<double> q(n), l(m), u(m);
  for (int j = 0; j < n; ++j) q[j] = c * D[j] * q_in[j];
  for (int r = 0; r < m; ++r) {
    l[r] = std::isfinite(l_in[r]) ? E[r] * l_in[r] : l_in[r];
    u[r] = std::isfinite(u_in[r]) ? E[r] * u_in[r] : u_in[r];
  }

  std::vector<double> rho(m), rho_inv(m);
  for (int i = 0; i < m; ++i) {
    const bool eq =
        std::isfinite(l[i]) && std::isfinite(u[i]) && l_in[i] == u_in[i];
    rho[i] = eq ? rho0 * kEqRhoScale : rho0;
    rho_inv[i] = 1.0 / rho[i];
  }

  // K = P_s + sigma I + A_s' diag(rho) A_s, factorized once.
  std::vector<double> K(static_cast<size_t>(n) * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double s = P[i * n + j] + (i == j ? sigma : 0.0);
      for (int r = 0; r < m; ++r) s += A[r * n + i] * rho[r] * A[r * n + j];
      K[i * n + j] = s;
    }
  if (cholesky(K, n) != 0) return QPREF_MAX_ITER;

  // warm start into scaled space: x_s = z / D, y_s = c y / E
  std::vector<double> x(n), yv(m);
  for (int j = 0; j < n; ++j) x[j] = z[j] / D[j];
  for (int r = 0; r < m; ++r) yv[r] = c * y[r] / E[r];
  std::vector<double> s_vec(m), Ax(m), xt(n), st(m), rhs(n), x_prev(n),
      y_prev(m);

  auto matvec_A = [&](const std::vector<double>& v, std::vector<double>& out) {
    for (int r = 0; r < m; ++r) {
      double acc = 0.0;
      for (int j = 0; j < n; ++j) acc += A[r * n + j] * v[j];
      out[r] = acc;
    }
  };

  matvec_A(x, Ax);
  for (int r = 0; r < m; ++r)
    s_vec[r] = clamp(Ax[r] + rho_inv[r] * yv[r], l[r], u[r]);

  int it = 0;
  int status = QPREF_MAX_ITER;
  double rp = 0.0, rd = 0.0;
  for (it = 1; it <= max_iter; ++it) {
    x_prev = x;
    y_prev = yv;

    // x-update: K xt = sigma x - q + A'(rho .* s - y)
    for (int j = 0; j < n; ++j) rhs[j] = sigma * x[j] - q[j];
    for (int r = 0; r < m; ++r) {
      const double w = rho[r] * s_vec[r] - yv[r];
      for (int j = 0; j < n; ++j) rhs[j] += A[r * n + j] * w;
    }
    xt = rhs;
    chol_solve(K, n, xt.data());
    matvec_A(xt, st);

    for (int j = 0; j < n; ++j) x[j] = alpha * xt[j] + (1.0 - alpha) * x[j];
    for (int r = 0; r < m; ++r) {
      const double v = alpha * st[r] + (1.0 - alpha) * s_vec[r];
      const double sn = clamp(v + rho_inv[r] * yv[r], l[r], u[r]);
      yv[r] += rho[r] * (v - sn);
      s_vec[r] = sn;
    }

    if (it % 10 == 0 || it == max_iter) {
      // all residuals / certificates in UNSCALED quantities
      matvec_A(x, Ax);
      rp = 0.0;
      double ax_n = 0.0, s_n = 0.0;
      for (int r = 0; r < m; ++r) {
        const double ei = 1.0 / E[r];
        rp = std::max(rp, std::fabs(ei * (Ax[r] - s_vec[r])));
        ax_n = std::max(ax_n, std::fabs(ei * Ax[r]));
        s_n = std::max(s_n, std::fabs(ei * s_vec[r]));
      }
      rd = 0.0;
      double px_n = 0.0, aty_n = 0.0, q_n = 0.0;
      for (int j = 0; j < n; ++j) {
        double px = 0.0;
        for (int k = 0; k < n; ++k) px += P[j * n + k] * x[k];
        double aty = 0.0;
        for (int r = 0; r < m; ++r) aty += A[r * n + j] * yv[r];
        const double di = 1.0 / (c * D[j]);
        rd = std::max(rd, std::fabs(di * (px + q[j] + aty)));
        px_n = std::max(px_n, std::fabs(di * px));
        aty_n = std::max(aty_n, std::fabs(di * aty));
        q_n = std::max(q_n, std::fabs(di * q[j]));
      }
      const double eps_p = eps_abs + eps_rel * std::max(ax_n, s_n);
      const double eps_d = eps_abs + eps_rel * std::max(q_n, std::max(px_n, aty_n));
      if (rp <= eps_p && rd <= eps_d) {
        status = QPREF_CONVERGED;
        break;
      }

      // primal infeasibility certificate from the unscaled dual delta
      double dy_n = 0.0, atdy = 0.0, support = 0.0;
      bool support_finite = true;
      for (int r = 0; r < m; ++r) {
        const double dy = E[r] * (yv[r] - y_prev[r]) / c;
        dy_n = std::max(dy_n, std::fabs(dy));
        if (dy > 0.0) {
          if (std::isfinite(u_in[r])) support += u_in[r] * dy;
          else support_finite = false;
        } else if (dy < 0.0) {
          if (std::isfinite(l_in[r])) support += l_in[r] * dy;
          else support_finite = false;
        }
      }
      for (int j = 0; j < n; ++j) {
        double acc = 0.0;
        for (int r = 0; r < m; ++r)
          acc += A_in[r * n + j] * E[r] * (yv[r] - y_prev[r]) / c;
        atdy = std::max(atdy, std::fabs(acc));
      }
      if (dy_n > 1e-14 && atdy <= kEpsInfeas * dy_n && support_finite &&
          support <= -kEpsInfeas * dy_n) {
        status = QPREF_PRIMAL_INFEASIBLE;
        break;
      }

      // dual infeasibility certificate from the unscaled primal delta
      double dx_n = 0.0, pdx_n = 0.0, qdx = 0.0;
      bool dir_ok = true;
      std::vector<double> dxu(n);
      for (int j = 0; j < n; ++j) {
        dxu[j] = D[j] * (x[j] - x_prev[j]);
        dx_n = std::max(dx_n, std::fabs(dxu[j]));
        qdx += q_in[j] * dxu[j];
      }
      for (int j = 0; j < n; ++j) {
        double pdx = 0.0;
        for (int k = 0; k < n; ++k) pdx += P_in[j * n + k] * dxu[k];
        pdx_n = std::max(pdx_n, std::fabs(pdx));
      }
      for (int r = 0; r < m && dir_ok; ++r) {
        double adx = 0.0;
        for (int j = 0; j < n; ++j) adx += A_in[r * n + j] * dxu[j];
        if (std::isfinite(u_in[r]) && adx > kEpsInfeas * dx_n) dir_ok = false;
        if (std::isfinite(l_in[r]) && adx < -kEpsInfeas * dx_n) dir_ok = false;
      }
      if (dx_n > 1e-14 && pdx_n <= kEpsInfeas * dx_n &&
          qdx <= -kEpsInfeas * dx_n && dir_ok) {
        status = QPREF_DUAL_INFEASIBLE;
        break;
      }
    }
  }

  // unscale: z = D x_s, y = E y_s / c
  for (int j = 0; j < n; ++j) z[j] = D[j] * x[j];
  for (int r = 0; r < m; ++r) y[r] = E[r] * yv[r] / c;

  // --- polish (OSQP §5.2): exact KKT solve on the detected active set ----
  if (status == QPREF_CONVERGED || status == QPREF_MAX_ITER) {
    std::vector<int> act;   // active row indices
    std::vector<double> bact, sign;  // bound value, +1 upper / -1 lower
    for (int r = 0; r < m; ++r) {
      if (y[r] > 1e-10 && std::isfinite(u_in[r])) {
        act.push_back(r);
        bact.push_back(u_in[r]);
      } else if (y[r] < -1e-10 && std::isfinite(l_in[r])) {
        act.push_back(r);
        bact.push_back(l_in[r]);
      }
    }
    const int ma = static_cast<int>(act.size());
    const int nk = n + ma;
    if (ma <= n) {
      std::vector<double> KKT(static_cast<size_t>(nk) * nk, 0.0), rhs2(nk);
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) KKT[i * nk + j] = P_in[i * n + j];
      for (int a = 0; a < ma; ++a) {
        const int r = act[a];
        for (int j = 0; j < n; ++j) {
          KKT[j * nk + (n + a)] = A_in[r * n + j];
          KKT[(n + a) * nk + j] = A_in[r * n + j];
        }
      }
      for (int j = 0; j < n; ++j) rhs2[j] = -q_in[j];
      for (int a = 0; a < ma; ++a) rhs2[n + a] = bact[a];
      if (lu_solve(KKT, rhs2, nk) == 0) {
        // accept if the polished point has better residuals
        double rp_p = 0.0, rd_p = 0.0;
        std::vector<double> y_p(m, 0.0);
        for (int a = 0; a < ma; ++a) y_p[act[a]] = rhs2[n + a];
        for (int r = 0; r < m; ++r) {
          double az = 0.0;
          for (int j = 0; j < n; ++j) az += A_in[r * n + j] * rhs2[j];
          const double lo = std::isfinite(l_in[r]) ? l_in[r] : -1e300;
          const double hi = std::isfinite(u_in[r]) ? u_in[r] : 1e300;
          rp_p = std::max(rp_p, std::max(lo - az, az - hi));
        }
        for (int j = 0; j < n; ++j) {
          double g = q_in[j];
          for (int k = 0; k < n; ++k) g += P_in[j * n + k] * rhs2[k];
          for (int r = 0; r < m; ++r) g += A_in[r * n + j] * y_p[r];
          rd_p = std::max(rd_p, std::fabs(g));
        }
        if (rp_p <= std::max(rp, eps_abs) && rd_p < rd) {
          std::memcpy(z, rhs2.data(), sizeof(double) * n);
          std::memcpy(y, y_p.data(), sizeof(double) * m);
          rp = std::max(rp_p, 0.0);
          rd = rd_p;
          if (rp <= eps_abs * 10 && rd <= eps_abs * 10)
            status = QPREF_CONVERGED;
        }
      }
    }
  }
  *iters = it > max_iter ? max_iter : it;
  *rprim = rp;
  *rdual = rd;
  return status;
}

// Batch front-end: solves B independent QPs sharing (P, A) structure with
// per-instance q/l/u — the condensed-MPC runtime pattern (only the vectors
// depend on the measured state). OpenMP-free; callers thread if needed.
int qpref_solve_batch(int B, int n, int m, const double* P, const double* q,
                      const double* A, const double* l, const double* u,
                      int max_iter, double eps_abs, double eps_rel,
                      double rho0, double sigma, double alpha, double* z,
                      double* y, int* status_out, int* iters, double* rprim,
                      double* rdual) {
  for (int b = 0; b < B; ++b) {
    status_out[b] = qpref_solve(
        n, m, P, q + static_cast<size_t>(b) * n, A, l + static_cast<size_t>(b) * m,
        u + static_cast<size_t>(b) * m, max_iter, eps_abs, eps_rel, rho0, sigma,
        alpha, z + static_cast<size_t>(b) * n, y + static_cast<size_t>(b) * m,
        iters + b, rprim + b, rdual + b);
  }
  return 0;
}

}  // extern "C"
