"""Riccati-sweep sparse MPC engine: O(N) per-iteration KKT solves.

The condensed engine (ops/condense.py) eliminates states — O(N^2) memory in
the prediction operator and O((N nu)^2) per iteration. This engine keeps the
sparse (X, U) variables and exploits the block-tridiagonal KKT structure the
way an interior-point/ADMM MPC solver should (SURVEY §7 step 5: "batched
block-tridiagonal KKT factorization (Riccati-style backward/forward sweeps)
fused with horizon rollout"):

ADMM splitting
    min 0.5 w' H w + q' w + I_dyn(w) + I_box(v),   w = v
with w = (e_x_1..N+1, e_u_1..N), H = blkdiag(Q.., P_term, R..). The w-update
    min 0.5 w'(H + rho I) w + lin' w   s.t.  e_{k+1} = A e_k + B du_k
is an affine LQR: its *factorization* (Riccati matrices + feedback gains)
depends only on (A, B, weights, rho) — computed ONCE at design time per
rho-grid entry — while each iteration only reruns the affine backward sweep
and the forward rollout: O(N) small GEMMs that batch over scenarios on the
MXU (lanes share all gain matrices).

Per-iteration cost: O(N (nx^2 + nx nu)) vs condensed O((N nu)^2 + N^2 nx nu);
memory O(N) vs O(N^2). The crossover makes this the long-horizon engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (
    STATUS_CONVERGED,
    STATUS_MAX_ITER,
)
from ..utils.pytrees import pytree_dataclass, static_field

Array = Any
H = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=H)


@dataclasses.dataclass(frozen=True)
class RiccatiConfig:
    """Knobs for the sparse Riccati-ADMM engine."""

    max_iter: int = 2000
    rho: float = 10.0
    rho_grid: tuple = (1.0, 10.0, 100.0)
    adapt_interval: int = 50
    check_interval: int = 25
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-5
    eps_rel: float = 1e-5


@pytree_dataclass
class RiccatiFactors:
    """Design-time affine-LQR factorization for one rho value.

    Backward Riccati on cost blocks Qb_k = Q + (sigma+rho) I (k=1..N; the
    terminal block uses P_term + (sigma+rho) I) and Rb = R + (sigma+rho) I:

        S_{N+1} = Qb_term
        G_k  = (Rb + B' S_{k+1} B)^{-1}
        K_k  = G_k B' S_{k+1} A
        S_k  = Qb + A' S_{k+1} (A - B K_k)

    Stored: K (N, nu, nx), G (N, nu, nu), AmBK (N, nx, nx) = A - B K_k,
    and S-propagation pieces for the affine sweep."""

    K: Array  # (N, nu, nx)
    G: Array  # (N, nu, nu)
    AmBK: Array  # (N, nx, nx)
    Bt: Array  # (nu, nx) = B'   (shared; LTI)
    A: Array  # (nx, nx)
    B: Array  # (nx, nu)


@pytree_dataclass
class RiccatiOperator:
    """Sparse-MPC ADMM operator: per-rho-grid LQR factorizations + bounds."""

    factors: Any  # RiccatiFactors with leading rho-grid axis (R, ...)
    rho_grid: Array  # (R,)
    Q: Array  # (nx, nx) stage state cost
    P_term: Array  # (nx, nx)
    R_in: Array  # (nu, nu)
    x_lo: Array  # (nx,) deviation-space box (may be +-inf)
    x_hi: Array
    u_lo: Array  # (nu,)
    u_hi: Array
    N: int = static_field()
    nx: int = static_field()
    nu: int = static_field()
    state_constraint: bool = static_field()


def _factorize_one(A, B, Qb, Rb, Qb_term, N):
    """Backward Riccati factorization (host/design time, f64)."""
    nx, nu = B.shape
    S = Qb_term
    Ks, Gs, AmBKs = [], [], []
    for _ in range(N):
        BtS = B.T @ S
        G = np.linalg.inv(Rb + BtS @ B)
        K = G @ (BtS @ A)
        AmBK = A - B @ K
        S = Qb + A.T @ S @ AmBK
        S = 0.5 * (S + S.T)
        Ks.append(K)
        Gs.append(G)
        AmBKs.append(AmBK)
    # reverse to time order k=0..N-1 (we built from the tail)
    return (
        np.stack(Ks[::-1]),
        np.stack(Gs[::-1]),
        np.stack(AmBKs[::-1]),
    )


def build_riccati_operator(
    A: Array,
    B: Array,
    Q: Array,
    R: Array,
    P_term: Array,
    N: int,
    x_lo: Array,
    x_hi: Array,
    u_lo: Array,
    u_hi: Array,
    state_constraint: bool,
    config: RiccatiConfig = RiccatiConfig(),
) -> RiccatiOperator:
    """Design-time factorization for every rho-grid entry (host, f64)."""
    A64 = np.asarray(A, np.float64)
    B64 = np.asarray(B, np.float64)
    Q64 = np.asarray(Q, np.float64)
    R64 = np.asarray(R, np.float64)
    P64 = np.asarray(P_term, np.float64)
    nx, nu = B64.shape

    grid = sorted(set(float(r) for r in config.rho_grid) | {float(config.rho)})
    Ks, Gs, AmBKs = [], [], []
    for rho in grid:
        reg = (config.sigma + rho) * np.eye(nx)
        reg_u = (config.sigma + rho) * np.eye(nu)
        # states beyond the box participate in the splitting only when state
        # constraints are on; inputs always do
        rho_x = reg if state_constraint else config.sigma * np.eye(nx)
        K, G, AmBK = _factorize_one(
            A64, B64, Q64 + rho_x, R64 + reg_u, P64 + rho_x, N
        )
        Ks.append(K)
        Gs.append(G)
        AmBKs.append(AmBK)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    factors = RiccatiFactors(
        K=f32(np.stack(Ks)),
        G=f32(np.stack(Gs)),
        AmBK=f32(np.stack(AmBKs)),
        Bt=f32(B64.T),
        A=f32(A64),
        B=f32(B64),
    )
    return RiccatiOperator(
        factors=factors,
        rho_grid=f32(np.asarray(grid)),
        Q=f32(Q64),
        P_term=f32(P64),
        R_in=f32(R64),
        x_lo=f32(x_lo),
        x_hi=f32(x_hi),
        u_lo=f32(u_lo),
        u_hi=f32(u_hi),
        N=int(N),
        nx=int(nx),
        nu=int(nu),
        state_constraint=bool(state_constraint),
    )


def _lqr_affine_solve(op: RiccatiOperator, ridx, e0, lin_interior, lin_xN, lin_u):
    """Solve the w-update equality-constrained QP via the precomputed
    factorization: affine backward sweep + forward rollout. All per-lane;
    vmap over lanes turns each step into shared-weight GEMMs.

    lin_interior: (N-1, nx) linear terms on the interior states e_2..e_N;
    lin_xN: (nx,) on the terminal state e_{N+1}; lin_u: (N, nu).
    Returns (X (N+1, nx), U (N, nu)) with the fixed e_1 = e0 in row 0.

    Backward recursion (value gradient g_{k+1} includes the linear cost of
    its own state):
        ff_k = G_k (B' g_{k+1} + lu_k)
        g_k  = (A - B K_k)' g_{k+1} - K_k' lu_k + lpre_k
    with g_{N+1} = lin_xN and lpre_k = linear cost on e_k (zero for the
    fixed e_1)."""
    K = jnp.take(op.factors.K, ridx, axis=0)  # (N, nu, nx)
    G = jnp.take(op.factors.G, ridx, axis=0)
    AmBK = jnp.take(op.factors.AmBK, ridx, axis=0)
    A = op.factors.A
    B = op.factors.B

    lpre = jnp.concatenate(
        [jnp.zeros((1, op.nx), jnp.float32), lin_interior], axis=0
    )  # (N, nx): linear cost on the pre-step state e_{k}

    def bwd(g_next, inp):
        K_k, G_k, AmBK_k, lpre_k, lu_k = inp
        ff_k = _mm(G_k, op.factors.Bt @ g_next + lu_k)
        g_k = _mm(AmBK_k.T, g_next) - _mm(K_k.T, lu_k) + lpre_k
        return g_k, ff_k

    _, ffs = jax.lax.scan(
        bwd,
        lin_xN,
        (K, G, AmBK, lpre, lin_u),
        reverse=True,
    )

    # forward rollout: u_k = -K_k e_k - ff_k ; e_{k+1} = A e_k + B u_k
    def fwd(e, inp):
        K_k, ff_k = inp
        u_k = -(K_k @ e) - ff_k
        e_next = A @ e + B @ u_k
        return e_next, (e_next, u_k)

    _, (es, us) = jax.lax.scan(fwd, e0, (K, ffs))
    X = jnp.concatenate([e0[None], es], axis=0)
    return X, us


def solve_sparse(
    op: RiccatiOperator,
    e0: Array,  # (nx,) initial deviation
    warm_X: Optional[Array] = None,  # (N+1, nx)
    warm_U: Optional[Array] = None,  # (N, nu)
    warm_lam: Optional[Tuple[Array, Array]] = None,
    config: RiccatiConfig = RiccatiConfig(),
):
    """One sparse ADMM solve (vmap over lanes for batching).

    Splitting: w = (X, U) handled by the LQR solve; v = clipped copy with
    duals lam. Returns (X, U, status, iterations, r_prim, warm duals).
    """
    N, nx, nu = op.N, op.nx, op.nu
    dt = jnp.float32
    grid = op.rho_grid
    R_ = grid.shape[0]
    ridx0 = jnp.argmin(jnp.abs(jnp.log(grid) - jnp.log(config.rho))).astype(
        jnp.int32
    )

    X0 = jnp.zeros((N + 1, nx), dt) if warm_X is None else warm_X
    U0 = jnp.zeros((N, nu), dt) if warm_U is None else warm_U
    if warm_lam is None:
        lamX0 = jnp.zeros((N + 1, nx), dt)
        lamU0 = jnp.zeros((N, nu), dt)
    else:
        lamX0, lamU0 = warm_lam

    vX0 = X0
    vU0 = U0
    ck = max(1, int(config.check_interval))

    def admm_iter(carry, _):
        X, U, vX, vU, lamX, lamU, ridx = carry
        rho = jnp.take(grid, ridx)
        # w-update linear terms: the augmented term -(rho v - lam)
        if op.state_constraint:
            lin_int = -rho * vX[1:-1] + lamX[1:-1]  # interior states e_2..e_N
            lin_xN = -rho * vX[-1] + lamX[-1]
        else:
            lin_int = jnp.zeros((N - 1, nx), dt)
            lin_xN = jnp.zeros((nx,), dt)
        lin_u = -rho * vU + lamU
        Xn, Un = _lqr_affine_solve(op, ridx, X[0], lin_int, lin_xN, lin_u)
        # v-update: projection onto the boxes; dual ascent
        vUn = jnp.clip(Un + lamU / rho, op.u_lo, op.u_hi)
        lamUn = lamU + rho * (Un - vUn)
        if op.state_constraint:
            vXn = jnp.clip(Xn + lamX / rho, op.x_lo, op.x_hi)
            lamXn = lamX + rho * (Xn - vXn)
            # the fixed initial state e_1 is NOT part of the splitting — a
            # dual on it would wind up forever when e0 sits outside the box
            vXn = vXn.at[0].set(Xn[0])
            lamXn = lamXn.at[0].set(0.0)
        else:
            vXn = Xn
            lamXn = jnp.zeros_like(lamX)
        return (Xn, Un, vXn, vUn, lamXn, lamUn, ridx), None

    def residuals(X, U, vX, vU):
        ru = jnp.max(jnp.abs(U - vU))
        if op.state_constraint:
            return jnp.maximum(jnp.max(jnp.abs(X - vX)), ru)
        return ru

    def body(state):
        X, U, vX, vU, lamX, lamU, ridx, it, rp, done = state
        vU_prev = vU
        vX_prev = vX
        (Xn, Un, vXn, vUn, lamXn, lamUn, ridxn), _ = jax.lax.scan(
            admm_iter, (X, U, vX, vU, lamX, lamU, ridx), None, length=ck
        )
        rp_new = residuals(Xn, Un, vXn, vUn)
        rho = jnp.take(grid, ridxn)
        rd_new = rho * jnp.maximum(
            jnp.max(jnp.abs(vUn - vU_prev)), jnp.max(jnp.abs(vXn - vX_prev))
        )
        scale = jnp.maximum(
            jnp.max(jnp.abs(Un)), jnp.maximum(jnp.max(jnp.abs(Xn)), 1e-6)
        )
        tol = config.eps_abs + config.eps_rel * scale
        done_new = (rp_new <= tol) & (rd_new <= tol * rho)
        return (Xn, Un, vXn, vUn, lamXn, lamUn, ridxn, it + ck, rp_new, done_new)

    def cond(state):
        it, done = state[7], state[9]
        return (~done) & (it < config.max_iter)

    zero = jnp.sum(e0) * 0.0
    X0 = X0.at[0].set(e0)
    init = (
        X0, U0, vX0, vU0, lamX0, lamU0, ridx0 + zero.astype(jnp.int32),
        zero.astype(jnp.int32), jnp.inf + zero, zero > 1.0,
    )
    X, U, vX, vU, lamX, lamU, ridx, it, rp, done = jax.lax.while_loop(
        cond, body, init
    )
    status = jnp.where(done, STATUS_CONVERGED, STATUS_MAX_ITER).astype(jnp.int32)
    # return the projected (feasible) inputs
    U_out = jnp.clip(U, op.u_lo, op.u_hi)
    return X, U_out, status, it, rp, (lamX, lamU)
