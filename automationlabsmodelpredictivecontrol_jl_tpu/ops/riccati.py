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
    min 0.5 w'(H + rho I) w + lin' w  s.t.  e_{k+1} = A e_k + B du_k
is an affine LQR: its *factorization* (Riccati matrices + feedback gains)
depends only on (A, B, weights, rho) — computed ONCE at design time per
rho-grid entry — while each iteration only reruns the affine backward sweep
and the forward rollout: O(N) small GEMMs that batch over scenarios on the
MXU (lanes share all gain matrices).

Per-iteration cost: O(N (nx^2 + nx nu)) vs condensed O((N nu)^2 + N^2 nx nu);
memory O(N) vs O(N^2). The crossover makes this the long-horizon engine.

Terminal kinds (design_mpc.jl:330-391): "none"; "equality" (the terminal
state joins the splitting with a [0,0] box); "contractive" (the terminal
state joins the splitting with a Euclidean-ball projection of radius
sqrt(0.9)·||e_1||). "neighborhood" H-rep rows are not box/ball-representable
per state block — design routes those to the condensed engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (
    CONTRACTIVE_FACTOR,
    STATUS_CONVERGED,
    STATUS_MAX_ITER,
    STATUS_NUMERIC_ERROR,
    STATUS_PRIMAL_INFEASIBLE,
)
from ..utils.pytrees import pytree_dataclass, static_field

Array = Any
H = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=H)


@dataclasses.dataclass(frozen=True)
class RiccatiConfig:
    """Knobs for the sparse Riccati-ADMM engine.

    ``rho=None`` / ``rho_grid=None`` mean *auto*: resolved at design time
    against the problem's input weight R (``resolve_config``). Measured on
    QTP across (Q, R) scales, the iteration-optimal rho tracks
    ``mean(diag(R))`` within a decade — a fixed default (the old 10.0) is
    off by 1-2 orders of magnitude whenever R isn't O(10) and costs ~10x
    the iterations."""

    max_iter: int = 2000
    rho: Optional[float] = None
    rho_grid: Optional[tuple] = None
    # prefactorized rho adaptation (OSQP §5.2 rule over the grid), every
    # adapt_interval iterations; 0 disables. The jax engine adapts PER
    # LANE (vmap); the fused Pallas engine adapts one BATCH-GLOBAL rho
    # (its factor slabs are compile-time kernel constants), so iteration
    # counts can diverge between the two on rho-heterogeneous batches.
    adapt_interval: int = 50
    check_interval: int = 25
    sigma: float = 1e-6
    eps_abs: float = 1e-5
    eps_rel: float = 1e-5
    # terminal-node consensus boost for the EQUALITY kind (mirrors the
    # condensed engine's rho_eq_scale on equality rows): the terminal
    # state's proximal pull and dual ascent run at rho_eq_scale * rho
    # (capped at 1e3 for the f32 loop). Without it the terminal dual
    # crawls on weakly-reachable plants — the QTP near-reference equality
    # configs stalled at rd ~5e-3 after 20k iterations (r4 golden work);
    # with it they certify at the engine tolerance.
    rho_eq_scale: float = 1e2
    # primal-infeasibility CERTIFICATE tolerance (Banjac et al. 2019, the
    # OSQP detector adapted to the consensus splitting): the dual delta
    # over a check block must be (a) orthogonal to the dynamics subspace
    # and (b) a strictly separating functional between the dynamics
    # manifold and the constraint set. Only a passing certificate declares
    # STATUS_PRIMAL_INFEASIBLE — never a convergence-speed guess.
    eps_infeas: float = 1e-5
    # stall ESCALATOR (not a verdict): `stall_checks` consecutive check
    # blocks with <0.1% relative primal improvement at rp > 10 tol bump
    # rho one grid entry (binding terminal sets contract 10-100x faster
    # at high rho); at the top of the grid a stalled solve just runs to
    # max_iter and reports honestly.
    stall_checks: int = 8
    # parallel-in-time sweeps: the affine backward/forward recurrences have
    # DESIGN-TIME-CONSTANT matrices, so Hillis-Steele doubling levels can be
    # precomputed per rho and each O(N) sweep evaluated in log2(N) batched
    # multiply-adds. MEASURED off by default: as plain-XLA einsums the level
    # updates materialize (B, N, nx, nx) broadcasts and run HBM-bound —
    # TPU v5e, QTP h100 B=4096: 4.5k solves/s vs 12.8k for the pipelined
    # sequential lax.scan. Kept as the correctness-tested reference for an
    # in-VMEM (Pallas, horizon-major layout) version of the same algorithm.
    parallel_sweeps: bool = False


@pytree_dataclass
class RiccatiFactors:
    """Design-time affine-LQR factorization for one rho value.

    Backward Riccati on cost blocks Qb_k = Q + reg_k (k=1..N; the terminal
    block uses P_term + reg_term) and Rb = R + (sigma+rho) I:

        S_{N+1} = Qb_term
        G_k  = (Rb + B' S_{k+1} B)^{-1}
        K_k  = G_k B' S_{k+1} A
        S_k  = Qb + A' S_{k+1} (A - B K_k)

    Stored: K (N, nu, nx), G (N, nu, nu), AmBK (N, nx, nx) = A - B K_k."""

    K: Array  # (N, nu, nx)
    G: Array  # (N, nu, nu)
    AmBK: Array  # (N, nx, nx)
    Bt: Array  # (nu, nx) = B'   (shared; LTI)
    A: Array  # (nx, nx)
    B: Array  # (nx, nu)


@pytree_dataclass
class RiccatiOperator:
    """Sparse-MPC ADMM operator: per-rho-grid LQR factorizations + bounds.

    Deviation-space boxes: ``x_lo/x_hi`` (nx,) apply to the interior states
    e_2..e_N (split only when ``split_interior``); ``xN_lo/xN_hi`` to the
    terminal state e_{N+1} (split when ``split_terminal``; for the equality
    terminal kind they are [0, 0])."""

    factors: Any  # RiccatiFactors with leading rho-grid axis (R, ...)
    # static so the fused kernel's rho constant and the grid index stay
    # concrete when the operator itself is traced (e.g. inside shard_map)
    rho_grid: tuple = static_field()  # (R,) sorted rho values
    rho0: float = static_field()  # resolve_config rho (auto-start index)
    Q: Array  # (nx, nx) stage state cost
    P_term: Array  # (nx, nx)
    R_in: Array  # (nu, nu)
    x_lo: Array  # (nx,) interior deviation box (may be +-inf)
    x_hi: Array
    xN_lo: Array  # (nx,) terminal deviation box
    xN_hi: Array
    u_lo: Array  # (nu,)
    u_hi: Array
    N: int = static_field()
    nx: int = static_field()
    nu: int = static_field()
    split_interior: bool = static_field()
    split_terminal: bool = static_field()
    terminal_ball: bool = static_field()  # contractive: ball-project e_{N+1}
    # equality kind: terminal consensus runs at term_rho_scale * rho
    # (config.rho_eq_scale; 1.0 for every other kind)
    term_rho_scale: float = static_field(default=1.0)
    # parallel-in-time sweep constants (None when N == 1): Hillis-Steele
    # doubling-level matrices + full prefix products for the backward
    # (reversed g-recursion) and forward (e-rollout) affine recurrences,
    # precomputed per rho-grid entry at design time
    bwd_levels: Any = None  # (R, L, N, nx, nx)
    bwd_full: Any = None  # (R, N, nx, nx)
    fwd_levels: Any = None  # (R, L, N, nx, nx)
    fwd_full: Any = None  # (R, N, nx, nx)


def _factorize_one(A, B, Qb, Rb, Qb_term, N):
    """Backward Riccati factorization (host/design time, f64)."""
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


def _scan_levels(Ms: np.ndarray):
    """Hillis-Steele doubling-level matrices for the affine prefix
    recurrence y_i = M_i y_{i-1} + b_i (host, f64).

    Returns (levels (L, N, nx, nx), full (N, nx, nx)): at runtime level l
    with stride s = 2^l updates b[s:] += levels[l][s:] @ b[:-s]; after all
    levels y_i = b_i + full_i @ y_init (full_i = M_i ... M_0)."""
    N = Ms.shape[0]
    C = Ms.copy()
    levels = []
    s = 1
    while s < N:
        levels.append(C.copy())
        Cn = C.copy()
        Cn[s:] = np.einsum("nij,njk->nik", C[s:], C[:-s])
        C = Cn
        s *= 2
    if not levels:  # N == 1: no combine levels needed
        levels = [np.zeros_like(Ms)]
    return np.stack(levels), C


def resolve_config(config: RiccatiConfig, R: Array) -> RiccatiConfig:
    """Fill in auto (None) rho / rho_grid from the input-weight scale.

    rho0 = mean(diag R): the ADMM splitting regularizes the w-update's
    input blocks with R + rho I, and the consensus contraction is fastest
    when the two terms are the same order (measured: 50-75 iterations at
    rho = R̄ vs ~700 at the old fixed 10.0 on the Q=100/R=0.1 default).
    The auto grid spans a decade either side for the per-lane adaptation
    to walk."""
    rho = config.rho
    grid = config.rho_grid
    if rho is None:
        rho = float(np.mean(np.diag(np.asarray(R, np.float64))))
        rho = max(rho, 1e-6)
    if grid is None:
        # two decades UP: binding contractive/equality terminal rows need
        # rho >> R-bar to contract (measured on QTP: the hard contractive
        # lane converges at 100 R-bar and never below 10 R-bar); the stall
        # escalator walks up this grid instead of guessing infeasibility
        grid = (0.1 * rho, rho, 10.0 * rho, 100.0 * rho)
    return dataclasses.replace(config, rho=float(rho), rho_grid=tuple(grid))


def _initial_ridx(op: "RiccatiOperator", config: RiccatiConfig) -> int:
    """Grid index of the starting rho. Auto (rho=None) re-derives the
    resolve_config rule from the operator's own R so the engine can carry
    the user's unresolved config (round-trip identity) and still start at
    the resolved rho."""
    rho = op.rho0 if config.rho is None else float(config.rho)
    return int(np.argmin(np.abs(np.log(op.rho_grid) - np.log(rho))))


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
    terminal_kind: str = "none",
    config: RiccatiConfig = RiccatiConfig(),
) -> RiccatiOperator:
    """Design-time factorization for every rho-grid entry (host, f64).

    Boxes are deviation-space. ``terminal_kind`` in {"none", "equality",
    "contractive"}; neighborhood H-rep rows are out of this engine's scope
    (the condensed engine covers them)."""
    if terminal_kind not in ("none", "equality", "contractive"):
        raise ValueError(
            f"riccati engine does not support terminal kind {terminal_kind!r}"
        )
    config = resolve_config(config, R)
    A64 = np.asarray(A, np.float64)
    B64 = np.asarray(B, np.float64)
    Q64 = np.asarray(Q, np.float64)
    R64 = np.asarray(R, np.float64)
    P64 = np.asarray(P_term, np.float64)
    nx, nu = B64.shape

    split_interior = bool(state_constraint)
    split_terminal = bool(state_constraint) or terminal_kind in (
        "equality",
        "contractive",
    )
    terminal_ball = terminal_kind == "contractive"
    # terminal consensus boost: equality kind only (the [0,0] projection is
    # exact under any rho; boosting it accelerates the terminal dual the
    # same way rho_eq_scale does for the condensed engine's equality rows)
    term_scale = (
        float(config.rho_eq_scale) if terminal_kind == "equality" else 1.0
    )

    x_lo64 = np.asarray(x_lo, np.float64)
    x_hi64 = np.asarray(x_hi, np.float64)
    if terminal_kind == "equality":
        xN_lo = np.zeros(nx)
        xN_hi = np.zeros(nx)
    elif state_constraint:
        xN_lo, xN_hi = x_lo64, x_hi64
    else:
        xN_lo = np.full(nx, -np.inf)
        xN_hi = np.full(nx, np.inf)

    grid = sorted(set(float(r) for r in config.rho_grid) | {float(config.rho)})
    Ks, Gs, AmBKs = [], [], []
    bwd_lv, bwd_fu, fwd_lv, fwd_fu = [], [], [], []
    for rho in grid:
        reg_u = (config.sigma + rho) * np.eye(nu)
        # rho joins a state block's cost only where that block is split —
        # otherwise the w-update would take pointless proximal steps
        rho_int = (
            (config.sigma + rho) * np.eye(nx)
            if split_interior
            else config.sigma * np.eye(nx)
        )
        rho_t = min(term_scale * rho, 1e3)
        rho_term = (
            (config.sigma + rho_t) * np.eye(nx)
            if split_terminal
            else config.sigma * np.eye(nx)
        )
        K, G, AmBK = _factorize_one(
            A64, B64, Q64 + rho_int, R64 + reg_u, P64 + rho_term, N
        )
        Ks.append(K)
        Gs.append(G)
        AmBKs.append(AmBK)
        # parallel-sweep doubling levels: backward g-recursion runs the
        # REVERSED AmBK' sequence; forward e-rollout runs AmBK in order
        lv, fu = _scan_levels(np.transpose(AmBK, (0, 2, 1))[::-1].copy())
        bwd_lv.append(lv)
        bwd_fu.append(fu)
        lv, fu = _scan_levels(AmBK.copy())
        fwd_lv.append(lv)
        fwd_fu.append(fu)

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
        rho_grid=tuple(grid),
        rho0=float(config.rho),
        Q=f32(Q64),
        P_term=f32(P64),
        R_in=f32(R64),
        x_lo=f32(x_lo64),
        x_hi=f32(x_hi64),
        xN_lo=f32(xN_lo),
        xN_hi=f32(xN_hi),
        u_lo=f32(u_lo),
        u_hi=f32(u_hi),
        N=int(N),
        nx=int(nx),
        nu=int(nu),
        split_interior=split_interior,
        split_terminal=split_terminal,
        terminal_ball=terminal_ball,
        term_rho_scale=term_scale,
        bwd_levels=f32(np.stack(bwd_lv)),
        bwd_full=f32(np.stack(bwd_fu)),
        fwd_levels=f32(np.stack(fwd_lv)),
        fwd_full=f32(np.stack(fwd_fu)),
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
        ff_k = _mm(G_k, _mm(op.factors.Bt, g_next) + lu_k)
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
        u_k = -_mm(K_k, e) - ff_k
        e_next = _mm(A, e) + _mm(B, u_k)
        return e_next, (e_next, u_k)

    _, (es, us) = jax.lax.scan(fwd, e0, (K, ffs))
    X = jnp.concatenate([e0[None], es], axis=0)
    return X, us


def _affine_prefix(levels: Array, full: Array, b: Array, y_init: Array, N: int):
    """Evaluate y_i = M_i y_{i-1} + b_i (y_{-1} = y_init) via precomputed
    doubling levels in log2(N) fused batched multiply-adds (per lane; the
    small nx contraction vectorizes on the VPU under vmap — no sequential
    O(N) dependency chain)."""
    s = 1
    lvl = 0
    while s < N:
        contrib = jnp.einsum(
            "nij,nj->ni", levels[lvl, s:], b[:-s], precision=H
        )
        b = jnp.concatenate([b[:s], b[s:] + contrib], axis=0)
        s *= 2
        lvl += 1
    return b + jnp.einsum("nij,j->ni", full, y_init, precision=H)


def _lqr_affine_solve_pscan(
    op: RiccatiOperator, ridx, e0, lin_interior, lin_xN, lin_u
):
    """Parallel-in-time version of :func:`_lqr_affine_solve`: identical
    math, evaluated with the precomputed doubling levels. The rho-grid
    entry is selected by a masked sum over the (small) grid — level
    matrices stay shared constants instead of per-lane gathers."""
    N, nx = op.N, op.nx
    R = len(op.rho_grid)

    lpre = jnp.concatenate(
        [jnp.zeros((1, nx), jnp.float32), lin_interior], axis=0
    )  # (N, nx)

    def one(r):
        K = op.factors.K[r]  # (N, nu, nx)
        G = op.factors.G[r]
        # backward: g_k = AmBK_k' g_{k+1} + (lpre_k - K_k' lu_k), reversed
        bb = lpre - jnp.einsum("nui,nu->ni", K, lin_u, precision=H)
        g_rev = _affine_prefix(
            op.bwd_levels[r], op.bwd_full[r], bb[::-1], lin_xN, N
        )
        g = g_rev[::-1]  # (N, nx): g_0..g_{N-1}
        gnext = jnp.concatenate([g[1:], lin_xN[None]], axis=0)  # g_{k+1}
        Btg = jnp.matmul(gnext, op.factors.Bt.T, precision=H)  # (N, nu)
        ff = jnp.einsum("nuv,nv->nu", G, Btg + lin_u, precision=H)
        # forward: e_{k+1} = AmBK_k e_k - B ff_k
        bf = -jnp.matmul(ff, op.factors.B.T, precision=H)  # (N, nx)
        e_next = _affine_prefix(op.fwd_levels[r], op.fwd_full[r], bf, e0, N)
        X = jnp.concatenate([e0[None], e_next], axis=0)  # (N+1, nx)
        U = -jnp.einsum("nux,nx->nu", K, X[:-1], precision=H) - ff
        return X, U

    if R == 1:
        return one(0)
    Xo = jnp.zeros((N + 1, nx), jnp.float32)
    Uo = jnp.zeros((N, op.nu), jnp.float32)
    for r in range(R):
        Xr, Ur = one(r)
        m = (ridx == r).astype(jnp.float32)
        Xo = Xo + m * Xr
        Uo = Uo + m * Ur
    return Xo, Uo


def _project_X(op: RiccatiOperator, V: Array, ball_r) -> Array:
    """Project the state copy V (N+1, nx) onto its per-block constraint set:
    interior box (rows 1..N-1), terminal box or ball (row N). Row 0 (the
    fixed e_1) is never projected."""
    out = V
    if op.split_interior:
        interior = jnp.clip(V[1:-1], op.x_lo, op.x_hi)
        out = out.at[1:-1].set(interior)
    if op.terminal_ball:
        w = V[-1]
        nrm = jnp.linalg.norm(w)
        scale = jnp.where(nrm > ball_r, ball_r / jnp.maximum(nrm, 1e-30), 1.0)
        out = out.at[-1].set(w * scale)
    elif op.split_terminal:
        out = out.at[-1].set(jnp.clip(V[-1], op.xN_lo, op.xN_hi))
    return out


def _box_support(d, lo, hi):
    """Support function of a box at direction d; +inf rays contribute only
    where d points along them (d==0 rows contribute exactly 0)."""
    pos = jnp.where(d > 0, jnp.where(jnp.isfinite(hi), hi * d, jnp.inf), 0.0)
    neg = jnp.where(d < 0, jnp.where(jnp.isfinite(lo), lo * d, jnp.inf), 0.0)
    return jnp.sum(pos + neg)


def infeas_certificate(op, dlamX, dlamU, Xbar, ball_r, eps):
    """Primal-infeasibility certificate for the consensus splitting
    (Banjac et al. 2019 "Infeasibility detection in ADMM" / OSQP §3.4,
    re-derived for w ∈ M = {(X,U): X_{k+1}=A X_k + B U_k, X_0 = e0},
    v ∈ C = boxes + terminal ball, w = v):

    the problem is primal infeasible iff the limiting dual delta dlam
    separates M from C, i.e. S_C(dlam) + S_M(-dlam) < 0 where
      * S_M(-dlam) finite requires dlam ⊥ V (V = M's linear subspace):
        checked by the adjoint recursion g_k = A' g_{k+1} + dlamX_k with
        per-step residual r_k = B' g_{k+1} + dlamU_k ≈ 0 (one O(N) scan);
      * then S_M(-dlam) = -<dlam, wbar> for any wbar ∈ M (the zero-input
        rollout Xbar), and S_C is the box/ball support function.
    Unsplit rows carry dlam ≡ 0 and drop out of every term. This replaces
    the round-2 stall *guess* — a false "infeasible" makes the caller
    discard a good plan, so only a verifiable separating functional may
    declare it (contrast: the reference never checks status at all,
    computation_mpc.jl:38-55)."""
    # orthogonality to the dynamics subspace: reverse adjoint scan
    def adj(g, inp):
        dlx_k, dlu_k = inp
        r_k = _mm(op.factors.Bt, g) + dlu_k
        g_new = _mm(op.factors.A.T, g) + dlx_k
        return g_new, jnp.max(jnp.abs(r_k))

    _, r_all = jax.lax.scan(
        adj, dlamX[-1], (dlamX[:-1], dlamU), reverse=True
    )
    ortho_res = jnp.max(r_all)

    s_c = _box_support(dlamU, op.u_lo, op.u_hi)
    if op.split_interior:
        s_c = s_c + _box_support(dlamX[1:-1], op.x_lo, op.x_hi)
    if op.terminal_ball:
        s_c = s_c + ball_r * jnp.linalg.norm(dlamX[-1])
    elif op.split_terminal:
        s_c = s_c + _box_support(dlamX[-1], op.xN_lo, op.xN_hi)
    support = s_c - jnp.sum(dlamX * Xbar)

    dnorm = jnp.maximum(jnp.max(jnp.abs(dlamX)), jnp.max(jnp.abs(dlamU)))
    return (
        (dnorm > 1e-9)
        & (ortho_res <= eps * dnorm)
        & (support <= -eps * dnorm)
    )


def rollout_warm(op: RiccatiOperator, e0: Array, U: Array) -> Array:
    """Forward rollout of a warm input plan (deviation space): O(N) scan."""

    def fwd(e, u_k):
        e_next = _mm(op.factors.A, e) + _mm(op.factors.B, u_k)
        return e_next, e_next

    _, es = jax.lax.scan(fwd, e0, U)
    return jnp.concatenate([e0[None], es], axis=0)


def solve_sparse(
    op: RiccatiOperator,
    e0: Array,  # (nx,) initial deviation
    warm_X: Optional[Array] = None,  # (N+1, nx)
    warm_U: Optional[Array] = None,  # (N, nu)
    warm_lam: Optional[Tuple[Array, Array]] = None,
    config: RiccatiConfig = RiccatiConfig(),
):
    """One sparse ADMM solve (vmap over lanes for batching).

    Splitting: w = (X, U) handled by the LQR solve; v = projected copy with
    duals lam. Returns (X, U, status, iterations, r_prim, r_dual,
    (lamX, lamU))."""
    N, nx, nu = op.N, op.nx, op.nu
    dt = jnp.float32
    grid = jnp.asarray(op.rho_grid, dt)
    log_grid = jnp.log(grid)
    ridx0 = jnp.asarray(_initial_ridx(op, config), jnp.int32)
    split_x = op.split_interior or op.split_terminal
    # sweep implementation: parallel-in-time doubling (log2 N fused batched
    # multiply-adds, the TPU-native choice) vs the sequential lax.scan
    _affine_solve = (
        _lqr_affine_solve_pscan
        if (config.parallel_sweeps and op.bwd_levels is not None)
        else _lqr_affine_solve
    )
    ball_r = (
        jnp.sqrt(CONTRACTIVE_FACTOR) * jnp.linalg.norm(e0)
        if op.terminal_ball
        else jnp.asarray(0.0, dt)
    )

    U0 = jnp.zeros((N, nu), dt) if warm_U is None else warm_U
    X0 = rollout_warm(op, e0, U0) if warm_X is None else warm_X
    if warm_lam is None:
        lamX0 = jnp.zeros((N + 1, nx), dt)
        lamU0 = jnp.zeros((N, nu), dt)
    else:
        lamX0, lamU0 = warm_lam

    vX0 = _project_X(op, X0, ball_r)
    vU0 = jnp.clip(U0, op.u_lo, op.u_hi)
    ck = max(1, int(config.check_interval))

    ts = float(op.term_rho_scale)

    def admm_iter(carry, _):
        X, U, vX, vU, lamX, lamU, ridx = carry
        rho = jnp.take(grid, ridx)
        # terminal-node rho (equality boost; matches the factorization's
        # reg_term, incl. the 1e3 f32 cap)
        rho_t = jnp.minimum(ts * rho, 1e3) if ts != 1.0 else rho
        # w-update linear terms: the augmented term -(rho v - lam)
        if op.split_interior:
            lin_int = -rho * vX[1:-1] + lamX[1:-1]  # interior states e_2..e_N
        else:
            lin_int = jnp.zeros((N - 1, nx), dt)
        if op.split_terminal:
            lin_xN = -rho_t * vX[-1] + lamX[-1]
        else:
            lin_xN = jnp.zeros((nx,), dt)
        lin_u = -rho * vU + lamU
        Xn, Un = _affine_solve(op, ridx, X[0], lin_int, lin_xN, lin_u)
        # v-update: projection onto the blocks; dual ascent
        vUn = jnp.clip(Un + lamU / rho, op.u_lo, op.u_hi)
        lamUn = lamU + rho * (Un - vUn)
        if split_x:
            vXn = _project_X(op, Xn + lamX / rho, ball_r)
            lamXn = lamX + rho * (Xn - vXn)
            if ts != 1.0:
                # boosted terminal row (equality: projection is the exact
                # [0,0] clip regardless of rho)
                vN = jnp.clip(Xn[-1] + lamX[-1] / rho_t, op.xN_lo, op.xN_hi)
                vXn = vXn.at[-1].set(vN)
                lamXn = lamXn.at[-1].set(lamX[-1] + rho_t * (Xn[-1] - vN))
            # the fixed initial state e_1 is NOT part of the splitting — a
            # dual on it would wind up forever when e0 sits outside the box
            vXn = vXn.at[0].set(Xn[0])
            lamXn = lamXn.at[0].set(0.0)
            if not op.split_interior:
                # only the terminal row participates
                vXn = vXn.at[1:-1].set(Xn[1:-1])
                lamXn = lamXn.at[1:-1].set(0.0)
        else:
            vXn = Xn
            lamXn = jnp.zeros_like(lamX)
        return (Xn, Un, vXn, vUn, lamXn, lamUn, ridx), None

    def residuals(X, U, vX, vU, vX_prev, vU_prev, rho):
        # Terminal-rho boost note (r4 review): the boosted equality
        # terminal row uses rho_t for its dual ascent, but its v-copy is
        # CONSTANT (the [0,0] clip yields exactly 0 every iteration), so
        # its dual-residual term rho_t*(v_k - v_{k-1}) is identically
        # zero — the base-rho scaling below is exact for every row that
        # can actually move (classic ADMM: the dual residual of a fixed
        # consensus block vanishes; convergence there is governed by the
        # primal residual |X_N - 0|, which rp includes).
        rp = jnp.max(jnp.abs(U - vU))
        rd = rho * jnp.max(jnp.abs(vU - vU_prev))
        if split_x:
            rp = jnp.maximum(jnp.max(jnp.abs(X - vX)), rp)
            rd = jnp.maximum(rho * jnp.max(jnp.abs(vX - vX_prev)), rd)
        return rp, rd

    adapt = int(config.adapt_interval or 0)

    def adapt_rho(ridx, rho, rp_n, rd_n, it, done):
        """OSQP §5.2 over the prefactorized grid (per lane): rho ←
        rho·sqrt(rp_n/rd_n), snapped to the nearest grid entry, every
        adapt_interval iterations."""
        if len(op.rho_grid) == 1 or not adapt:
            return ridx
        ratio = rp_n / jnp.maximum(rd_n, 1e-12)
        log_t = jnp.log(rho) + 0.5 * jnp.log(jnp.clip(ratio, 1e-8, 1e8))
        new = jnp.argmin(jnp.abs(log_grid - log_t)).astype(jnp.int32)
        do = (jnp.mod(it, adapt) < ck) & (~done)
        return jnp.where(do, new, ridx)

    Xbar = rollout_warm(op, e0, jnp.zeros((N, nu), dt))
    top_ridx = len(op.rho_grid) - 1

    def body(state):
        X, U, vX, vU, lamX, lamU, ridx, it, rp, rd, done, stall, infeas = state
        vU_prev = vU
        vX_prev = vX
        (Xn, Un, vXn, vUn, lamXn, lamUn, ridxn), _ = jax.lax.scan(
            admm_iter, (X, U, vX, vU, lamX, lamU, ridx), None, length=ck
        )
        rho = jnp.take(grid, ridxn)
        rp_new, rd_new = residuals(Xn, Un, vXn, vUn, vX_prev, vU_prev, rho)
        scale = jnp.maximum(
            jnp.max(jnp.abs(Un)), jnp.maximum(jnp.max(jnp.abs(Xn)), 1e-6)
        )
        tol = config.eps_abs + config.eps_rel * scale
        finite = jnp.isfinite(jnp.sum(Un) + jnp.sum(Xn))
        # real infeasibility verdict: separating-functional certificate on
        # the block's dual delta (never a convergence-speed guess)
        cert = infeas_certificate(
            op, lamXn - lamX, lamUn - lamU, Xbar, ball_r, config.eps_infeas
        )
        # stall ESCALATOR: a primal residual pinned well above tol means
        # rho is too soft for the binding set — walk up the grid
        stalled = (rp_new > 10.0 * tol) & (
            jnp.abs(rp - rp_new) <= 1e-3 * rp_new
        )
        stall_tmp = jnp.where(stalled, stall + 1, 0)
        esc = (stall_tmp >= config.stall_checks) & (ridxn < top_ridx)
        stall_new = jnp.where(esc, 0, stall_tmp)
        done_new = ((rp_new <= tol) & (rd_new <= tol * rho)) | ~finite | cert
        prim_norm = jnp.maximum(jnp.max(jnp.abs(Un)), jnp.max(jnp.abs(vUn)))
        dual_norm = jnp.max(jnp.abs(lamUn))
        if split_x:
            prim_norm = jnp.maximum(
                prim_norm,
                jnp.maximum(jnp.max(jnp.abs(Xn)), jnp.max(jnp.abs(vXn))),
            )
            dual_norm = jnp.maximum(dual_norm, jnp.max(jnp.abs(lamXn)))
        ridx2 = adapt_rho(
            ridxn, rho,
            rp_new / jnp.maximum(prim_norm, 1e-6),
            rd_new / jnp.maximum(dual_norm, 1e-6),
            it + ck, done_new,
        )
        ridx3 = jnp.where(esc, jnp.minimum(ridx2 + 1, top_ridx), ridx2)
        return (
            Xn, Un, vXn, vUn, lamXn, lamUn, ridx3, it + ck, rp_new, rd_new,
            done_new, stall_new, infeas | cert,
        )

    def cond(state):
        it, done = state[7], state[10]
        return (~done) & (it < config.max_iter)

    zero = jnp.sum(e0) * 0.0
    izero = zero.astype(jnp.int32)
    X0 = X0.at[0].set(e0)
    init = (
        X0, U0, vX0, vU0, lamX0, lamU0, ridx0 + izero,
        izero, jnp.inf + zero, jnp.inf + zero, zero > 1.0, izero, zero > 1.0,
    )
    X, U, vX, vU, lamX, lamU, ridx, it, rp, rd, done, stall, infeas = (
        jax.lax.while_loop(cond, body, init)
    )
    finite = jnp.isfinite(jnp.sum(U) + jnp.sum(X))
    status = jnp.where(
        ~finite,
        STATUS_NUMERIC_ERROR,
        jnp.where(
            infeas,
            STATUS_PRIMAL_INFEASIBLE,
            jnp.where(done, STATUS_CONVERGED, STATUS_MAX_ITER),
        ),
    ).astype(jnp.int32)
    # return the projected (feasible) inputs
    U_out = jnp.clip(U, op.u_lo, op.u_hi)
    return X, U_out, status, it, rp, rd, (lamX, lamU)
