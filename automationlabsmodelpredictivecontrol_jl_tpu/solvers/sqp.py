"""SQP nonlinear-MPC engine: the in-house Ipopt replacement.

The reference transcribes neural dynamics neuron-by-neuron into JuMP
@NLconstraints and hands the NLP to Ipopt (fnn/...:63-189,
solver_selection.jl:100-106). TPU-native redesign: single-shooting SQP —

  1. roll the learned model forward (lax.scan; dynamics are MXU matmuls),
  2. linearize along the trajectory with jax.jacfwd (the same derivative
     the reference gets from ForwardDiff, SURVEY §3.3),
  3. build the condensed Gauss-Newton LTV-QP in the input deviations
     (exact expansion: the cost is quadratic, dynamics are the only
     nonlinearity) with Levenberg damping,
  4. solve it with the batched ADMM QP engine (traced operator build,
     K factorized once per SQP iteration),
  5. branchless parallel line search: all step lengths evaluated at once
     via vmap on a merit = true cost + L1 penalty on state-box /
     terminal-set violation,

iterated a fixed maximum number of times with masked convergence — so a
vmapped batch of scenarios compiles to one fused program (BASELINE
config 3/4: Fnn and ResNet/ICNN dynamics with soft state constraints).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import admm as admm_ops
from ..ops.condense import (
    _blockdiag_weight,
    _difference_operator,
    ltv_prediction_matrices,
)
from ..types import (
    STATUS_CONVERGED,
    STATUS_MAX_ITER,
    MpcSolution,
    References,
    TerminalIngredient,
    Weights,
)
from ..utils.pytrees import pytree_dataclass, static_field

Array = Any
HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class SqpConfig:
    max_sqp_iter: int = 12
    damping: float = 1e-4
    line_search_alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1)
    soft_state_penalty: float = 1e4  # L1 slack penalty on state boxes
    terminal_penalty: float = 1e4  # merit penalty on terminal-set violation
    tol_du: float = 1e-5
    feas_tol: float = 1e-4  # constraint-violation gate on STATUS_CONVERGED
    scaling_iters: int = 2
    admm: admm_ops.AdmmConfig = admm_ops.AdmmConfig(
        max_iter=150, eps_abs=1e-6, eps_rel=1e-6, adaptive=True
    )


@pytree_dataclass
class SqpEngine:
    """Engine record for the nonlinear path. The subproblem operators are
    rebuilt (traced) every SQP iteration, so the engine only carries
    static row-structure metadata."""

    config: SqpConfig = static_field()
    state_rows: bool = static_field()
    terminal_kind: str = static_field()
    n_terminal_rows: int = static_field()
    m_total: int = static_field()


def build_engine(system, tuning, config: Optional[SqpConfig]) -> SqpEngine:
    config = config or SqpConfig()
    N, nx, nu = tuning.horizon, system.nx, system.nu
    kind = tuning.terminal.kind
    if kind == "equality" or kind == "contractive":
        n_term = nx
    elif kind == "neighborhood":
        n_term = int(tuning.terminal.H.shape[0])
    else:
        n_term = 0
    m = N * nu + (N * nx if tuning.state_constraint else 0) + n_term
    return SqpEngine(
        config=config,
        state_rows=bool(tuning.state_constraint),
        terminal_kind=kind,
        n_terminal_rows=n_term,
        m_total=m,
    )


def initial_warm_state(engine: SqpEngine, tuning) -> Tuple[Array, Array]:
    """Warm start: u trajectory = input reference; duals = 0."""
    u0 = tuning.references.u.T.reshape(-1)  # (N*nu,) raw inputs
    y0 = jnp.zeros((engine.m_total,), jnp.float32)
    return u0, y0


def _row_masks(engine: SqpEngine, N: int, nx: int, nu: int):
    """Static eq-row mask and soft-penalty vector for the subproblem rows."""
    cfg = engine.config
    m = engine.m_total
    eq = np.zeros((m,), bool)
    soft = np.full((m,), np.inf)
    off = N * nu
    if engine.state_rows:
        soft[off : off + N * nx] = cfg.soft_state_penalty
        off += N * nx
    if engine.terminal_kind == "equality":
        eq[off : off + nx] = True
    n_ball = nx if engine.terminal_kind == "contractive" else 0
    return eq, jnp.asarray(soft, jnp.float32), n_ball


def _rollout(system, x0: Array, us: Array) -> Array:
    def step(x, uk):
        xn = system.apply_fn(system.params, x, uk)
        return xn, xn

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)  # (N+1, nx)


def _trajectory_jacobians(system, xs: Array, us: Array):
    f = lambda x, u: system.apply_fn(system.params, x, u)

    def jacs(x, u):
        return jax.jacfwd(f, argnums=(0, 1))(x, u)

    As, Bs = jax.vmap(jacs)(xs[:-1], us)
    return As, Bs  # (N,nx,nx), (N,nx,nu)


def true_objective(tuning, xs: Array, us: Array) -> Array:
    """Reference-parity objective (design_mpc.jl:436-465): stage sum over
    e_x columns 1..N (Julia) == rows 0..N-1 here, P on the last state,
    R on all inputs, S on input differences."""
    w: Weights = tuning.weights
    term: TerminalIngredient = tuning.terminal
    ex = xs - tuning.references.x.T  # (N+1, nx)
    eu = us - tuning.references.u.T  # (N, nu)
    J = jnp.einsum("ki,ij,kj->", ex[:-1], w.Q, ex[:-1], precision=HIGHEST)
    J += ex[-1] @ term.P @ ex[-1]
    J += jnp.einsum("ki,ij,kj->", eu, w.R, eu, precision=HIGHEST)
    du = us[:-1] - us[1:]
    J += jnp.einsum("ki,ij,kj->", du, w.S, du, precision=HIGHEST)
    return J


def _violation(engine: SqpEngine, tuning, system, xs: Array) -> Array:
    """Max constraint violation of a rolled-out trajectory: state boxes +
    the terminal set (inputs are clipped to their box, so always 0).
    Surfaced as the solution's primal residual — a line-search-stalled
    iterate with violated boxes must never report "converged, residual 0"
    (the status blindness this framework exists to fix,
    computation_mpc.jl:38-55)."""
    viol = jnp.asarray(0.0, xs.dtype)
    if engine.state_rows:
        viol = jnp.max(
            jax.nn.relu(system.X.lo - xs[1:]) + jax.nn.relu(xs[1:] - system.X.hi)
        )
    ex_last = xs[-1] - tuning.references.x[:, -1]
    if engine.terminal_kind == "equality":
        viol = jnp.maximum(viol, jnp.max(jnp.abs(ex_last)))
    elif engine.terminal_kind == "contractive":
        ex0 = xs[0] - tuning.references.x[:, 0]
        viol = jnp.maximum(
            viol,
            jax.nn.relu(jnp.sum(ex_last**2) - 0.9 * jnp.sum(ex0**2)),
        )
    elif engine.terminal_kind == "neighborhood":
        viol = jnp.maximum(
            viol,
            jnp.max(jax.nn.relu(tuning.terminal.H @ ex_last - tuning.terminal.b)),
        )
    return viol


def _merit(engine: SqpEngine, tuning, system, xs: Array, us: Array) -> Array:
    """Line-search merit: true objective + L1 penalties on state-box and
    terminal-set violation (keeps the search honest about feasibility)."""
    cfg = engine.config
    J = true_objective(tuning, xs, us)
    if engine.state_rows:
        viol = jnp.sum(
            jax.nn.relu(system.X.lo - xs[1:]) + jax.nn.relu(xs[1:] - system.X.hi)
        )
        J = J + cfg.soft_state_penalty * viol
    ex_last = xs[-1] - tuning.references.x[:, -1]
    if engine.terminal_kind == "equality":
        J = J + cfg.terminal_penalty * jnp.sum(jnp.abs(ex_last))
    elif engine.terminal_kind == "contractive":
        ex0 = xs[0] - tuning.references.x[:, 0]
        J = J + cfg.terminal_penalty * jax.nn.relu(
            jnp.sum(ex_last**2) - 0.9 * jnp.sum(ex0**2)
        )
    elif engine.terminal_kind == "neighborhood":
        J = J + cfg.terminal_penalty * jnp.sum(
            jax.nn.relu(tuning.terminal.H @ ex_last - tuning.terminal.b)
        )
    return J


def solve_nonlinear(
    system,
    tuning,
    engine: SqpEngine,
    x0: Array,
    u_warm: Array,  # (N*nu,) raw input trajectory warm start
    y_warm: Array,  # (m,) dual warm start
):
    """One full SQP solve. Returns (MpcSolution, u_final_flat, y_final)."""
    cfg = engine.config
    N = tuning.horizon
    nx, nu = system.nx, system.nu
    n = N * nu
    dt = jnp.float32

    w = tuning.weights
    refs: References = tuning.references
    xref_tail = refs.x.T[1:]  # (N, nx) steps 2..N+1
    uref_stack = refs.u.T.reshape(-1)

    Rbar = jnp.kron(jnp.eye(N, dtype=dt), w.R.astype(dt))
    Dop = _difference_operator(N, nu, dt)
    Sbar = jnp.kron(jnp.eye(N - 1, dtype=dt), w.S.astype(dt))
    DSD = Dop.T @ Sbar @ Dop
    Qbar = _blockdiag_weight(w.Q.astype(dt), tuning.terminal.P.astype(dt), N)

    eq_mask, soft_mu, n_ball = _row_masks(engine, N, nx, nu)
    alphas = jnp.asarray(cfg.line_search_alphas, dt)

    u_lo = jnp.tile(system.U.lo.astype(dt), N)
    u_hi = jnp.tile(system.U.hi.astype(dt), N)

    def sqp_step(u_flat, y):
        us = u_flat.reshape(N, nu)
        xs = _rollout(system, x0, us)
        As, Bs = _trajectory_jacobians(system, xs, us)
        F, G, _ = ltv_prediction_matrices(As, Bs)
        G_flat = G.transpose(0, 2, 1, 3).reshape(N * nx, N * nu)

        ebar = (xs[1:] - xref_tail).reshape(-1)  # (N*nx,)
        eu_bar = u_flat - uref_stack

        GtQ = jnp.matmul(G_flat.T, Qbar, precision=HIGHEST)
        P_qp = 2.0 * (
            jnp.matmul(GtQ, G_flat, precision=HIGHEST) + Rbar + DSD
        ) + 2.0 * cfg.damping * jnp.eye(n, dtype=dt)
        q = 2.0 * (GtQ @ ebar + Rbar @ eu_bar + Dop.T @ (Sbar @ (Dop @ u_flat)))

        rows_A = [jnp.eye(n, dtype=dt)]
        rows_l = [u_lo - u_flat]
        rows_u = [u_hi - u_flat]
        if engine.state_rows:
            xs_tail = xs[1:].reshape(-1)
            rows_A.append(G_flat)
            rows_l.append(jnp.tile(system.X.lo.astype(dt), N) - xs_tail)
            rows_u.append(jnp.tile(system.X.hi.astype(dt), N) - xs_tail)
        ball_c = jnp.zeros((0,), dt)
        ball_r = jnp.asarray(0.0, dt)
        ex_last = ebar[-nx:]
        if engine.terminal_kind == "equality":
            rows_A.append(G_flat[-nx:])
            rows_l.append(-ex_last)
            rows_u.append(-ex_last)
        elif engine.terminal_kind == "neighborhood":
            H = tuning.terminal.H.astype(dt)
            rows_A.append(jnp.matmul(H, G_flat[-nx:], precision=HIGHEST))
            rows_l.append(jnp.full((H.shape[0],), -jnp.inf, dt))
            rows_u.append(tuning.terminal.b.astype(dt) - H @ ex_last)
        elif engine.terminal_kind == "contractive":
            rows_A.append(G_flat[-nx:])
            rows_l.append(jnp.full((nx,), -jnp.inf, dt))
            rows_u.append(jnp.full((nx,), jnp.inf, dt))
            ball_c = ex_last
            ex0 = x0 - refs.x[:, 0]
            ball_r = jnp.sqrt(0.9) * jnp.linalg.norm(ex0)

        A_qp = jnp.concatenate(rows_A, axis=0)
        l = jnp.concatenate(rows_l, axis=0)
        ub = jnp.concatenate(rows_u, axis=0)

        op = admm_ops.build_operator_traced(
            P_qp, A_qp, eq_mask, n_ball, cfg.admm, cfg.scaling_iters
        )
        res = admm_ops.solve(
            op, q, l, ub, ball_c, ball_r, None, y, config=cfg.admm, soft_mu=soft_mu
        )
        du = res.z.reshape(N, nu)

        # branchless parallel line search (alpha = 0 candidate included)
        def cand_merit(a):
            uc = jnp.clip(us + a * du, system.U.lo, system.U.hi)
            xc = _rollout(system, x0, uc)
            return _merit(engine, tuning, system, xc, uc), uc

        merits, ucands = jax.vmap(cand_merit)(alphas)
        merit0 = _merit(engine, tuning, system, xs, us)
        all_merits = jnp.concatenate([merits, merit0[None]])
        all_cands = jnp.concatenate([ucands, us[None]], axis=0)
        u_new = all_cands[jnp.argmin(all_merits)]
        du_norm = jnp.max(jnp.abs(u_new - us))
        return u_new.reshape(-1), res.y, du_norm, res.status

    def body(carry):
        u_flat, y, it, done, status = carry
        u_new, y_new, du_norm, st = sqp_step(u_flat, y)
        done_new = du_norm < cfg.tol_du
        return (u_new, y_new, it + 1, done_new, st)

    def cond(carry):
        _, _, it, done, _ = carry
        return (~done) & (it < cfg.max_sqp_iter)

    u_f, y_f, it_f, done_f, admm_status = jax.lax.while_loop(
        cond,
        body,
        (
            u_warm.astype(dt),
            y_warm.astype(dt),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(STATUS_MAX_ITER, jnp.int32),
        ),
    )

    us = u_f.reshape(N, nu)
    xs = _rollout(system, x0, us)
    ex = xs - refs.x.T
    eu = us - refs.u.T
    # honest status: tol_du alone cannot see feasibility (the line search
    # includes the zero step) — gate convergence on the MEASURED violation
    # and report it as the primal residual (mirrors EmpcConfig.feas_tol)
    viol = _violation(engine, tuning, system, xs)
    status = jnp.where(
        done_f & (viol <= cfg.feas_tol), STATUS_CONVERGED, STATUS_MAX_ITER
    ).astype(jnp.int32)
    sol = MpcSolution(
        x=xs.T,
        e_x=ex.T,
        u=us.T,
        e_u=eu.T,
        status=status,
        iterations=it_f,
        primal_residual=viol.astype(dt),
        dual_residual=jnp.asarray(0.0, dt),
        objective=true_objective(tuning, xs, us),
    )
    return sol, u_f, y_f


def shift_warm(u_flat: Array, N: int, nu: int) -> Array:
    """Receding-horizon warm-start shift: drop step 0, repeat the last."""
    us = u_flat.reshape(N, nu)
    return jnp.concatenate([us[1:], us[-1:]], axis=0).reshape(-1)
