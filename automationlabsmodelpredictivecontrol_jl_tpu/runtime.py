"""Runtime: the receding-horizon hot loop.

Capability parity with the reference's computation layer
(src/main/computation_mpc.jl):

- update_initialization (computation_mpc.jl:17-29): functional — returns a
  new controller with the measured state pinned (the reference mutates the
  JuMP model with JuMP.fix; here x0 only enters the runtime QP vectors, a
  few GEMVs at solve time).
- calculate (computation_mpc.jl:38-55): solve + extract trajectories. The
  reference crosses the ABI boundary into OSQP/Ipopt here (SURVEY §3.2);
  we run the in-house ADMM/SQP engines fully on-device, jit/vmap-able.
- step: fused update_initialization + calculate + warm-start carry — the
  jittable function a control loop should call every sample time.
- update_references: working re-tuning semantics for the reference's
  exported-but-undefined update!/update_and_compute! (computation_mpc.jl:58-284,
  Chen & Allgöwer quasi-infinite-horizon refresh): new references re-solve
  the DARE and rebuild the terminal ingredient + QP operators.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .design import LinearEngine, MpcController, MpcTuning, RiccatiEngine
from .ops import admm as admm_ops
from .ops import riccati as riccati_ops
from .ops.condense import runtime_qp_vectors
from .solvers import sqp as sqp_mod
from .solvers.sqp import true_objective
from .types import (
    STATUS_PRIMAL_INFEASIBLE,
    MpcSolution,
)

Array = Any


def _solve_linear(
    engine: LinearEngine,
    tuning: MpcTuning,
    system,
    x0: Array,
    warm_z: Array,
    warm_y: Array,
) -> Tuple[MpcSolution, Array, Array]:
    qp = engine.qp
    refs = tuning.references
    e0 = x0 - refs.x[:, 0]
    q, l, u, ball_c, ball_r = runtime_qp_vectors(qp, e0)
    res = admm_ops.solve(
        engine.op, q, l, u, ball_c, ball_r, warm_z, warm_y,
        config=engine.config, soft_mu=engine.soft_mu,
    )

    N, nx, nu = qp.N, qp.nx, qp.nu
    z = res.z
    H = jax.lax.Precision.HIGHEST
    ex_tail = (
        jnp.matmul(qp.G_flat, z, precision=H)
        + jnp.matmul(qp.F.reshape(N * nx, nx), e0, precision=H)
    ).reshape(N, nx)
    ex = jnp.concatenate([e0[None], ex_tail], axis=0)  # (N+1, nx)
    eu = z.reshape(N, nu)
    xs = ex + refs.x.T
    us = eu + refs.u.T

    status = res.status
    if tuning.state_constraint and engine.soft_mu is None:
        # the reference also poses a box row on the (fixed) first state
        # (linear/...:64-69); with x0 pinned it is a pure feasibility check.
        # (soft-constrained controllers never declare infeasibility on it)
        x0_ok = jnp.all((x0 >= system.X.lo) & (x0 <= system.X.hi))
        status = jnp.where(x0_ok, status, STATUS_PRIMAL_INFEASIBLE).astype(jnp.int32)

    sol = MpcSolution(
        x=xs.T,
        e_x=ex.T,
        u=us.T,
        e_u=eu.T,
        status=status,
        iterations=res.iterations,
        primal_residual=res.primal_residual,
        dual_residual=res.dual_residual,
        objective=true_objective(tuning, xs, us),
    )
    # receding-horizon warm-start carry: shift the input plan one step
    z_shift = jnp.concatenate([eu[1:], eu[-1:]], axis=0).reshape(-1)
    return sol, z_shift, res.y


def _solve_riccati(
    engine: RiccatiEngine,
    tuning: MpcTuning,
    system,
    x0: Array,
    warm_z: Array,  # (N*nu,) flat input-deviation plan
    warm_y: Array,  # ((N+1)*nx + N*nu,) flat (lamX, lamU)
) -> Tuple[MpcSolution, Array, Array]:
    """O(N) sparse solve (the long-horizon engine). Same contract as the
    condensed path: deviation-space solve, receding-horizon warm carry."""
    op = engine.op
    N, nx, nu = op.N, op.nx, op.nu
    refs = tuning.references
    e0 = x0 - refs.x[:, 0]
    U_warm = warm_z.reshape(N, nu)
    lamX = warm_y[: (N + 1) * nx].reshape(N + 1, nx)
    lamU = warm_y[(N + 1) * nx :].reshape(N, nu)
    X, U, status, iters, rp, rd, (lamX_f, lamU_f) = riccati_ops.solve_sparse(
        op, e0, warm_U=U_warm, warm_lam=(lamX, lamU), config=engine.config
    )
    xs = X + refs.x.T  # (N+1, nx)
    us = U + refs.u.T  # (N, nu)

    if tuning.state_constraint:
        # feasibility of the (fixed) first state, like the condensed path
        x0_ok = jnp.all((x0 >= system.X.lo) & (x0 <= system.X.hi))
        status = jnp.where(x0_ok, status, STATUS_PRIMAL_INFEASIBLE).astype(
            jnp.int32
        )

    sol = MpcSolution(
        x=xs.T,
        e_x=X.T,
        u=us.T,
        e_u=U.T,
        status=status,
        iterations=iters,
        primal_residual=rp,
        dual_residual=rd,
        objective=true_objective(tuning, xs, us),
    )
    # receding-horizon warm carry: shift plan + duals one step
    U_shift = jnp.concatenate([U[1:], U[-1:]], axis=0)
    lamX_shift = jnp.concatenate([lamX_f[1:], lamX_f[-1:]], axis=0)
    lamU_shift = jnp.concatenate([lamU_f[1:], lamU_f[-1:]], axis=0)
    wz = U_shift.reshape(-1)
    wy = jnp.concatenate([lamX_shift.reshape(-1), lamU_shift.reshape(-1)])
    return sol, wz, wy


def _solve_sqp(
    engine, tuning: MpcTuning, system, x0: Array, warm_z: Array, warm_y: Array
) -> Tuple[MpcSolution, Array, Array]:
    if getattr(engine, "shooting", "single") == "multiple":
        sol, z_f, y_f = sqp_mod.solve_nonlinear_ms(
            system, tuning, engine, x0, warm_z, warm_y
        )
        z_next, y_next = sqp_mod.shift_warm_ms(
            z_f, y_f, tuning.horizon, system.nx, system.nu
        )
        return sol, z_next, y_next
    sol, u_f, y_f = sqp_mod.solve_nonlinear(system, tuning, engine, x0, warm_z, warm_y)
    u_next = sqp_mod.shift_warm(u_f, tuning.horizon, system.nu)
    return sol, u_next, y_f


def solve_once(
    controller: MpcController, x0: Array, warm_z: Array, warm_y: Array
) -> Tuple[MpcSolution, Array, Array]:
    """Pure solve at state x0 with explicit warm state (vmap-friendly:
    map over (x0, warm_z, warm_y) for batched scenario solves)."""
    from .solvers.empc import EmpcEngine, solve_economic
    from .solvers.milp import MilpEngine, solve_milp

    if isinstance(controller.engine, LinearEngine):
        return _solve_linear(
            controller.engine, controller.tuning, controller.system, x0, warm_z, warm_y
        )
    if isinstance(controller.engine, RiccatiEngine):
        return _solve_riccati(
            controller.engine, controller.tuning, controller.system, x0, warm_z, warm_y
        )
    if isinstance(controller.engine, MilpEngine):
        # host engine (crosses into native/qpref, like the reference's SCIP
        # boundary, SURVEY.md §3.2): not jit/vmap-able by design
        sol = solve_milp(controller.engine, controller.tuning, x0)
        return sol, warm_z, warm_y
    if isinstance(controller.engine, EmpcEngine):
        sol, u_f, y_f = solve_economic(
            controller.system, controller.tuning, controller.engine, x0, warm_z, warm_y
        )
        u_next = sqp_mod.shift_warm(u_f, controller.tuning.horizon, controller.system.nu)
        return sol, u_next, y_f
    return _solve_sqp(
        controller.engine, controller.tuning, controller.system, x0, warm_z, warm_y
    )


def update_initialization(controller: MpcController, x0: Array) -> MpcController:
    """Pin the measured state (reference update_initialization!,
    computation_mpc.jl:17-29 — the only thing that changes between solves)."""
    return controller.replace(initialization=jnp.asarray(x0, jnp.float32))


def calculate(controller: MpcController) -> MpcController:
    """Solve at the pinned state; store results + warm state on the
    controller (reference calculate!, computation_mpc.jl:38-55)."""
    sol, wz, wy = solve_once(
        controller, controller.initialization, controller.warm_z, controller.warm_y
    )
    return controller.replace(results=sol, warm_z=wz, warm_y=wy)


def step(
    controller: MpcController, x0: Array
) -> Tuple[MpcController, MpcSolution]:
    """update_initialization + calculate, fused; jit this."""
    c = update_initialization(controller, x0)
    sol, wz, wy = solve_once(c, c.initialization, c.warm_z, c.warm_y)
    return c.replace(results=sol, warm_z=wz, warm_y=wy), sol


def update_references(
    controller: MpcController, x_ref: Array, u_ref: Array
) -> MpcController:
    """Re-tune the controller for new references: rebuilds reference
    trajectories, terminal ingredient (fresh DARE at the new endpoint) and
    the QP/ADMM operators. Working semantics for the reference's
    exported-but-undefined update! (computation_mpc.jl:159-284).

    Engine-specific state is preserved: ADMM/SQP/EMPC configs, soft state
    penalties, and — for economic controllers — the stage/terminal cost
    functions all carry over to the re-designed controller. Weight matrices
    pass through verbatim (scalar*I or not)."""
    import numpy as np

    from .design import design_controller

    t = controller.tuning
    eng = controller.engine
    kwargs = {}
    if isinstance(eng, LinearEngine):
        kwargs["engine"] = "condensed"
        kwargs["admm_config"] = eng.config
        if eng.soft_mu is not None:
            mu = np.asarray(eng.soft_mu)
            finite = mu[np.isfinite(mu)]
            if finite.size:
                kwargs["soft_state_penalty"] = float(finite.min())
    elif isinstance(eng, RiccatiEngine):
        kwargs["engine"] = "riccati"
        kwargs["riccati_config"] = eng.config
    else:
        from .solvers.empc import EmpcEngine
        from .solvers.sqp import SqpEngine

        if isinstance(eng, SqpEngine):
            kwargs["sqp_config"] = eng.config
            if eng.soft_boxes:
                # keep the user-soft box semantics (and honest-status gate)
                # across the re-design round trip
                kwargs["soft_state_penalty"] = eng.config.soft_state_penalty
        elif isinstance(eng, EmpcEngine):
            kwargs["economic_cost"] = eng.cost_fn
            kwargs["economic_terminal_cost"] = eng.terminal_cost_fn
            kwargs["empc_config"] = eng.config
        # MilpEngine rebuilds deterministically from (system, tuning)

    new = design_controller(
        controller.system,
        t.horizon,
        t.sample_time,
        x_ref,
        u_ref,
        programming_type=t.programming_type,
        solver=t.solver_name,
        terminal_ingredient=t.terminal.kind,
        Q=t.weights.Q,
        R=t.weights.R,
        S=t.weights.S,
        max_time=t.max_time,
        state_constraint=t.state_constraint,
        **kwargs,
    )
    return new.replace(
        initialization=controller.initialization,
        warm_z=controller.warm_z,
        warm_y=controller.warm_y,
    )


def update_and_compute(
    controller: MpcController, x0: Array, x_ref=None, u_ref=None
) -> Tuple[MpcController, MpcSolution]:
    """Refresh references (optional), pin x0 and solve — working semantics
    for the reference's exported-but-undefined update_and_compute!
    (AutomationLabsModelPredictiveControl.jl:28-30, computation_mpc.jl:58-157,
    Chen & Allgöwer quasi-infinite-horizon refresh)."""
    if x_ref is not None or u_ref is not None:
        t = controller.tuning
        xr = t.references.x[:, 0] if x_ref is None else x_ref
        ur = t.references.u[:, 0] if u_ref is None else u_ref
        controller = update_references(controller, xr, ur)
    return step(controller, x0)
