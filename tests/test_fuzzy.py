"""Takagi-Sugeno fuzzy MPC (fuzzy_linear programming type) — the
reference's orphaned tag / roadmap item, implemented for real."""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpEngine


def _ts_system():
    """Two local QTP linearizations (low / high levels) as a TS model."""
    lo = qtp.linearized_discrete_system(x_op=np.full(4, 0.4))
    hi = qtp.linearized_discrete_system(x_op=np.full(4, 0.9))
    return mpc.takagi_sugeno_system(
        As=jnp.stack([lo.A, hi.A]),
        Bs=jnp.stack([lo.B, hi.B]),
        centers=jnp.asarray([[0.4] * 4, [0.9] * 4]),
        widths=jnp.asarray([0.25, 0.25]),
        X=qtp.X_BOX,
        U=qtp.U_BOX,
    )


def test_ts_membership_blend():
    sys = _ts_system()
    x_lo = jnp.full(4, 0.4)
    x_hi = jnp.full(4, 0.9)
    u = jnp.asarray([1.2, 1.2])
    lo = qtp.linearized_discrete_system(x_op=np.full(4, 0.4))
    hi = qtp.linearized_discrete_system(x_op=np.full(4, 0.9))
    # near a center, the blend reproduces that local model
    np.testing.assert_allclose(
        np.asarray(sys.step(x_lo, u)), np.asarray(lo.A @ x_lo + lo.B @ u), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sys.step(x_hi, u)), np.asarray(hi.A @ x_hi + hi.B @ u), atol=1e-3
    )


def test_fuzzy_programming_type_designs_and_solves():
    sys = _ts_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2),
        mpc_programming_type="fuzzy_linear",
    )
    assert c.tuning.programming_type == "fuzzy_linear"
    assert c.tuning.solver_name == "ipopt"
    assert isinstance(c.engine, SqpEngine)
    c, sol = mpc.step(c, jnp.full(4, 0.6))
    assert int(sol.status) in (0, 1)
    assert bool(jnp.all(jnp.isfinite(sol.u)))


def test_fuzzy_closed_loop_tracks():
    sys = _ts_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 8, 5.0, np.full(4, 0.65), np.full(2, 1.2),
        mpc_programming_type="fuzzy_linear",
    )
    x = jnp.asarray([0.5, 0.5, 0.7, 0.7])
    step = jax.jit(mpc.step)
    err0 = float(jnp.max(jnp.abs(x - 0.65)))
    for _ in range(8):
        c, sol = step(c, x)
        x = qtp.qtp_discrete_step(x, sol.u[:, 0])
    assert float(jnp.max(jnp.abs(x - 0.65))) < err0
