"""Soft (slack-penalized) state constraints — BASELINE config 4 surface.

The linear path implements them as an L1 shrinkage in the ADMM projection
(no slack variables); the SQP path as merit-function penalties."""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)


def test_soft_state_constraints_feasible_from_outside_box():
    """From x0 outside the state box: hard constraints -> infeasible flag;
    soft constraints -> a solution that steers back into the box."""
    sys = qtp.linearized_discrete_system()
    x0 = jnp.asarray([1.5, 1.5, 1.4, 1.4])  # above the box ceiling

    hard = mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0, X_REF, U_REF,
        mpc_state_constraint=True,
    )
    hard, sol_h = mpc.step(hard, x0)
    assert int(sol_h.status) == mpc.STATUS_PRIMAL_INFEASIBLE

    # penalty-scale (1e3) magnitudes raise the f32 residual floor to ~1e-5,
    # so ask for a matching tolerance (OSQP's own default is 1e-3)
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    soft = mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0, X_REF, U_REF,
        mpc_soft_state_constraint=1e3,
        admm_config=AdmmConfig(max_iter=2000, eps_abs=1e-4, eps_rel=1e-4),
    )
    soft, sol_s = mpc.step(soft, x0)
    assert int(sol_s.status) == mpc.STATUS_CONVERGED
    # trajectory re-enters the box by the end of the horizon
    x_end = np.asarray(sol_s.x[:, -1])
    assert (x_end <= np.asarray(qtp.X_BOX.hi) + 0.05).all()


def test_soft_matches_hard_when_inactive():
    """When state constraints are not active, soft and hard solutions agree."""
    sys = qtp.linearized_discrete_system()
    x0 = jnp.asarray([0.64, 0.65, 0.66, 0.65])
    hard = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_state_constraint=True,
    )
    soft = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_soft_state_constraint=1e4,
    )
    hard, sol_h = mpc.step(hard, x0)
    soft, sol_s = mpc.step(soft, x0)
    assert int(sol_h.status) == 0 and int(sol_s.status) == 0
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_h.u), atol=1e-3)


def test_soft_boxes_nonlinear_path():
    """mpc_soft_state_constraint reaches the SQP engine: the user's L1
    price replaces the quasi-hard 1e4 default, and the honest-status gate
    stops counting box violation as a feasibility failure (it is a priced
    objective term). From x0 above the box ceiling the early states
    violate the box no matter what the inputs do: the hard-box default
    must refuse STATUS_CONVERGED, the user-soft controller must report it
    (with the violation still priced by the merit)."""
    A, B = qtp.linearized_discrete_system().A, qtp.linearized_discrete_system().B
    sys_nl = mpc.user_function_system(
        lambda x, u: A @ x + B @ u, 4, 2, qtp.X_BOX, qtp.U_BOX
    )
    x0 = jnp.asarray([1.5, 1.5, 1.4, 1.4], jnp.float32)

    hard = mpc.proceed_controller(
        sys_nl, "model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_state_constraint=True,
    )
    assert not hard.engine.soft_boxes
    hard, sol_h = mpc.step(hard, x0)
    assert int(sol_h.status) != mpc.STATUS_CONVERGED
    assert float(sol_h.primal_residual) > hard.engine.config.feas_tol

    soft = mpc.proceed_controller(
        sys_nl, "model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_soft_state_constraint=5.0,
    )
    assert soft.engine.soft_boxes
    assert soft.engine.config.soft_state_penalty == 5.0  # not the 1e4 default
    soft, sol_s = mpc.step(soft, x0)
    assert int(sol_s.status) == mpc.STATUS_CONVERGED
    # soft semantics survive the re-design and checkpoint round trips
    soft2 = mpc.update_references(soft, np.full(4, 0.7), np.full(2, 1.25))
    assert soft2.engine.soft_boxes
    assert soft2.engine.config == soft.engine.config


def test_soft_boxes_multiple_shooting():
    """Soft boxes are uniform across transcriptions: under
    shooting="multiple" the consensus state prox becomes the L1 shrinkage
    (ops/riccati_ltv.py soft_mu) instead of a hard clip, and the honest
    gate accepts the priced violation — same contract as single shooting
    and the linear path."""
    from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpConfig

    A, B = qtp.linearized_discrete_system().A, qtp.linearized_discrete_system().B
    sys_nl = mpc.user_function_system(
        lambda x, u: A @ x + B @ u, 4, 2, qtp.X_BOX, qtp.U_BOX
    )
    x0 = jnp.asarray([1.5, 1.5, 1.4, 1.4], jnp.float32)

    hard = mpc.proceed_controller(
        sys_nl, "model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_state_constraint=True, sqp_config=SqpConfig(shooting="multiple"),
    )
    hard, sol_h = mpc.step(hard, x0)
    assert int(sol_h.status) != mpc.STATUS_CONVERGED

    soft = mpc.proceed_controller(
        sys_nl, "model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_soft_state_constraint=5.0,
        sqp_config=SqpConfig(shooting="multiple"),
    )
    assert soft.engine.soft_boxes and soft.engine.shooting == "multiple"
    soft, sol_s = mpc.step(soft, x0)
    assert int(sol_s.status) == mpc.STATUS_CONVERGED
    # the planned trajectory still steers into the box by the horizon end
    x_end = np.asarray(sol_s.x[:, -1])
    assert (x_end <= np.asarray(qtp.X_BOX.hi) + 0.05).all()


def test_update_and_compute_semantics():
    """Repaired update_and_compute!: reference change + solve in one call."""
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF, U_REF)
    c2, sol = mpc.update_and_compute(c, jnp.full(4, 0.7), x_ref=np.full(4, 0.75),
                                     u_ref=np.full(2, 1.3))
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(c2.tuning.references.x), 0.75)
    # plain overload without reference change == step
    c3, sol3 = mpc.update_and_compute(c, jnp.full(4, 0.62))
    assert int(sol3.status) == 0
