"""Honest SQP statuses: STATUS_CONVERGED must be gated on the MEASURED
constraint violation, and that violation must be surfaced as the primal
residual — never the hardcoded 0.0 the round-2 solver reported.

The scenario: an unreachable terminal-equality set (QTP-like learned
dynamics cannot drive e_N to 0 in 3 steps from a wide deviation). The line
search stalls (du -> 0 at a penalty-stationary point), so tol_du alone
would declare convergence; the feasibility gate must refuse it. This is
the status blindness the reference ships (computation_mpc.jl:38-55 never
checks termination_status) and this framework exists to fix.
"""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.types import (
    STATUS_CONVERGED,
)

TS = 5.0
X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)


def _fnn_system():
    apply_fn, params = mpc.init_model(
        "fnn", jax.random.PRNGKey(7), 4, 2, hidden=6, depth=1,
        sample_time=TS,
    )
    return mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


def test_stalled_violating_sqp_reports_nonconverged_nonzero_residual():
    sys = _fnn_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 3, TS, X_REF, U_REF,
        mpc_programming_type="non_linear",
        mpc_terminal_ingredient="equality",
    )
    # wide deviation: equality terminal unreachable in 3 steps
    c, sol = mpc.step(c, jnp.asarray([0.25, 0.25, 1.25, 1.25], jnp.float32))
    assert int(sol.status) != STATUS_CONVERGED
    assert float(sol.primal_residual) > 1e-3


def test_feasible_sqp_still_converges_with_small_residual():
    sys = _fnn_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, TS, X_REF, U_REF,
        mpc_programming_type="non_linear",
    )
    c, sol = mpc.step(c, jnp.asarray([0.6, 0.6, 0.6, 0.6], jnp.float32))
    assert int(sol.status) == STATUS_CONVERGED
    assert float(sol.primal_residual) <= 1e-4
