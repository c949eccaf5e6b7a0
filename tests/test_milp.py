"""Mixed-integer (exact-ReLU) path: transcription, branch-and-bound, design
routing — the analogue of the reference's MILP modeler tests
(modeler_implementation_test.jl MILP testsets, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import native_qp
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.milp import (
    MILP_FAMILIES,
    MilpEngine,
    _eval_transcription,
    _transcribe_step,
)

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)


def _neural_system(family, hidden=3, depth=1, seed=1):
    apply_fn, params = mpc.init_model(
        family, jax.random.PRNGKey(seed), 4, 2,
        hidden=hidden, depth=depth, sample_time=5.0,
    )
    return mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


@pytest.mark.parametrize("family", MILP_FAMILIES)
def test_transcription_matches_apply_fn(family):
    # the affine/ReLU trace must reproduce the model family exactly
    sys = _neural_system(family, hidden=4, depth=2)
    tr, out = _transcribe_step(family, sys.params, 4, 2)
    rng = np.random.default_rng(3)
    for _ in range(8):
        x = rng.standard_normal(4)
        u = rng.standard_normal(2)
        want = np.asarray(
            sys.apply_fn(sys.params, x.astype(np.float32), u.astype(np.float32))
        )
        got = _eval_transcription(tr, out, x, u)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_milp_design_routing():
    sys = _neural_system("fnn")
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    assert isinstance(c.engine, MilpEngine)
    assert c.tuning.solver_name == "scip"  # name parity: MILP -> SCIP only
    assert c.engine.n_binary > 0


def test_milp_rejects_linear_system():
    sys = qtp.linearized_discrete_system()
    with pytest.raises(ValueError):
        mpc.proceed_controller(
            sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
            mpc_programming_type="mixed_linear",
        )


def test_milp_rejects_non_relu_family():
    # rbf has no MILP modeler in the reference either (SURVEY.md §2.3)
    sys = _neural_system("rbf")
    with pytest.raises(ValueError):
        mpc.proceed_controller(
            sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
            mpc_programming_type="mixed_linear",
        )


def test_milp_solve_exact_dynamics_and_feasible():
    sys = _neural_system("fnn")
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    c2, sol = mpc.step(c, np.full(4, 0.6, np.float32))
    assert int(sol.status) == 0  # converged = global optimum
    x = np.asarray(sol.x, np.float64)
    u = np.asarray(sol.u, np.float64)
    # trajectory satisfies the TRUE network dynamics (the reference's
    # cross-method consistency idea, computation_mpc_test.jl:152-169,
    # but exact instead of atol=0.5)
    for k in range(2):
        want = np.asarray(
            sys.apply_fn(sys.params, x[:, k].astype(np.float32), u[:, k].astype(np.float32))
        )
        np.testing.assert_allclose(x[:, k + 1], want, atol=1e-5)
    # input box always enforced (linear/...:72-78)
    assert np.all(u.T <= np.asarray(qtp.U_BOX.hi) + 1e-7)
    assert np.all(u.T >= np.asarray(qtp.U_BOX.lo) - 1e-7)


def test_milp_global_at_least_as_good_as_sqp():
    # branch-and-bound is global; the SQP local optimum upper-bounds it
    sys = _neural_system("fnn")
    x0 = np.full(4, 0.6, np.float32)
    c_bb = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    _, sol_bb = mpc.step(c_bb, x0)
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
    )
    _, sol_nl = mpc.step(c_nl, x0)
    assert int(sol_bb.status) == 0
    assert float(sol_bb.objective) <= float(sol_nl.objective) * (1 + 1e-4) + 1e-3


def test_milp_infeasible_detection():
    # a random untrained net cannot keep the QTP states inside their box:
    # the solver must SAY infeasible (the reference never even checks
    # termination status, computation_mpc.jl:38-55)
    sys = _neural_system("fnn")
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
        mpc_state_constraint=True,
    )
    _, sol = mpc.step(c, np.full(4, 0.6, np.float32))
    from automationlabsmodelpredictivecontrol_jl_tpu.types import (
        STATUS_PRIMAL_INFEASIBLE,
    )
    assert int(sol.status) == STATUS_PRIMAL_INFEASIBLE


def test_generic_miqp_branch_and_bound():
    # the generic binary-MIQP front-end of the native oracle
    P = 2 * np.eye(2)
    q = np.array([-1.2, -0.6])
    A = np.eye(2)
    l = np.zeros(2)
    u = np.ones(2)
    z, y, st, nodes, obj = native_qp.solve_miqp(
        P, q, A, l, u, np.array([0, 1]), np.array([0, 1])
    )
    assert st == native_qp.MIQP_OPTIMAL
    np.testing.assert_allclose(z, [1.0, 0.0], atol=1e-6)


def test_relu_bb_s_weight_and_terminal_equality():
    # Δu cost + terminal equality flow through the condensed assembly
    sys = _neural_system("densenet")
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 2, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear", mpc_S=0.05,
    )
    _, sol = mpc.step(c, np.full(4, 0.6, np.float32))
    assert int(sol.status) in (0, 1, 2)  # well-formed statuses only


def test_time_limit_budget_returns_incumbent():
    """mpc_max_time is a real wall-clock budget for the B&B (the reference
    stored it but never forwarded it, solver_selection.jl:95): with a tiny
    budget the solve must return promptly with a max-iter-style status, not
    hang or throw."""
    import time

    sys = _neural_system("densenet", hidden=6, depth=2, seed=7)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 4, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
        mpc_max_time=1e-9,
    )
    t0 = time.monotonic()
    c, sol = mpc.step(c, np.full(4, 0.6, np.float32))
    elapsed = time.monotonic() - t0
    assert elapsed < 20.0
    # budget exhausted after the root node: either it still proved
    # optimality instantly (0) or it reports the node/time-limit status (1)
    assert int(sol.status) in (0, 1)


def test_milp_batch_matches_single_lanes():
    """The fleet entry (solve_milp_batch via parallel.solve_batch) must
    return exactly the per-lane solve_milp solutions, batched — the
    exact-ReLU global optimum does not depend on which lane computed it."""
    import jax.numpy as jnp

    from automationlabsmodelpredictivecontrol_jl_tpu import parallel
    from automationlabsmodelpredictivecontrol_jl_tpu.runtime import solve_once

    sys = _neural_system("fnn", hidden=3, depth=1, seed=2)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 3, 5.0, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(
        np.clip(0.65 + 0.05 * rng.standard_normal((4, 4)), 0.3, 1.3),
        jnp.float32,
    )
    sol_b, wz, wy, diag = parallel.solve_batch(c, x0s)
    assert int(diag.n_total) == 4
    assert sol_b.u.shape == (4, 2, 3)
    for k in range(4):
        sol_1, _, _ = solve_once(c, x0s[k], c.warm_z, c.warm_y)
        np.testing.assert_allclose(
            np.asarray(sol_b.u[k]), np.asarray(sol_1.u), atol=1e-6
        )
        assert int(sol_b.status[k]) == int(sol_1.status)
