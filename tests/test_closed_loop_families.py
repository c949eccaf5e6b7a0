"""Per-family trained-fixture closed-loop validation (VERDICT r1 item 4).

Reproduces the reference solve-suite semantics on *trained* QTP models —
the reference tests every family end-to-end on serialized trained fixtures
with closed-loop tracking and cross-method consistency assertions
(/root/reference/test/computation_mpc_test.jl:152-169, 970-1054; fixtures
at modeler_implementation_test.jl:30). The binary fixtures are stripped
from the mirror, so benchmarks/training.py regenerates them: excite the
true QTP plant, fit each zoo family on one-step transitions, then drive
the TRUE nonlinear plant with an MPC designed on the LEARNED model.

Reference tolerances: closed-loop x ≈ x_ref atol 0.5, first input atol
0.1-3 (computation_mpc_test.jl:970-971, 1053-1054); this suite also holds
a tighter 0.25 end-point bound — trained one-step models on the slow QTP
should do much better than the reference's loose gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import parallel
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp, training

X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)
X0 = jnp.asarray([[0.6, 0.6, 0.6, 0.6]], jnp.float32)

LEARNED_FAMILIES = (
    "fnn", "icnn", "resnet", "densenet", "rbf",
    "polynet", "neuralode", "rknn1", "rknn2", "rknn4",
)


@pytest.fixture(scope="module")
def dataset():
    return training.generate_qtp_dataset(n_traj=48, n_steps=30, seed=0)


# rbf underfits near the setpoint with 8 random centers on the 6-d
# (x, u) input — give it more centers and training to hit the tracking gate
FIT_OVERRIDES = {"rbf": {"hidden": 12, "steps": 800}}


@pytest.fixture(scope="module")
def trained(dataset):
    """Train each family once per test session (the .jls fixture analogue)."""
    cache = {}

    def get(family):
        if family not in cache:
            kw = {"steps": 400, **FIT_OVERRIDES.get(family, {})}
            cache[family] = training.trained_system(family, dataset, **kw)
        return cache[family]

    return get


def _closed_loop(controller, n_steps=25):
    xs, us, statuses = parallel.closed_loop_batch(
        controller, qtp.qtp_discrete_step, X0, n_steps
    )
    return np.asarray(xs[:, 0]), np.asarray(us[:, 0]), np.asarray(statuses[:, 0])


@pytest.mark.parametrize("family", LEARNED_FAMILIES)
def test_closed_loop_tracking(trained, family):
    """MPC on the learned model drives the true plant to the setpoint
    (reference closed-loop gate, computation_mpc_test.jl:970-1054)."""
    sys, rmse = trained(family)
    assert rmse < 0.05, f"{family} fixture under-trained (rmse {rmse:.4f})"
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF
    )
    xs, us, statuses = _closed_loop(c)
    # no infeasible / numeric-error statuses anywhere in the run
    assert statuses.max() <= 1
    # reference tolerance + a tighter end-point bound
    assert np.abs(xs[-1] - 0.65).max() < 0.5
    assert np.abs(xs[-1] - 0.65).max() < 0.25
    # inputs honored the box throughout
    assert us.min() >= -1e-5
    assert (us <= np.asarray([4.0, 3.26]) + 1e-5).all()


@pytest.mark.parametrize("family", ("fnn", "resnet"))
def test_closed_loop_tracking_h15(trained, family):
    """Reference design horizon (design tests use N=15,
    design_mpc_implementation_test.jl:60)."""
    sys, _ = trained(family)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 15, qtp.SAMPLE_TIME, X_REF, U_REF
    )
    xs, _, statuses = _closed_loop(c, n_steps=15)
    assert statuses.max() <= 1
    assert np.abs(xs[-1] - 0.65).max() < 0.25


def test_linear_regressor_closed_loop():
    """The linear fixture path (the reference's linear_regressor .jls):
    condensed-QP ADMM engine on the linearized plant, true-plant loop."""
    sys = qtp.linearized_discrete_system()
    for N in (5, 15):
        c = mpc.proceed_controller(
            sys, "model_predictive_control", N, qtp.SAMPLE_TIME, X_REF, U_REF
        )
        xs, _, statuses = _closed_loop(c, n_steps=15)
        assert statuses.max() == 0  # linear engine converges every step
        assert np.abs(xs[-1] - 0.65).max() < 0.1


def test_cross_method_linear_vs_nonlinear(trained):
    """linear (linearize->condensed QP) vs non_linear (SQP) programming on
    the same trained fnn agree in closed loop (reference cross-method
    consistency atol 0.5, computation_mpc_test.jl:152-169)."""
    sys, _ = trained("fnn")
    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="linear",
    )
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="non_linear",
    )
    xs_l, us_l, _ = _closed_loop(c_lin, n_steps=12)
    xs_n, us_n, _ = _closed_loop(c_nl, n_steps=12)
    np.testing.assert_allclose(xs_l, xs_n, atol=0.5)
    # first-input agreement at the start of the run (reference atol 0.1-3)
    np.testing.assert_allclose(us_l[0], us_n[0], atol=1.0)


def test_cross_method_milp_vs_nonlinear(trained):
    """mixed_linear (exact-ReLU branch & bound) vs non_linear (SQP) on the
    trained relu fnn: first input consistent at the canonical solve state
    x0 = 0.6 (computation_mpc_test.jl first-input tolerance)."""
    sys, _ = trained("fnn")
    c_bb = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="non_linear",
    )
    x0 = X0[0]
    sol_bb, _, _ = mpc.solve_once(c_bb, x0, c_bb.warm_z, c_bb.warm_y)
    sol_nl, _, _ = mpc.solve_once(c_nl, x0, c_nl.warm_z, c_nl.warm_y)
    assert int(sol_bb.status) == 0
    np.testing.assert_allclose(
        np.asarray(sol_bb.u[:, 0]), np.asarray(sol_nl.u[:, 0]), atol=1.0
    )
    # the exact-ReLU global solve can only match or beat the local SQP cost
    assert float(sol_bb.objective) <= float(sol_nl.objective) + 1e-3


@pytest.mark.parametrize("family", LEARNED_FAMILIES)
def test_cross_method_trajectory_consistency(trained, family):
    """Full predicted-TRAJECTORY agreement between the linear
    (linearize -> condensed QP) and nonlinear (SQP) programming types, per
    family — the reference's cross-method gate compares whole trajectories
    at atol 0.5, not just first inputs (computation_mpc_test.jl:152-169)."""
    sys, _ = trained(family)
    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="linear",
    )
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", 5, qtp.SAMPLE_TIME, X_REF, U_REF,
        mpc_programming_type="non_linear",
    )
    x0 = X0[0]
    sol_l, _, _ = mpc.solve_once(c_lin, x0, c_lin.warm_z, c_lin.warm_y)
    sol_n, _, _ = mpc.solve_once(c_nl, x0, c_nl.warm_z, c_nl.warm_y)
    np.testing.assert_allclose(
        np.asarray(sol_l.x), np.asarray(sol_n.x), atol=0.5
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.u), np.asarray(sol_n.u), atol=3.0
    )
    # first-input tolerance: the reference's own gate spans 0.1-3 by family
    # (computation_mpc_test.jl:970-971); the rbf linearization at the
    # reference point sits on a local bump and lands at the loose end
    u0_atol = 3.0 if family == "rbf" else 1.0
    np.testing.assert_allclose(
        np.asarray(sol_l.u[:, 0]), np.asarray(sol_n.u[:, 0]), atol=u0_atol
    )
