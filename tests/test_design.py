"""Design pipeline per family × programming type (the analogue of the
reference's design_mpc_implementation_test.jl, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.design import LinearEngine
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpEngine

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)
N = 15  # the reference's canonical design horizon


def _neural_system(family):
    apply_fn, params = mpc.init_model(
        family, jax.random.PRNGKey(0), 4, 2, hidden=8, depth=1, sample_time=5.0
    )
    return mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


def test_linear_design_controller_struct():
    # analogue of the reference's per-field tuning asserts
    # (design_mpc_implementation_test.jl:82-115)
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", N, 5.0, X_REF, U_REF)
    t = c.tuning
    assert t.horizon == N
    assert t.sample_time == 5.0
    assert t.max_time == 30.0  # stored default, like the reference
    assert t.programming_type == "linear"
    assert t.solver_name == "scip"  # parity quirk: auto-linear -> SCIP
    assert t.terminal.kind == "none"
    assert float(jnp.max(jnp.abs(t.terminal.P))) > 0  # P from DARE, != 0
    assert t.references.x.shape == (4, N + 1)
    assert t.references.u.shape == (2, N)
    np.testing.assert_allclose(np.asarray(t.weights.Q), 100.0 * np.eye(4))
    np.testing.assert_allclose(np.asarray(t.weights.R), 0.1 * np.eye(2))
    assert isinstance(c.engine, LinearEngine)
    assert c.engine.qp.P.shape == (N * 2, N * 2)


@pytest.mark.parametrize("family", ["fnn", "resnet", "densenet", "icnn"])
def test_neural_nonlinear_design(family):
    sys = _neural_system(family)
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF, U_REF)
    assert c.tuning.programming_type == "non_linear"
    assert c.tuning.solver_name == "ipopt"  # auto non_linear -> Ipopt name
    assert isinstance(c.engine, SqpEngine)


@pytest.mark.parametrize("family", ["fnn", "rbf", "polynet", "rknn2"])
def test_neural_linear_design_delegates(family):
    # "linear" programming on a learned family: linearize at first reference
    # point then delegate to the linear modeler (fnn/...:38-46)
    sys = _neural_system(family)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_programming_type="linear",
    )
    assert c.tuning.programming_type == "linear"
    assert isinstance(c.engine, LinearEngine)
    A, B = mpc.linearize(sys, jnp.asarray(X_REF, jnp.float32),
                         jnp.asarray(U_REF, jnp.float32))
    # engine QP was condensed from exactly this linearization
    F1 = np.asarray(c.engine.qp.F[0])
    np.testing.assert_allclose(F1, np.asarray(A), atol=1e-5)


def test_continuous_system_discretized_first():
    # parity: continuous path discretizes then recurses (design_mpc.jl:22-41)
    rng = np.random.default_rng(0)
    Ac = jnp.asarray(rng.normal(size=(3, 3)) * 0.3 - 0.5 * np.eye(3), jnp.float32)
    Bc = jnp.asarray(rng.normal(size=(3, 2)), jnp.float32)
    box3 = mpc.Box(lo=-np.ones(3), hi=np.ones(3))
    box2 = mpc.Box(lo=-np.ones(2), hi=np.ones(2))
    sys_c = mpc.LinearContinuousSystem(A=Ac, B=Bc, X=box3, U=box2)
    c = mpc.proceed_controller(
        sys_c, "model_predictive_control", 5, 0.5, np.zeros(3), np.zeros(2)
    )
    d = mpc.discretize(sys_c, 0.5)
    assert isinstance(c.system, mpc.LinearDiscreteSystem)
    np.testing.assert_allclose(np.asarray(c.system.A), np.asarray(d.A), atol=1e-6)


def test_weights_s_nonzero_changes_qp():
    sys = qtp.linearized_discrete_system()
    c0 = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF,
                                U_REF, mpc_S=0.0)
    c1 = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF,
                                U_REF, mpc_S=1.0)
    assert float(jnp.max(jnp.abs(c1.engine.qp.P - c0.engine.qp.P))) > 1e-6


def test_nonlinear_on_linear_system_degenerates_to_qp():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_programming_type="non_linear",
    )
    assert isinstance(c.engine, LinearEngine)
    assert c.tuning.programming_type == "linear"
