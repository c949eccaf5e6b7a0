"""Runtime layer: receding-horizon semantics + cross-method consistency
(the analogue of the reference's computation_mpc_test.jl, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)
X0 = jnp.asarray([0.6, 0.6, 0.6, 0.6])  # the reference's canonical x0


def test_update_initialization_pins_state():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF, U_REF)
    c = mpc.update_initialization(c, X0)
    np.testing.assert_allclose(np.asarray(c.initialization), np.asarray(X0))
    c = mpc.calculate(c)
    # solution starts exactly at the pinned state (JuMP.fix parity,
    # computation_mpc.jl:25-27)
    np.testing.assert_allclose(np.asarray(c.results.x[:, 0]), np.asarray(X0),
                               atol=1e-6)
    assert int(c.results.status) == 0


def test_linear_solution_tracks_reference():
    # parity tolerance: x approaches x_ref atol 0.5, u[:,1] atol 3
    # (computation_mpc_test.jl:970-971)
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0, X_REF, U_REF)
    c, sol = mpc.step(c, X0)
    assert np.abs(np.asarray(sol.x) - 0.65).max() < 0.5
    assert np.abs(np.asarray(sol.u[:, 0]) - 1.2).max() < 3.0
    # predicted trajectory is dynamically consistent with the model
    xs = np.asarray(sol.x)
    us = np.asarray(sol.u)
    A = np.asarray(sys.A)
    B = np.asarray(sys.B)
    xr = np.asarray(c.tuning.references.x)
    ur = np.asarray(c.tuning.references.u)
    for k in range(5):
        ex_next = A @ (xs[:, k] - xr[:, k]) + B @ (us[:, k] - ur[:, k])
        np.testing.assert_allclose(xs[:, k + 1] - xr[:, k + 1], ex_next, atol=1e-4)


def test_linear_vs_sqp_cross_method_sharp():
    """linear MPC and SQP on the SAME linear dynamics, with the reference an
    equilibrium of the model -> identical convex problem, tight agreement."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(0.9 * np.eye(4) + 0.05 * rng.standard_normal((4, 4)),
                    jnp.float32)
    B = jnp.asarray(rng.standard_normal((4, 2)) * 0.5, jnp.float32)
    X = mpc.Box(lo=-2 * np.ones(4), hi=2 * np.ones(4))
    U = mpc.Box(lo=-np.ones(2), hi=np.ones(2))
    lin = mpc.LinearDiscreteSystem(A=A, B=B, X=X, U=U)

    def apply_fn(params, x, u):
        return params["A"] @ x + params["B"] @ u

    neural = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="physical", nx=4, nu=2,
        params={"A": A, "B": B}, X=X, U=U,
    )
    zx, zu = np.zeros(4), np.zeros(2)  # 0 is an equilibrium: x+ = Ax + Bu
    x_start = jnp.asarray([0.4, -0.3, 0.2, 0.1])
    c_lin = mpc.proceed_controller(lin, "model_predictive_control", 5, 1.0, zx, zu)
    c_sqp = mpc.proceed_controller(neural, "model_predictive_control", 5, 1.0, zx, zu)
    c_lin, sol_lin = mpc.step(c_lin, x_start)
    c_sqp, sol_sqp = mpc.step(c_sqp, x_start)
    assert int(sol_lin.status) == 0
    np.testing.assert_allclose(np.asarray(sol_sqp.u), np.asarray(sol_lin.u),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(sol_sqp.x), np.asarray(sol_lin.x),
                               atol=5e-3)


def test_linear_vs_sqp_cross_method_qtp_parity_tolerance():
    """On QTP with a non-equilibrium reference the two formulations differ by
    design — linear MPC uses deviation dynamics, SQP raw rollout (reference
    quirk, SURVEY appendix; its own cross-method tolerance is atol=0.5,
    computation_mpc_test.jl:152-169)."""
    lin = qtp.linearized_discrete_system()

    def apply_fn(params, x, u):
        return params["A"] @ x + params["B"] @ u

    neural = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="physical", nx=4, nu=2,
        params={"A": lin.A, "B": lin.B}, X=lin.X, U=lin.U,
    )
    c_lin = mpc.proceed_controller(lin, "model_predictive_control", 5, 5.0,
                                   X_REF, U_REF)
    c_sqp = mpc.proceed_controller(neural, "model_predictive_control", 5, 5.0,
                                   X_REF, U_REF)
    c_lin, sol_lin = mpc.step(c_lin, X0)
    c_sqp, sol_sqp = mpc.step(c_sqp, X0)
    np.testing.assert_allclose(np.asarray(sol_sqp.u), np.asarray(sol_lin.u),
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(sol_sqp.x), np.asarray(sol_lin.x),
                               atol=0.5)


def test_warm_start_carry_through_step():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 10, 5.0,
                               X_REF, U_REF)
    c, sol1 = mpc.step(c, X0)
    it_cold = int(sol1.iterations)
    x_next = qtp.qtp_discrete_step(X0, sol1.u[:, 0])
    c, sol2 = mpc.step(c, x_next)
    assert int(sol2.iterations) <= it_cold


def test_update_references_redesigns():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0,
                               X_REF, U_REF)
    P_old = np.asarray(c.tuning.terminal.P)
    c2 = mpc.update_references(c, np.full(4, 0.8), np.full(2, 1.5))
    np.testing.assert_allclose(np.asarray(c2.tuning.references.x), 0.8)
    # same linear system -> same DARE P; references moved
    np.testing.assert_allclose(np.asarray(c2.tuning.terminal.P), P_old, atol=1e-3)
    c2, sol = mpc.step(c2, jnp.full(4, 0.75))
    assert int(sol.status) == 0


def test_update_references_preserves_engine_state():
    """ADVICE r01: update_references must not silently drop engine configs,
    soft penalties, or — worst — the economic stage cost."""
    from automationlabsmodelpredictivecontrol_jl_tpu.solvers.empc import EmpcEngine

    sys = qtp.linearized_discrete_system()
    # custom ADMM config + soft state constraint on the linear engine
    cfg = mpc.AdmmConfig(max_iter=333, rho=0.5, rho_grid=(0.5, 5.0))
    c = mpc.design_controller(
        sys, 5, 5.0, np.asarray(X_REF), np.asarray(U_REF),
        admm_config=cfg, state_constraint=True, soft_state_penalty=77.0,
    )
    c2 = mpc.update_references(c, np.full(4, 0.8), np.full(2, 1.5))
    assert c2.engine.config == cfg
    mu = np.asarray(c2.engine.soft_mu)
    assert float(mu[np.isfinite(mu)].min()) == 77.0

    # economic controller keeps its stage cost + engine type
    stage = lambda x, u: jnp.sum(u**2) + 0.1 * jnp.sum(x**2)
    ce = mpc.design_controller(
        sys, 5, 5.0, np.asarray(X_REF), np.asarray(U_REF),
        economic_cost=stage,
        empc_config=mpc.EmpcConfig(max_sqp_iter=9),
    )
    ce2 = mpc.update_references(ce, np.full(4, 0.7), np.full(2, 1.3))
    assert isinstance(ce2.engine, EmpcEngine)
    assert ce2.engine.cost_fn is stage
    assert ce2.engine.config.max_sqp_iter == 9

    # non-scalar weights pass through verbatim
    Qm = np.diag([100.0, 50.0, 100.0, 50.0]).astype(np.float32)
    cm = mpc.design_controller(
        sys, 5, 5.0, np.full(4, 0.65), np.full(2, 1.2), Q=Qm
    )
    cm2 = mpc.update_references(cm, np.full(4, 0.8), np.full(2, 1.5))
    np.testing.assert_allclose(np.asarray(cm2.tuning.weights.Q), Qm)


def test_step_is_jittable():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(sys, "model_predictive_control", 5, 5.0,
                               X_REF, U_REF)
    step = jax.jit(mpc.step)
    c, sol = step(c, X0)
    assert int(sol.status) == 0
