"""Economic MPC: the controller branch the reference reserved but never
shipped (main_mpc.jl:54-83 commented out, removed in v0.1.4) — implemented
for real in solvers/empc.py. Checks the exact-Newton economic engine
against the tracking engines and verifies economic behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.empc import EmpcConfig, EmpcEngine

X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)
X0 = jnp.asarray([0.6, 0.6, 0.6, 0.6], jnp.float32)


def _tracking_cost(Q=100.0, R=0.1):
    xr = jnp.asarray(X_REF)
    ur = jnp.asarray(U_REF)

    def l(x, u):
        ex = x - xr
        eu = u - ur
        return Q * ex @ ex + R * eu @ eu

    return l


def test_requires_cost_function():
    sys = qtp.linearized_discrete_system()
    with pytest.raises(ValueError, match="mpc_cost_function"):
        mpc.proceed_controller(
            sys, "economic_model_predictive_control", 5, 5.0, X_REF, U_REF
        )


def test_cost_function_rejected_on_tracking_type():
    sys = qtp.linearized_discrete_system()
    with pytest.raises(ValueError, match="only accepted"):
        mpc.proceed_controller(
            sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
            mpc_cost_function=_tracking_cost(),
        )


def test_quadratic_economic_matches_tracking_linear():
    """With l(x,u) = the exact tracking stage cost and the same terminal P,
    the economic engine must land on the tracking-QP solution — *when the
    references are an equilibrium*. (The linear engine runs dynamics in
    deviation space, reference linear/...:58-60; for non-equilibrium
    references the two formulations legitimately differ — SURVEY appendix.)
    """
    sys = qtp.linearized_discrete_system()
    N = 10
    # equilibrium pair: x_eq = (I - A)^{-1} B u_eq
    u_eq = np.asarray(U_REF, np.float64)
    A = np.asarray(sys.A, np.float64)
    B = np.asarray(sys.B, np.float64)
    x_eq = np.linalg.solve(np.eye(4) - A, B @ u_eq).astype(np.float32)
    xr = jnp.asarray(x_eq)
    ur = jnp.asarray(u_eq, dtype=jnp.float32)

    def l(x, u):
        ex = x - xr
        eu = u - ur
        return 100.0 * ex @ ex + 0.1 * eu @ eu

    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, x_eq, u_eq,
    )
    c_eco = mpc.proceed_controller(
        sys, "economic_model_predictive_control", N, 5.0, x_eq, u_eq,
        mpc_cost_function=l,
        empc_config=EmpcConfig(max_sqp_iter=25, tol_du=1e-7),
    )
    assert isinstance(c_eco.engine, EmpcEngine)
    x0 = jnp.asarray(x_eq) - 0.05
    _, sol_lin = mpc.step(c_lin, x0)
    _, sol_eco = mpc.step(c_eco, x0)
    assert int(sol_lin.status) == 0
    assert int(sol_eco.status) in (0, 1)
    np.testing.assert_allclose(
        np.asarray(sol_eco.u), np.asarray(sol_lin.u), atol=5e-3
    )


def test_quadratic_economic_matches_tracking_at_nonequilibrium_ref():
    """Regression: a LinearDiscreteSystem produced by linearization is a
    *deviation* model (reference linear/...:58-60), so the EMPC rollout must
    restore the affine drift c = x_ref - A x_ref - B u_ref. Without it, the
    economic engine predicted a phantom drain toward the linear model's true
    origin-equilibrium and the closed loop walked away from the reference.
    With it, EMPC with the exact tracking stage cost matches the tracking
    QP at the canonical (non-equilibrium) QTP reference pair."""
    sys = qtp.linearized_discrete_system()
    N = 10
    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, X_REF, U_REF,
    )
    c_eco = mpc.proceed_controller(
        sys, "economic_model_predictive_control", N, 5.0, X_REF, U_REF,
        mpc_cost_function=_tracking_cost(),
        empc_config=EmpcConfig(max_sqp_iter=25, tol_du=1e-7),
    )
    _, sol_lin = mpc.step(c_lin, X0)
    _, sol_eco = mpc.step(c_eco, X0)
    assert int(sol_lin.status) == 0
    assert int(sol_eco.status) in (0, 1)
    np.testing.assert_allclose(
        np.asarray(sol_eco.u), np.asarray(sol_lin.u), atol=5e-3
    )
    # and the closed loop on the deviation plant contracts toward x_ref
    x = X0
    xr, ur = jnp.asarray(X_REF), jnp.asarray(U_REF)
    step = jax.jit(mpc.step)
    e0 = float(jnp.abs(x - xr).max())
    for _ in range(8):
        c_eco, sol = step(c_eco, x)
        x = xr + sys.A @ (x - xr) + sys.B @ (sol.u[:, 0] - ur)
    assert float(jnp.abs(x - xr).max()) < 0.6 * e0


def test_quadratic_economic_matches_sqp_neural():
    """Same-formulation parity: the SQP tracking engine also single-shoots
    the raw dynamics, so EMPC with the tracking stage cost must reproduce
    its solution on a learned model — no equilibrium caveat."""
    apply_fn, params = mpc.init_model(
        "fnn", jax.random.PRNGKey(2), 4, 2, hidden=6, depth=1, sample_time=5.0
    )
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )
    N = 6
    c_sqp = mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, X_REF, U_REF,
    )
    c_eco = mpc.proceed_controller(
        sys, "economic_model_predictive_control", N, 5.0, X_REF, U_REF,
        mpc_cost_function=_tracking_cost(),
        empc_config=EmpcConfig(max_sqp_iter=25, tol_du=1e-7),
    )
    _, sol_sqp = mpc.step(c_sqp, X0)
    _, sol_eco = mpc.step(c_eco, X0)
    np.testing.assert_allclose(
        np.asarray(sol_eco.u), np.asarray(sol_sqp.u), atol=1e-2
    )
    np.testing.assert_allclose(
        float(sol_eco.objective), float(sol_sqp.objective), rtol=1e-3, atol=1e-4
    )


def test_input_price_reduces_consumption():
    """A pump-energy price on top of mild tracking must spend less input
    than the pure tracking controller."""
    sys = qtp.linearized_discrete_system()
    xr = jnp.asarray(X_REF)
    price = 50.0

    def l_eco(x, u):
        ex = x - xr
        return 10.0 * ex @ ex + price * jnp.sum(u)

    c_track = mpc.proceed_controller(
        sys, "model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_Q=10.0, mpc_R=0.0,
    )
    c_eco = mpc.proceed_controller(
        sys, "economic_model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_cost_function=l_eco,
    )
    _, sol_t = mpc.step(c_track, X0)
    _, sol_e = mpc.step(c_eco, X0)
    assert float(jnp.sum(sol_e.u)) < float(jnp.sum(sol_t.u)) - 1e-3
    # inputs stay inside the box
    assert np.all(np.asarray(sol_e.u) >= np.asarray(sys.U.lo)[:, None] - 1e-5)
    assert np.all(np.asarray(sol_e.u) <= np.asarray(sys.U.hi)[:, None] + 1e-5)


def test_empc_neural_system_with_state_boxes():
    """Economic MPC over a learned model with hard state boxes and terminal
    equality — the full constraint surface on the NLP route."""
    apply_fn, params = mpc.init_model(
        "fnn", jax.random.PRNGKey(0), 4, 2, hidden=8, depth=1, sample_time=5.0
    )
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )
    c = mpc.proceed_controller(
        sys, "economic_model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_cost_function=_tracking_cost(Q=10.0, R=1.0),
        mpc_state_constraint=True,
    )
    c, sol = mpc.step(c, X0)
    assert int(sol.status) in (0, 1)
    assert np.all(np.isfinite(np.asarray(sol.u)))


def test_empc_custom_terminal_cost_and_jit_vmap():
    """Custom Vf + jit + vmap over a scenario batch (economic fleets batch
    like tracking ones: fixed iteration bounds, masked convergence)."""
    sys = qtp.linearized_discrete_system()
    xr = jnp.asarray(X_REF)

    def l(x, u):
        return 100.0 * (x - xr) @ (x - xr) + 0.1 * u @ u

    def vf(x):
        return 500.0 * (x - xr) @ (x - xr)

    c = mpc.proceed_controller(
        sys, "economic_model_predictive_control", 6, 5.0, X_REF, U_REF,
        mpc_cost_function=l, mpc_terminal_cost_function=vf,
        empc_config=EmpcConfig(max_sqp_iter=10),
    )
    rng = np.random.default_rng(0)
    B = 4
    x0s = jnp.asarray(0.6 + 0.02 * rng.standard_normal((B, 4)), jnp.float32)

    from automationlabsmodelpredictivecontrol_jl_tpu.runtime import solve_once

    wz = jnp.tile(c.warm_z[None], (B, 1))
    wy = jnp.tile(c.warm_y[None], (B, 1))
    solve = jax.jit(jax.vmap(lambda x, z, y: solve_once(c, x, z, y)))
    sols, _, _ = solve(x0s, wz, wy)
    assert sols.u.shape == (B, 2, 6)
    assert np.all(np.isfinite(np.asarray(sols.u)))
    assert np.all(np.isin(np.asarray(sols.status), (0, 1)))


def test_empc_warm_start_carry_closed_loop():
    """Receding-horizon loop with warm-start shift converges to a steady
    state that trades tracking against the economic term."""
    sys = qtp.linearized_discrete_system()
    xr = jnp.asarray(X_REF)

    def l(x, u):
        return 100.0 * (x - xr) @ (x - xr) + 1.0 * jnp.sum(u)

    c = mpc.proceed_controller(
        sys, "economic_model_predictive_control", 8, 5.0, X_REF, U_REF,
        mpc_cost_function=l,
    )
    x = X0
    step = jax.jit(mpc.step)
    for _ in range(6):
        c, sol = step(c, x)
        x = sys.step(x, sol.u[:, 0])
    assert np.all(np.abs(np.asarray(x) - 0.65) < 0.05)
