"""Native C++ QP reference solver (native/qpref) vs the JAX f32 engine and
scipy — the in-house replacement for the reference's OSQP native surface."""

import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import native_qp
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops import admm
from automationlabsmodelpredictivecontrol_jl_tpu.ops.condense import runtime_qp_vectors


def _random_qp(seed, n=8, m=12):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    z0 = rng.normal(size=n)
    slack = rng.uniform(0.1, 1.0, size=m)
    Az = A @ z0
    return P, q, A, Az - slack, Az + slack


def test_native_matches_scipy():
    from scipy.optimize import LinearConstraint, minimize

    P, q, A, l, u = _random_qp(0)
    z, y, status, iters, rp, rd = native_qp.solve_qp(P, q, A, l, u)
    assert status == 0
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(P.shape[0]),
        jac=lambda x: P @ x + q,
        constraints=[LinearConstraint(A, l, u)], method="SLSQP",
        options={"maxiter": 800, "ftol": 1e-14},
    )
    np.testing.assert_allclose(z, res.x, atol=1e-6)


def test_native_oracle_vs_jax_engine_on_qtp():
    """The f64 native oracle and the f32 on-device engine agree on the
    condensed QTP MPC QP — golden cross-language parity."""
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 20, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )
    qp = c.engine.qp
    e0 = jnp.asarray([0.6] * 4) - c.tuning.references.x[:, 0]
    q, l, u, _, _ = runtime_qp_vectors(qp, e0)

    z_native, _, status, _, _, _ = native_qp.solve_qp(
        np.asarray(qp.P, np.float64), np.asarray(q, np.float64),
        np.asarray(qp.A, np.float64), np.asarray(l, np.float64),
        np.asarray(u, np.float64),
    )
    assert status == 0

    c, sol = mpc.step(c, jnp.asarray([0.6] * 4))
    z_jax = np.asarray(sol.e_u.T.reshape(-1), np.float64)
    np.testing.assert_allclose(z_jax, z_native, atol=5e-5)


def test_native_batch():
    P, q, A, l, u = _random_qp(3)
    B = 8
    rng = np.random.default_rng(0)
    qs = q[None, :] + 0.05 * rng.normal(size=(B, q.size))
    ls = np.tile(l, (B, 1))
    us = np.tile(u, (B, 1))
    z, y, status, iters = native_qp.solve_qp_batch(P, qs, A, ls, us)
    assert z.shape == (B, q.size)
    assert (status == 0).all()
    # lane 5 equals a single solve
    z5, _, st5, _, _, _ = native_qp.solve_qp(P, qs[5], A, l, u)
    np.testing.assert_allclose(z[5], z5, atol=1e-9)


def test_native_detects_primal_infeasible():
    n = 4
    P = np.eye(n)
    q = np.zeros(n)
    A = np.zeros((2, n))
    A[0, 0] = 1.0
    A[1, 0] = 1.0
    l = np.asarray([1.0, -np.inf])
    u = np.asarray([np.inf, -1.0])
    _, _, status, _, _, _ = native_qp.solve_qp(P, q, A, l, u)
    assert status == mpc.STATUS_PRIMAL_INFEASIBLE


def test_native_detects_dual_infeasible():
    P = np.diag([1.0, 0.0])
    q = np.asarray([0.0, -1.0])
    A = np.asarray([[1.0, 0.0]])
    l = np.asarray([-1.0])
    u = np.asarray([1.0])
    _, _, status, _, _, _ = native_qp.solve_qp(P, q, A, l, u)
    assert status == mpc.STATUS_DUAL_INFEASIBLE
