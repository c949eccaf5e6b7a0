"""Riccati-sweep sparse engine vs the condensed engine (same QP, two
factorizations — SURVEY §7 step 5's block-tridiagonal KKT path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.dare import solve_dare
from automationlabsmodelpredictivecontrol_jl_tpu.ops.riccati import (
    RiccatiConfig,
    _lqr_affine_solve,
    build_riccati_operator,
    solve_sparse,
)

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)


def _setup(N, state_constraint, config=None):
    sys = qtp.linearized_discrete_system()
    w = mpc.create_weights(4, 2, 100.0, 0.1, 0.0)
    P = solve_dare(sys.A, sys.B, w.Q, w.R)
    x_lo = jnp.asarray(qtp.X_BOX.lo) - jnp.asarray(X_REF, jnp.float32)
    x_hi = jnp.asarray(qtp.X_BOX.hi) - jnp.asarray(X_REF, jnp.float32)
    u_lo = jnp.asarray(qtp.U_BOX.lo) - jnp.asarray(U_REF, jnp.float32)
    u_hi = jnp.asarray(qtp.U_BOX.hi) - jnp.asarray(U_REF, jnp.float32)
    op = build_riccati_operator(
        sys.A, sys.B, w.Q, w.R, P, N, x_lo, x_hi, u_lo, u_hi,
        state_constraint, config=config or RiccatiConfig(),
    )
    return sys, op


def test_unconstrained_lqr_matches_condensed():
    """With boxes wide open both engines solve the same unconstrained LQR."""
    N = 10
    sys, op = _setup(N, False)
    e0 = jnp.asarray([-0.05, -0.05, -0.05, -0.05])
    # affine solve with zero linear terms == plain LQR trajectory
    ridx = int(np.argmin(np.abs(np.asarray(op.rho_grid) - 10.0)))
    X, U = _lqr_affine_solve(
        op, ridx, e0,
        jnp.zeros((N - 1, 4), jnp.float32),
        jnp.zeros((4,), jnp.float32),
        jnp.zeros((N, 2), jnp.float32),
    )
    # rollout consistency
    e = e0
    for k in range(N):
        e = op.factors.A @ e + op.factors.B @ U[k]
        np.testing.assert_allclose(np.asarray(X[k + 1]), np.asarray(e), atol=1e-5)


def test_sparse_matches_condensed_with_input_boxes():
    N = 10
    sys, op = _setup(N, False)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, X_REF, U_REF
    )
    x0 = jnp.asarray([0.45, 0.5, 0.55, 0.8])
    c, sol = mpc.step(c, x0)
    assert int(sol.status) == 0

    e0 = x0 - jnp.asarray(X_REF, jnp.float32)
    cfg = RiccatiConfig(max_iter=4000, eps_abs=1e-6, eps_rel=1e-6)
    X, U, status, iters, rp, rd, _ = solve_sparse(op, e0, config=cfg)
    assert int(status) == 0
    np.testing.assert_allclose(
        np.asarray(U) + U_REF[None, :], np.asarray(sol.u).T, atol=2e-3
    )


def test_sparse_with_state_boxes_matches_condensed():
    N = 8
    sys, op = _setup(N, True)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, X_REF, U_REF,
        mpc_state_constraint=True,
    )
    x0 = jnp.asarray([0.6, 0.62, 0.64, 0.66])
    c, sol = mpc.step(c, x0)
    assert int(sol.status) == 0
    e0 = x0 - jnp.asarray(X_REF, jnp.float32)
    cfg = RiccatiConfig(max_iter=6000, eps_abs=1e-6, eps_rel=1e-6)
    X, U, status, iters, rp, rd, _ = solve_sparse(op, e0, config=cfg)
    assert int(status) == 0
    np.testing.assert_allclose(
        np.asarray(U) + U_REF[None, :], np.asarray(sol.u).T, atol=5e-3
    )


def test_sparse_batched_vmap():
    N = 10
    sys, op = _setup(N, False)
    rng = np.random.default_rng(0)
    e0s = jnp.asarray(0.05 * rng.standard_normal((16, 4)), jnp.float32)
    cfg = RiccatiConfig(max_iter=3000)
    X, U, status, iters, rp, rd, _ = jax.vmap(
        lambda e: solve_sparse(op, e, config=cfg)
    )(e0s)
    assert U.shape == (16, N, 2)
    assert np.all(np.asarray(status) == 0)


def test_long_horizon_scaling():
    """The sparse engine handles N=120 (the condensed QP at that horizon has
    a 240x240 dense P and 4800x240 prediction operator)."""
    N = 120
    sys, op = _setup(N, False)
    e0 = jnp.asarray([-0.05, 0.05, -0.03, 0.03])
    cfg = RiccatiConfig(max_iter=3000)
    X, U, status, iters, rp, rd, _ = solve_sparse(op, e0, config=cfg)
    assert int(status) == 0
    # inputs respect the box
    assert float(jnp.max(U)) <= float(jnp.max(op.u_hi)) + 1e-4


def test_parallel_sweeps_match_sequential():
    """The Hillis-Steele parallel-in-time sweep evaluates the same affine
    recurrences as the sequential lax.scan (RiccatiConfig.parallel_sweeps);
    solutions and iteration counts must agree."""
    import dataclasses

    from automationlabsmodelpredictivecontrol_jl_tpu.ops import riccati as rops

    cfg = rops.RiccatiConfig(max_iter=600)
    _, op = _setup(24, state_constraint=True, config=cfg)
    e0 = jnp.asarray([-0.05, 0.02, -0.04, 0.03], jnp.float32)
    outs = {}
    for ps in (False, True):
        c = dataclasses.replace(cfg, parallel_sweeps=ps)
        X, U, status, it, rp, rd, _ = rops.solve_sparse(op, e0, config=c)
        outs[ps] = (X, U, status, it)
    np.testing.assert_allclose(
        np.asarray(outs[True][1]), np.asarray(outs[False][1]), atol=1e-4
    )
    assert int(outs[True][2]) == int(outs[False][2]) == 0
