"""Pallas-fused Riccati kernel vs the jax sparse engine (interpret mode on
the CPU test mesh; the real Mosaic compile runs in bench.py on TPU).

The kernel iterates w-update (backward affine sweep + forward rollout) then
projection/dual ascent exactly like ops.riccati.solve_sparse.admm_iter, so
solutions, statuses and (up to f32 reduction order) iteration counts match
the vmapped jax engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.dare import solve_dare
from automationlabsmodelpredictivecontrol_jl_tpu.ops.riccati import (
    RiccatiConfig,
    build_riccati_operator,
    solve_sparse,
)
from automationlabsmodelpredictivecontrol_jl_tpu.ops.riccati_pallas import (
    solve_sparse_fused,
)

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)
CFG = RiccatiConfig(max_iter=4000, eps_abs=1e-6, eps_rel=1e-6)


def _operator(N, state_constraint, terminal_kind="none"):
    sys = qtp.linearized_discrete_system()
    w = mpc.create_weights(4, 2, 100.0, 0.1, 0.0)
    P = solve_dare(sys.A, sys.B, w.Q, w.R)
    x_lo = jnp.asarray(qtp.X_BOX.lo) - jnp.asarray(X_REF, jnp.float32)
    x_hi = jnp.asarray(qtp.X_BOX.hi) - jnp.asarray(X_REF, jnp.float32)
    u_lo = jnp.asarray(qtp.U_BOX.lo) - jnp.asarray(U_REF, jnp.float32)
    u_hi = jnp.asarray(qtp.U_BOX.hi) - jnp.asarray(U_REF, jnp.float32)
    return build_riccati_operator(
        sys.A, sys.B, w.Q, w.R, P, N, x_lo, x_hi, u_lo, u_hi,
        state_constraint, terminal_kind=terminal_kind,
    )


def _e0s(B, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.clip(scale * rng.standard_normal((B, 4)), -0.3, 0.3), jnp.float32
    )


@pytest.mark.parametrize(
    "state_constraint,terminal_kind",
    [(False, "none"), (True, "none"), (True, "contractive")],
)
def test_fused_matches_jax_engine(state_constraint, terminal_kind):
    op = _operator(12, state_constraint, terminal_kind)
    e0s = _e0s(8)
    Xr, Ur, st_r, it_r, *_ = jax.vmap(
        lambda e: solve_sparse(op, e, config=CFG)
    )(e0s)
    Xf, Uf, st_f, it_f, *_ = solve_sparse_fused(op, e0s, config=CFG)
    np.testing.assert_array_equal(np.asarray(st_f), np.asarray(st_r))
    assert np.all(np.asarray(st_f) == 0)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ur), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), atol=5e-5)


def test_fused_contractive_ball_binds():
    """A wide e0 makes the sqrt(0.9)||e0|| terminal ball an active
    constraint; the fused kernel must still match and satisfy it."""
    op = _operator(3, False, "contractive")
    e0s = _e0s(8, seed=3, scale=0.25)
    cfg = RiccatiConfig(max_iter=20000, eps_abs=1e-6, eps_rel=1e-6)
    Xf, Uf, st, *_ = solve_sparse_fused(op, e0s, config=cfg)
    assert np.all(np.asarray(st) == 0)
    xN = np.linalg.norm(np.asarray(Xf)[:, -1], axis=1)
    r = np.sqrt(0.9) * np.linalg.norm(np.asarray(e0s), axis=1)
    assert np.all(xN <= r + 1e-3)
    Xr, Ur, st_r, *_ = jax.vmap(lambda e: solve_sparse(op, e, config=cfg))(
        e0s
    )
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ur), atol=2e-4)


def test_fused_warm_start_reduces_iterations():
    op = _operator(12, True)
    e0s = _e0s(8, seed=1)
    X1, U1, st1, it1, _, _, lam1 = solve_sparse_fused(op, e0s, config=CFG)
    X2, U2, st2, it2, *_ = solve_sparse_fused(
        op, e0s, warm_U=U1, warm_lam=lam1, config=CFG
    )
    assert np.all(np.asarray(st2) == 0)
    assert float(jnp.mean(it2)) <= float(jnp.mean(it1))


def test_fused_equality_boost_matches_engine():
    """Feasible equality solve under the r4 terminal-rho boost
    (rho_eq_scale): the fused kernel's boosted terminal updates must
    match the jax engine and certify convergence from a near-reference
    e0 (the weakly-reachable regime that stalled before the boost)."""
    op = _operator(5, False, "equality")
    assert op.term_rho_scale > 1.0
    e0s = jnp.asarray(
        [[0.002, -0.002, 0.001, -0.001], [0.001, 0.002, -0.001, 0.0]],
        jnp.float32,
    )
    cfg = RiccatiConfig(max_iter=20000, eps_abs=1e-6, eps_rel=1e-6)
    Xf, Uf, st_f, *_ = solve_sparse_fused(op, e0s, config=cfg)
    Xr, Ur, st_r, *_ = jax.vmap(lambda e: solve_sparse(op, e, config=cfg))(
        e0s
    )
    assert np.all(np.asarray(st_r) == 0)
    np.testing.assert_array_equal(np.asarray(st_f), np.asarray(st_r))
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ur), atol=2e-4)
    # terminal state actually reaches (near) zero deviation
    assert float(np.max(np.abs(np.asarray(Xr)[:, -1]))) < 1e-4


def test_fused_detects_infeasible_equality():
    """Equality terminal unreachable in 3 QTP steps from a wide e0 — the
    stall detector must flag primal infeasibility, same as the jax engine."""
    op = _operator(3, False, "equality")
    e0 = jnp.asarray([[0.3, 0.3, 0.3, 0.3]], jnp.float32)
    cfg = RiccatiConfig(max_iter=4000)
    _, _, st_f, *_ = solve_sparse_fused(op, e0, config=cfg)
    _, _, st_r, *_ = jax.vmap(lambda e: solve_sparse(op, e, config=cfg))(e0)
    assert int(st_f[0]) == int(st_r[0]) == mpc.STATUS_PRIMAL_INFEASIBLE
