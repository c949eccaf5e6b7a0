"""DARE solver vs scipy oracle (replaces ControlSystems.are, design_mpc.jl:327)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from automationlabsmodelpredictivecontrol_jl_tpu.ops.dare import (
    dare_residual,
    lqr_gain,
    solve_dare,
)


def _sys(seed, nx=4, nu=2):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(nx, nx)) * 0.4
    B = rng.normal(size=(nx, nu))
    Q = 100.0 * np.eye(nx)
    R = 0.1 * np.eye(nu)
    return A, B, Q, R


def test_dare_matches_scipy():
    A, B, Q, R = _sys(0)
    P = np.asarray(solve_dare(A, B, Q, R), np.float64)
    P_ref = scipy.linalg.solve_discrete_are(A, B, Q, R)
    np.testing.assert_allclose(P, P_ref, rtol=2e-4, atol=1e-2)


def test_dare_residual_small():
    A, B, Q, R = _sys(1)
    P = solve_dare(A, B, Q, R)
    res = float(dare_residual(A, B, Q, R, P))
    assert res < 1e-2 * float(jnp.max(jnp.abs(P)))


def test_dare_vmappable():
    systems = [_sys(s) for s in range(3)]
    As = jnp.stack([jnp.asarray(s[0], jnp.float32) for s in systems])
    Bs = jnp.stack([jnp.asarray(s[1], jnp.float32) for s in systems])
    Qs = jnp.stack([jnp.asarray(s[2], jnp.float32) for s in systems])
    Rs = jnp.stack([jnp.asarray(s[3], jnp.float32) for s in systems])
    Ps = jax.vmap(solve_dare)(As, Bs, Qs, Rs)
    for i, (A, B, Q, R) in enumerate(systems):
        P_ref = scipy.linalg.solve_discrete_are(A, B, Q, R)
        np.testing.assert_allclose(np.asarray(Ps[i], np.float64), P_ref,
                                   rtol=2e-4, atol=1e-2)


def test_lqr_gain_stabilizes():
    A, B, Q, R = _sys(2)
    P = solve_dare(A, B, Q, R)
    K = np.asarray(lqr_gain(A, B, R, P), np.float64)
    eig = np.abs(np.linalg.eigvals(A - B @ K))
    assert np.all(eig < 1.0)
