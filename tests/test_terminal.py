"""Terminal-ingredient synthesis (reference _create_terminal_ingredient,
design_mpc.jl:298-394 + terminal_ingredient_test.jl; the neighborhood kind
is the feature the reference stubbed with @warn at design_mpc.jl:345)."""

import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.dare import lqr_gain, solve_dare
from automationlabsmodelpredictivecontrol_jl_tpu.terminal import (
    create_terminal_ingredient,
    invariant_terminal_set,
)

X_REF = np.full(4, 0.65)
U_REF = np.full(2, 1.2)


def _sysrefs(N=5):
    sys = qtp.linearized_discrete_system()
    refs = mpc.design_references(X_REF, U_REF, N)
    w = mpc.create_weights(4, 2, 100.0, 0.1, 0.0)
    return sys, refs, w


def test_terminal_cost_is_dare_solution():
    sys, refs, w = _sysrefs()
    term = create_terminal_ingredient(sys, "none", refs, w)
    P_direct = solve_dare(sys.A, sys.B, w.Q, w.R)
    np.testing.assert_allclose(
        np.asarray(term.P), np.asarray(P_direct), rtol=1e-4, atol=1e-2
    )
    assert term.H is None and term.b is None


def test_equality_terminal_enforced_in_solve():
    # reference asserts e_x[:,end] == 0 rows (terminal_ingredient_test.jl:318-321).
    # The QTP linearization is weakly reachable (sigma_min(R_5) ~ 5e-4), so
    # exact terminal equality at N=5 is only input-box-feasible for x0 very
    # near the reference — the solver must say so, not return garbage.
    sys, _, _ = _sysrefs()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_terminal_ingredient="equality",
    )
    x0 = jnp.asarray(0.65 + 0.03 * np.asarray([-0.02, -0.02, -0.01, 0.01]),
                     jnp.float32)
    c, sol = mpc.step(c, x0)
    assert int(sol.status) == 0
    assert float(jnp.max(jnp.abs(sol.e_x[:, -1]))) < 1e-4


def test_equality_terminal_infeasibility_flagged():
    # from a distant x0 the equality-terminal QP is genuinely infeasible
    # (confirmed vs an LP oracle); the engine flags it instead of throwing —
    # the reference never checks termination status (computation_mpc.jl:38-55)
    sys, _, _ = _sysrefs()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_terminal_ingredient="equality",
    )
    c, sol = mpc.step(c, jnp.asarray([0.63, 0.63, 0.64, 0.66]))
    assert int(sol.status) == mpc.STATUS_PRIMAL_INFEASIBLE


def test_contractive_terminal_enforced_in_solve():
    # ||e_x_N||^2 <= 0.9 ||e_x_1||^2 (design_mpc.jl:333-340)
    sys, _, _ = _sysrefs()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_terminal_ingredient="contractive",
    )
    x0 = jnp.asarray([0.58, 0.6, 0.62, 0.7])
    c, sol = mpc.step(c, x0)
    assert int(sol.status) == 0
    lhs = float(jnp.sum(sol.e_x[:, -1] ** 2))
    rhs = 0.9 * float(jnp.sum(sol.e_x[:, 0] ** 2))
    assert lhs <= rhs * (1 + 1e-2) + 1e-6


def test_invariant_set_is_invariant_and_admissible():
    """O_inf property check: closed-loop image of points in the set stays in
    the set, and the LQR input at those points respects the input box."""
    sys, refs, w = _sysrefs()
    P = solve_dare(sys.A, sys.B, w.Q, w.R)
    K = lqr_gain(sys.A, sys.B, w.R, P)
    H, b = invariant_terminal_set(
        sys.A, sys.B, K, sys.X, sys.U, X_REF, U_REF, max_depth=40
    )
    assert H.shape[0] == b.shape[0] > 0
    A = np.asarray(sys.A, np.float64)
    B = np.asarray(sys.B, np.float64)
    Kn = np.asarray(K, np.float64)
    Acl = A - B @ Kn
    rng = np.random.default_rng(0)
    # rejection-sample points in the set
    pts = 0.6 * rng.uniform(-1, 1, size=(3000, 4))
    inside = pts[(H @ pts.T <= b[:, None]).all(axis=0)]
    assert len(inside) > 10
    nxt = inside @ Acl.T
    # invariance: e+ in the set
    assert (H @ nxt.T <= b[:, None] + 1e-7).all()
    # admissibility: u = u_ref - K e within the input box
    u = U_REF[None, :] - inside @ Kn.T
    assert (u >= np.asarray(qtp.U_BOX.lo) - 1e-7).all()
    assert (u <= np.asarray(qtp.U_BOX.hi) + 1e-7).all()


def test_neighborhood_terminal_in_controller():
    sys, _, _ = _sysrefs()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, X_REF, U_REF,
        mpc_terminal_ingredient="neighborhood",
    )
    assert c.tuning.terminal.H is not None
    c, sol = mpc.step(c, jnp.asarray([0.64, 0.65, 0.65, 0.66]))
    assert int(sol.status) == 0
    # terminal state satisfies the H-rep rows
    ex_N = np.asarray(sol.e_x[:, -1], np.float64)
    H = np.asarray(c.tuning.terminal.H, np.float64)
    b = np.asarray(c.tuning.terminal.b, np.float64)
    assert (H @ ex_N <= b + 1e-3).all()
