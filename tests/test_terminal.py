"""Terminal-ingredient synthesis (reference _create_terminal_ingredient,
design_mpc.jl:298-394 + terminal_ingredient_test.jl; the neighborhood kind
is the feature the reference stubbed with @warn at design_mpc.jl:345)."""

import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.types import Box
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


# ---------------------------------------------------------------------------
# Golden-data lock-in: the reference preserves the 21 H-representation rows
# of the QTP invariant terminal set (terminal_ingredient_test.jl:395-431,
# computed by InvariantSets.jl for a trained DenseNet's linearization). The
# trained fixture itself is stripped from the mirror, but the golden rows
# overdetermine their own synthesis inputs: identity-row propagations expose
# rows of Acl = A - B K directly, the input rows expose the LQR gain K, and
# chaining K @ Acl^t pins the rest (least-squares residual 7e-15 — exact).
# We rebuild (Acl, K) from the golden data, run OUR synthesis, and require a
# row-for-row bijection (up to row scaling) with the reference's set.
# ---------------------------------------------------------------------------

_GOLDEN_K = np.array([
    [7.122630595237694, 6.837395805570274, 3.3426181833913065, 14.372581083482705],
    [8.103867109868654, 9.72924467090224, 16.263131538649258, 1.5721879837156578],
])
# rows 84/85 of the golden data are K1 @ Acl and K2 @ Acl; with the three
# identity-propagation rows (80 -> e1 Acl, 82 -> -e3 Acl, 77 -> -e1 Acl^2)
# the reconstruction below reproduces every remaining golden row to 1e-12
_GOLDEN_ROWS = [
    ([1.1821257469929807, 0.32477783075165184, 3.753955653769598, -0.6171907205612299], 1.2000000000000002),
    ([1.9844516433175883, 1.0527123209042824, 4.957905573404276, -0.15120229651054853], 1.2000000000000002),
    ([-0.7174463800834686, -0.16731968358133426, -0.14299884029284093, 0.5743028497226739], 0.45000000000000007),
    ([1.6907988718505544, 3.6956354224478427, 0.8947871695749029, 5.115699102348034], 1.2000000000000002),
    ([3.2841587345393615, 2.31606313179734, 6.807979550060749, 0.7214809704540696], 1.2000000000000002),
    ([0.7917175253223642, 0.18629471807030692, 0.19261779399927226, -0.5388689000604783], 0.7100000000000001),
    ([-0.7917175253223642, -0.18629471807030692, -0.19261779399927226, 0.5388689000604783], 0.45000000000000007),
    ([0.1031718933941024, 0.1083387497766164, -0.7878420390865811, 0.02814026958189298], 0.45000000000000007),
    ([-5.355335429620435, -4.56602538130204, -9.82213786152917, -2.0758851736694397], 2.0599999999999996),
    ([3.426874514007263, 5.553294145977776, 2.5345823089219666, 7.315365801939883], 1.2000000000000002),
    ([5.355335429620435, 4.56602538130204, 9.82213786152917, 2.0758851736694397], 1.2000000000000002),
    ([1.0, 0.0, 0.0, 0.0], 0.7100000000000001),
    ([0.0, 1.0, 0.0, 0.0], 0.7100000000000001),
    ([-1.0, 0.0, 0.0, 0.0], 0.45000000000000007),
    ([0.0, -1.0, 0.0, 0.0], 0.45000000000000007),
    ([0.0, 0.0, -1.0, 0.0], 0.45000000000000007),
    ([0.0, 0.0, 0.0, -1.0], 0.45000000000000007),
    ([-7.122630595237694, -6.837395805570274, -3.3426181833913065, -14.372581083482705], 2.8),
    ([-8.103867109868654, -9.72924467090224, -16.263131538649258, -1.5721879837156578], 2.0599999999999996),
    ([7.122630595237694, 6.837395805570274, 3.3426181833913065, 14.372581083482705], 1.2000000000000002),
    ([8.103867109868654, 9.72924467090224, 16.263131538649258, 1.5721879837156578], 1.2000000000000002),
]


def _reconstruct_golden_acl():
    K1, K2 = _GOLDEN_K
    g = {tuple(np.round(r, 6)): r for r, _ in _GOLDEN_ROWS}
    r80 = np.asarray(_GOLDEN_ROWS[5][0])
    r82 = np.asarray(_GOLDEN_ROWS[7][0])
    r84 = np.asarray(_GOLDEN_ROWS[9][0])
    r85 = np.asarray(_GOLDEN_ROWS[10][0])
    # rows of Acl: e1 Acl = r80, e3 Acl = -r82; remaining two from the
    # chain equations K1 Acl = r84, K2 Acl = r85 (2x4 linear system per col)
    A0, A2 = r80, -r82
    M = np.asarray([[K1[1], K1[3]], [K2[1], K2[3]]])
    rhs = np.stack([
        r84 - K1[0] * A0 - K1[2] * A2,
        r85 - K2[0] * A0 - K2[2] * A2,
    ])
    sol = np.linalg.solve(M, rhs)  # rows: A1, A3
    Acl = np.stack([A0, sol[0], A2, sol[1]])
    # verification: the reconstruction must reproduce the deeper golden
    # chain rows exactly (this is what makes the data self-certifying)
    np.testing.assert_allclose(K1 @ Acl @ Acl, _GOLDEN_ROWS[3][0], atol=1e-9)
    np.testing.assert_allclose(K2 @ Acl @ Acl, _GOLDEN_ROWS[4][0], atol=1e-9)
    np.testing.assert_allclose(
        K2 @ np.linalg.matrix_power(Acl, 3), _GOLDEN_ROWS[1][0], atol=1e-9
    )
    np.testing.assert_allclose(
        K2 @ np.linalg.matrix_power(Acl, 4), _GOLDEN_ROWS[0][0], atol=1e-9
    )
    np.testing.assert_allclose(-(A0 @ Acl), _GOLDEN_ROWS[2][0], atol=1e-9)
    return Acl


def test_neighborhood_set_matches_reference_golden_rows():
    from automationlabsmodelpredictivecontrol_jl_tpu.terminal import (
        invariant_terminal_set,
    )

    Acl = _reconstruct_golden_acl()
    X = Box(lo=jnp.asarray([0.2] * 4), hi=jnp.asarray([1.36, 1.36, 1.30, 1.30]))
    U = Box(lo=jnp.asarray([0.0, 0.0]), hi=jnp.asarray([4.0, 3.26]))
    # pass A = Acl with B = 0 so A - B K = Acl at the golden gain
    H, b = invariant_terminal_set(
        Acl, np.zeros((4, 2)), _GOLDEN_K, X, U,
        np.full(4, 0.65), np.full(2, 1.2), max_depth=30,
    )
    assert H.shape[0] == len(_GOLDEN_ROWS) == 21

    def normalized(Hm, bv):
        n = np.linalg.norm(Hm, axis=1, keepdims=True)
        return np.concatenate([Hm / n, bv[:, None] / n], axis=1)

    ours = normalized(np.asarray(H, np.float64), np.asarray(b, np.float64))
    gold = normalized(
        np.asarray([r for r, _ in _GOLDEN_ROWS]),
        np.asarray([v for _, v in _GOLDEN_ROWS]),
    )
    # bijection up to row ordering / scaling
    for row in gold:
        assert np.min(np.max(np.abs(ours - row[None]), axis=1)) < 1e-5
    for row in ours:
        assert np.min(np.max(np.abs(gold - row[None]), axis=1)) < 1e-5
