"""Structural + numerical parity lock-ins against the reference.

The reference's terminal-ingredient suite pins exact JuMP constraint
counts at N=5 on the QTP plant: none=74, contractive=75, equality=78
(/root/reference/test/terminal_ingredient_test.jl:160,237,317). This
framework never materializes scalar rows — dynamics live inside the
condensed operator — so the analogue is the condensed QP's constraint-row
layout (ops/condense.py:85-87): input boxes always on, state boxes
opt-in, then the terminal block. These tests pin that layout per terminal
kind so a regression in transcription is caught the same way the
reference catches one.

Also covered here: the weakly-convex parity hard case (SURVEY §7 hard
part (f): "honest 1e-4 parity with OSQP's solution when the QP is weakly
convex (R small)") and the MILP-vs-SQP cross-method consistency the
reference aspires to but marks `broken=true`
(/root/reference/test/computation_mpc_test.jl:152-169).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import native_qp
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.condense import (
    runtime_qp_vectors,
)

N = 5  # the reference solve-suite horizon (terminal_ingredient_test.jl)
TS = 5.0
NX, NU = 4, 2
X_REF = np.full(NX, 0.65, np.float32)
U_REF = np.full(NU, 1.2, np.float32)
X0 = jnp.asarray([0.6, 0.6, 0.6, 0.6], jnp.float32)


def _controller(terminal="none", state_constraint=False, **kw):
    kwargs = dict(mpc_terminal_ingredient=terminal, **kw)
    if state_constraint:
        kwargs["mpc_state_constraint"] = True
    return mpc.proceed_controller(
        qtp.linearized_discrete_system(),
        "model_predictive_control",
        N, TS, X_REF, U_REF, **kwargs,
    )


# ---------------------------------------------------------------------------
# constraint-row layout lock-ins (reference counts 74/75/78 analogue)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "terminal,extra_rows,n_ball",
    [
        # "none": input boxes only -> N*nu rows. Reference count: 74
        # scalar rows (most of which are the dynamics equalities this
        # formulation condenses away).
        ("none", 0, 0),
        # "equality": e_x[:,end] == 0 -> nx two-sided zero rows
        # (reference adds 4 rows: 74 -> 78, terminal_ingredient_test.jl:317).
        ("equality", NX, 0),
        # "contractive": one ball constraint ||e_x_N|| <= 0.9||e_x_1||,
        # carried as an nx-row Euclidean-ball projection block
        # (reference adds 1 scalar quadratic row: 74 -> 75).
        ("contractive", 0, NX),
    ],
)
def test_terminal_row_layout(terminal, extra_rows, n_ball):
    c = _controller(terminal)
    qp = c.engine.qp
    n_dec = N * NU  # decision vector = stacked e_u, multiple-shooting condensed out
    assert qp.A.shape[1] == n_dec
    assert qp.A.shape[0] == N * NU + extra_rows + n_ball
    assert qp.n_ball == n_ball
    # input box rows are the identity block with the reference's U bounds
    # shifted by u_ref (always enforced — reference linear/...:72-78)
    q, l, u, _, _ = runtime_qp_vectors(qp, jnp.zeros(NX))
    np.testing.assert_allclose(
        np.asarray(l[: N * NU]),
        np.tile(np.asarray(qtp.U_BOX.lo) - U_REF, N),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(u[: N * NU]),
        np.tile(np.asarray(qtp.U_BOX.hi) - U_REF, N),
        atol=1e-6,
    )
    if terminal == "equality":
        # two-sided zero rows on the terminal error block
        np.testing.assert_allclose(np.asarray(l[N * NU : N * NU + NX]), 0.0)
        np.testing.assert_allclose(np.asarray(u[N * NU : N * NU + NX]), 0.0)


def test_state_constraint_adds_nx_rows_per_step():
    """Opt-in state boxes add N*nx rows between the input and terminal
    blocks (reference: state boxes only with the mpc_state_constraint
    kwarg, linear/...:62)."""
    base = _controller("none").engine.qp
    with_x = _controller("none", state_constraint=True).engine.qp
    assert with_x.A.shape[0] == base.A.shape[0] + N * NX
    q, l, u, _, _ = runtime_qp_vectors(with_x, jnp.zeros(NX))
    lo = np.asarray(l[N * NU : N * NU + N * NX])
    np.testing.assert_allclose(
        lo, np.tile(np.asarray(qtp.X_BOX.lo) - X_REF, N), atol=1e-5
    )


def test_neighborhood_terminal_rows_are_invariant_set_hrep():
    """The neighborhood kind (the reference's @warn stub,
    design_mpc.jl:345) appends the invariant-set H-representation rows;
    the golden analogue of terminal_ingredient_test.jl:395-431."""
    c = _controller("neighborhood")
    qp = c.engine.qp
    m_H = qp.A.shape[0] - N * NU
    assert m_H >= NX  # a nonempty polytope needs >= nx rows in practice
    assert c.tuning.terminal.kind == "neighborhood"
    # solve: terminal error must land inside the set
    c, sol = mpc.step(c, X0)
    assert int(sol.status) in (0, 1)


# ---------------------------------------------------------------------------
# weakly-convex parity (SURVEY §7 hard part (f))
# ---------------------------------------------------------------------------

def test_weakly_convex_small_R_parity_with_f64_oracle():
    """R = 1e-3 (vs default 0.1) makes the condensed QP weakly convex —
    OSQP-style ADMM termination is the parity risk the SURVEY flags. The
    on-device engine must still match the independent f64 native oracle
    to 1e-4 on the control sequence (BASELINE parity bar)."""
    c = mpc.proceed_controller(
        qtp.linearized_discrete_system(),
        "model_predictive_control", 10, TS, X_REF, U_REF,
        mpc_R=1e-3,
    )
    qp = c.engine.qp
    e0 = X0 - c.tuning.references.x[:, 0]
    q, l, u, _, _ = runtime_qp_vectors(qp, e0)
    z_ref, _, status, _, _, _ = native_qp.solve_qp(
        np.asarray(qp.P, np.float64), np.asarray(q, np.float64),
        np.asarray(qp.A, np.float64), np.asarray(l, np.float64),
        np.asarray(u, np.float64),
    )
    assert status == 0
    c, sol = mpc.step(c, X0)
    assert int(sol.status) == 0
    z_dev = np.asarray(sol.e_u.T.reshape(-1), np.float64)
    np.testing.assert_allclose(z_dev, z_ref, atol=1e-4)


# ---------------------------------------------------------------------------
# cross-method: exact MILP vs SQP on a trained ReLU net
# ---------------------------------------------------------------------------

def test_milp_vs_sqp_first_input_consistency():
    """The reference asserts linear/NL/MILP trajectory agreement but marks
    several cases broken (computation_mpc_test.jl:152-169). Here the
    exact-ReLU B&B global optimum and the SQP local solution from a warm
    rollout must agree on the applied input within the reference's own
    atol 0.5."""
    apply_fn, params = mpc.init_model(
        "fnn", jax.random.PRNGKey(3), NX, NU, hidden=4, depth=1,
        activation="relu",
    )
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=NX, nu=NU, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX, activation="relu",
    )
    kw = dict(mpc_Q=1.0, mpc_R=0.1)
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", 3, TS, X_REF, U_REF,
        mpc_programming_type="non_linear", **kw,
    )
    c_mi = mpc.proceed_controller(
        sys, "model_predictive_control", 3, TS, X_REF, U_REF,
        mpc_programming_type="mixed_linear", **kw,
    )
    c_nl, sol_nl = mpc.step(c_nl, X0)
    c_mi, sol_mi = mpc.step(c_mi, X0)
    assert int(sol_nl.status) in (0, 1)
    assert int(sol_mi.status) in (0, 1)
    np.testing.assert_allclose(
        np.asarray(sol_nl.u[:, 0]), np.asarray(sol_mi.u[:, 0]), atol=0.5
    )
    # and the global optimum is at least as good (objective sense check)
    assert float(sol_mi.objective) <= float(sol_nl.objective) + 1e-3
