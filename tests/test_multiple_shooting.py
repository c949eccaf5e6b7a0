"""Multiple-shooting SQP (solvers/sqp.py solve_nonlinear_ms +
ops/riccati_ltv.py) — the reference's own NL transcription (per-step state
variables, dynamics as equality constraints,
fnn/mpc_modeler_implementation_fnn.jl:110-143).

The headline property: on an open-loop-unstable plant the single-shooting
rollout/condensed-QP path degrades with the horizon while the defect
formulation stays conditioned — validated head-to-head below."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpConfig
from automationlabsmodelpredictivecontrol_jl_tpu.systems import (
    Box,
    user_function_system,
)

X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)


@pytest.fixture(scope="module")
def fnn_system():
    apply_fn, params = mpc.init_model("fnn", jax.random.PRNGKey(0), 4, 2,
                                      hidden=16, depth=2)
    return mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


@pytest.fixture(scope="module")
def unstable_system():
    # spectral radius 1.8, mildly nonlinear — a single-shooting rollout
    # amplifies ~1.8^N and the condensed Gauss-Newton QP conditioning
    # collapses with it
    A = jnp.asarray([[1.8, 0.3], [0.0, 1.5]], jnp.float32)
    B = jnp.asarray([[0.0], [1.0]], jnp.float32)

    def f(x, u):
        return A @ x + B @ u + 0.05 * jnp.tanh(x)

    X = Box(lo=jnp.asarray([-50.0, -50.0]), hi=jnp.asarray([50.0, 50.0]))
    U = Box(lo=jnp.asarray([-40.0]), hi=jnp.asarray([40.0]))
    return user_function_system(f, 2, 1, X, U), f


def _design(system, shooting, horizon=10, **kw):
    return mpc.proceed_controller(
        system, "model_predictive_control", horizon, 5.0, X_REF, U_REF,
        sqp_config=SqpConfig(shooting=shooting), **kw,
    )


def test_ms_matches_single_shooting(fnn_system):
    x0 = jnp.asarray([0.6, 0.6, 0.6, 0.6], jnp.float32)
    _, ss = jax.jit(mpc.step)(_design(fnn_system, "single"), x0)
    _, sm = jax.jit(mpc.step)(_design(fnn_system, "multiple"), x0)
    assert int(ss.status) == 0 and int(sm.status) == 0
    np.testing.assert_allclose(
        np.asarray(sm.u), np.asarray(ss.u), atol=1e-2
    )
    # the MS state iterate closes the dynamics (defects inside feas_tol)
    assert float(sm.primal_residual) < 1e-4


def test_ms_stabilizes_unstable_plant_where_single_fails(unstable_system):
    system, f = unstable_system
    x_ref = np.zeros(2, np.float32)
    u_ref = np.zeros(1, np.float32)
    x0 = jnp.asarray([1.0, -0.5], jnp.float32)
    N = 30

    def closed_loop(shoot, steps=10):
        c = mpc.proceed_controller(
            system, "model_predictive_control", N, 1.0, x_ref, u_ref,
            mpc_programming_type="non_linear",
            sqp_config=SqpConfig(shooting=shoot, max_sqp_iter=20),
        )
        step = jax.jit(mpc.step)
        x = x0
        for _ in range(steps):
            c, s = step(c, x)
            x = f(x, s.u[:, 0])
        return float(jnp.max(jnp.abs(x))), s

    final_ms, s_ms = closed_loop("multiple")
    final_ss, _ = closed_loop("single")
    # multiple shooting: open-loop plan already lands at the origin, and
    # the closed loop contracts hard
    assert float(s_ms.primal_residual) < 1e-4
    assert final_ms < 0.05
    # single shooting on the same problem does NOT stabilize (1.8^30 ≈ 4e7
    # amplification wrecks the condensed QP); if this ever starts passing,
    # the auto-routing question should be revisited
    assert final_ss > 1.0


def test_ms_open_loop_plan_reaches_origin(unstable_system):
    system, _ = unstable_system
    c = mpc.proceed_controller(
        system, "model_predictive_control", 20, 1.0,
        np.zeros(2, np.float32), np.zeros(1, np.float32),
        mpc_programming_type="non_linear",
        sqp_config=SqpConfig(shooting="multiple", max_sqp_iter=20),
    )
    _, s = jax.jit(mpc.step)(c, jnp.asarray([1.0, -0.5], jnp.float32))
    assert int(s.status) == 0
    assert float(jnp.max(jnp.abs(s.x[:, -1]))) < 1e-4


def test_ms_terminal_kinds_design(fnn_system):
    # equality/contractive route through the per-node box/ball splitting
    for kind in ("equality", "contractive"):
        c = _design(fnn_system, "multiple", mpc_terminal_ingredient=kind)
        assert c.engine.shooting == "multiple"
    with pytest.raises(ValueError, match="neighborhood"):
        _design(fnn_system, "multiple", mpc_terminal_ingredient="neighborhood")


def test_ms_rejects_s_weight(fnn_system):
    with pytest.raises(ValueError, match="S=0"):
        _design(fnn_system, "multiple", mpc_S=0.5)


def test_ms_rejects_unknown_shooting(fnn_system):
    with pytest.raises(ValueError, match="shooting"):
        _design(fnn_system, "nonsense")


def test_ms_warm_start_carries(fnn_system):
    x0 = jnp.asarray([0.62, 0.63, 0.61, 0.64], jnp.float32)
    c = _design(fnn_system, "multiple")
    step = jax.jit(mpc.step)
    c1, s1 = step(c, x0)
    c2, s2 = step(c1, x0)
    assert int(s2.status) == 0
    # warm-started re-solve at the same state converges at least as fast
    assert int(s2.iterations) <= int(s1.iterations)


def test_ms_io_roundtrip(fnn_system, tmp_path):
    from automationlabsmodelpredictivecontrol_jl_tpu import io as mpc_io

    c = _design(fnn_system, "multiple")
    p = tmp_path / "ms_ctrl.npz"
    mpc_io.save_controller(str(p), c)
    c2 = mpc_io.load_controller(str(p))
    assert c2.engine.shooting == "multiple"
    assert c2.engine.config == c.engine.config
