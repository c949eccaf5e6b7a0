"""Auxiliary subsystems: user-function (physical) family, determinism,
profiling helpers (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.utils import profiling


def test_user_function_system_discrete():
    """The reference's 'physical' family (dead code there) works here:
    MPC over a user-supplied discrete dynamics function."""
    lin = qtp.linearized_discrete_system()
    A, B = lin.A, lin.B

    sys = mpc.user_function_system(
        lambda x, u: A @ x + B @ u, 4, 2, qtp.X_BOX, qtp.U_BOX
    )
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )
    c, sol = mpc.step(c, jnp.full(4, 0.6))
    assert int(sol.status) in (0, 1)


def test_user_function_system_continuous():
    sys = mpc.user_function_system(
        qtp.qtp_ode, 4, 2, qtp.X_BOX, qtp.U_BOX, discrete=False
    )
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2),
        mpc_programming_type="linear",
    )
    c, sol = mpc.step(c, jnp.full(4, 0.62))
    assert int(sol.status) == 0


def test_solve_determinism():
    """Two identical solves produce bitwise-identical outputs (no hidden
    nondeterminism in the engines — the race-detection analogue, SURVEY §5)."""
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )
    step = jax.jit(mpc.step)
    _, sol_a = step(c, jnp.full(4, 0.58))
    _, sol_b = step(c, jnp.full(4, 0.58))
    np.testing.assert_array_equal(np.asarray(sol_a.u), np.asarray(sol_b.u))
    np.testing.assert_array_equal(
        np.asarray(sol_a.iterations), np.asarray(sol_b.iterations)
    )


def test_profiling_benchmark_helper():
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )
    x0 = jnp.full(4, 0.6)
    step = jax.jit(lambda: mpc.solve_once(c, x0, c.warm_z, c.warm_y)[0].u)
    stats = profiling.benchmark(step, warmup=1, reps=3)
    assert stats["p50_ms"] > 0
    assert profiling.solve_rate(1, stats) > 0
