"""Systems layer: discretization + linearization correctness
(replaces AutomationLabsSystems capabilities, SURVEY §1)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.models.zoo import init_model
from automationlabsmodelpredictivecontrol_jl_tpu.systems import rk4_step


def _random_ct(seed, nx=3, nu=2):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(nx, nx)) * 0.5 - 0.5 * np.eye(nx)
    B = rng.normal(size=(nx, nu))
    box = mpc.Box(lo=-np.ones(nx), hi=np.ones(nx))
    ubox = mpc.Box(lo=-np.ones(nu), hi=np.ones(nu))
    return mpc.LinearContinuousSystem(
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(B, jnp.float32), X=box, U=ubox
    )


def test_zoh_discretization_matches_scipy():
    # parity: proceed_system_discretization (design_mpc.jl:35), exact ZOH
    sys_c = _random_ct(0)
    Ts = 0.7
    d = mpc.discretize(sys_c, Ts)
    A = np.asarray(sys_c.A, np.float64)
    B = np.asarray(sys_c.B, np.float64)
    nx, nu = B.shape
    M = np.zeros((nx + nu, nx + nu))
    M[:nx, :nx] = A
    M[:nx, nx:] = B
    E = scipy.linalg.expm(M * Ts)
    np.testing.assert_allclose(np.asarray(d.A), E[:nx, :nx], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.B), E[:nx, nx:], atol=1e-5)


def test_linearize_matches_finite_differences():
    # parity: proceed_system_linearization via jacfwd (fnn/...:42-46)
    apply_fn, params = init_model("fnn", jax.random.PRNGKey(1), 3, 2, hidden=8,
                                  depth=1, activation="tanh")
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=3, nu=2, params=params,
        X=mpc.Box(lo=-jnp.ones(3), hi=jnp.ones(3)),
        U=mpc.Box(lo=-jnp.ones(2), hi=jnp.ones(2)),
    )
    x0 = jnp.asarray([0.1, -0.2, 0.3])
    u0 = jnp.asarray([0.05, -0.05])
    A, B = mpc.linearize(sys, x0, u0)
    eps = 1e-3
    f = lambda x, u: np.asarray(apply_fn(params, jnp.asarray(x), jnp.asarray(u)))
    for j in range(3):
        dx = np.zeros(3)
        dx[j] = eps
        fd = (f(np.asarray(x0) + dx, u0) - f(np.asarray(x0) - dx, u0)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A)[:, j], fd, atol=1e-3)
    for j in range(2):
        du = np.zeros(2)
        du[j] = eps
        fd = (f(x0, np.asarray(u0) + du) - f(x0, np.asarray(u0) - du)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(B)[:, j], fd, atol=1e-3)


def test_linearize_linear_system_is_identity():
    d = mpc.discretize(_random_ct(2), 0.5)
    A, B = mpc.linearize(d, jnp.zeros(3), jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(A), np.asarray(d.A))


def test_rk4_convergence_order():
    # dx/dt = -x -> e^{-t}; RK4 with halved step -> ~16x error reduction
    f = lambda x, u: -x
    x0 = jnp.asarray([1.0])
    u = jnp.zeros(1)
    exact = np.exp(-1.0)

    def integrate(h, steps):
        x = x0
        for _ in range(steps):
            x = rk4_step(f, x, u, h)
        return float(x[0])

    e1 = abs(integrate(0.5, 2) - exact)
    e2 = abs(integrate(0.25, 4) - exact)
    assert e2 < e1 / 8


def test_qtp_equilibrium_is_steady():
    # at an equilibrium (solve qa,qb for levels), dx/dt ~ 0
    x_op = np.asarray([0.65, 0.65, 0.65, 0.65])
    sq = np.sqrt(2 * qtp.G * x_op)
    # from d3=0 and d4=0: qb,qa; then check d1,d2 near-consistency
    qb = qtp.A3 * sq[2] * 3600 / (1 - qtp.GAMMA_B)
    qa = qtp.A4 * sq[3] * 3600 / (1 - qtp.GAMMA_A)
    dx = np.asarray(qtp.qtp_ode(jnp.asarray(x_op), jnp.asarray([qa, qb])))
    np.testing.assert_allclose(dx[2:], 0.0, atol=1e-9)
