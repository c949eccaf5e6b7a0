"""Quadruple-tank process (QTP) — the reference's canonical plant.

Johansson's quadruple-tank benchmark as used throughout the reference's
test suite: 4 states (tank levels, m), 2 inputs (pump flows), box bounds
x in [0.2, 1.36/1.36/1.30/1.30], u in [0, 4] x [0, 3.26], sample time 5 s
(modeler_implementation_test.jl:40-62; ground-truth ODE in the commented
testset modeler_implementation_test.jl:1815-1846).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..systems import LinearDiscreteSystem, NeuralContinuousSystem, rk4_step
from ..types import Box

# physical constants (modeler_implementation_test.jl:1817-1827)
S_TANK = 0.06
GAMMA_A = 0.3
GAMMA_B = 0.4
G = 9.81
A1, A2, A3, A4 = 1.34e-4, 1.51e-4, 9.27e-5, 8.82e-5

X_BOX = Box(
    lo=jnp.asarray([0.2, 0.2, 0.2, 0.2], jnp.float32),
    hi=jnp.asarray([1.36, 1.36, 1.30, 1.30], jnp.float32),
)
U_BOX = Box(
    lo=jnp.asarray([0.0, 0.0], jnp.float32),
    hi=jnp.asarray([4.0, 3.26], jnp.float32),
)

SAMPLE_TIME = 5.0


def qtp_ode(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Continuous dynamics dx/dt = f(x, u); x levels (m), u pump flows."""
    x = jnp.maximum(x, 1e-6)  # sqrt guard
    x1, x2, x3, x4 = x[0], x[1], x[2], x[3]
    qa, qb = u[0], u[1]
    sq = lambda v: jnp.sqrt(2.0 * G * v)
    d1 = -A1 / S_TANK * sq(x1) + A3 / S_TANK * sq(x3) + GAMMA_A / (S_TANK * 3600) * qa
    d2 = -A2 / S_TANK * sq(x2) + A4 / S_TANK * sq(x4) + GAMMA_B / (S_TANK * 3600) * qb
    d3 = -A3 / S_TANK * sq(x3) + (1 - GAMMA_B) / (S_TANK * 3600) * qb
    d4 = -A4 / S_TANK * sq(x4) + (1 - GAMMA_A) / (S_TANK * 3600) * qa
    return jnp.stack([d1, d2, d3, d4])


def qtp_discrete_step(x, u, dt: float = SAMPLE_TIME, substeps: int = 10):
    """RK4-integrated discrete step of the true plant."""
    h = dt / substeps
    for _ in range(substeps):
        x = rk4_step(qtp_ode, x, u, h)
    return x


def linearized_discrete_system(
    x_op=None, u_op=None, dt: float = SAMPLE_TIME
) -> LinearDiscreteSystem:
    """Discrete linearization of the QTP around an operating point — the
    stand-in for the reference's learned `linear_regressor` fixture.

    Analytic jacobian + scipy expm: the design path triggers no XLA
    compilation at all (see ops/condense.py condense_np)."""
    import numpy as onp
    import scipy.linalg as sla

    x_op = onp.full(4, 0.65) if x_op is None else onp.asarray(x_op, onp.float64)
    # d/dv sqrt(2 g v) = g / sqrt(2 g v)
    dsq = G / onp.sqrt(2.0 * G * x_op)
    Ac = onp.zeros((4, 4))
    Ac[0, 0] = -A1 / S_TANK * dsq[0]
    Ac[0, 2] = A3 / S_TANK * dsq[2]
    Ac[1, 1] = -A2 / S_TANK * dsq[1]
    Ac[1, 3] = A4 / S_TANK * dsq[3]
    Ac[2, 2] = -A3 / S_TANK * dsq[2]
    Ac[3, 3] = -A4 / S_TANK * dsq[3]
    Bc = onp.zeros((4, 2))
    Bc[0, 0] = GAMMA_A / (S_TANK * 3600)
    Bc[1, 1] = GAMMA_B / (S_TANK * 3600)
    Bc[2, 1] = (1 - GAMMA_B) / (S_TANK * 3600)
    Bc[3, 0] = (1 - GAMMA_A) / (S_TANK * 3600)
    M = onp.zeros((6, 6))
    M[:4, :4] = Ac
    M[:4, 4:] = Bc
    E = sla.expm(M * dt)
    return LinearDiscreteSystem(
        A=jnp.asarray(E[:4, :4], jnp.float32),
        B=jnp.asarray(E[:4, 4:], jnp.float32),
        X=X_BOX,
        U=U_BOX,
    )


def neural_continuous_system(apply_fn, params) -> NeuralContinuousSystem:
    return NeuralContinuousSystem(
        apply_fn=apply_fn, family="physical", nx=4, nu=2, params=params, X=X_BOX, U=U_BOX
    )
