"""Open-loop-unstable benchmark plant (the second test plant, VERDICT r2).

The reference validates every model family only on the self-stabilizing QTP
(all its eigenvalues inside the unit circle — a controller can be sloppy
and still "track"). This plant is the adversarial complement: a mildly
nonlinear two-state system with spectral radius ~1.15, so

- open-loop excitation diverges: the identification dataset must be
  collected in closed loop (LQR + exploration noise), like a real unstable
  process;
- controller mistakes show up as divergence, not just slow tracking;
- the single-vs-multiple-shooting robustness gap is measurable at modest
  horizons (see tests/test_multiple_shooting.py for the extreme case).

    x+ = A x + B u + 0.08 tanh(x),   A = [[1.15, 0.25], [0, 1.08]]

Equilibrium at the origin (tanh(0) = 0), references x_ref = 0, u_ref = 0.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Box

Array = Any

SAMPLE_TIME = 1.0
NX, NU = 2, 1

A = np.asarray([[1.15, 0.25], [0.0, 1.08]], np.float64)
B = np.asarray([[0.0], [1.0]], np.float64)

X_BOX = Box(
    lo=jnp.asarray([-3.0, -3.0], jnp.float32),
    hi=jnp.asarray([3.0, 3.0], jnp.float32),
)
U_BOX = Box(
    lo=jnp.asarray([-8.0], jnp.float32),
    hi=jnp.asarray([8.0], jnp.float32),
)

_A32 = jnp.asarray(A, jnp.float32)
_B32 = jnp.asarray(B, jnp.float32)


def unstable_discrete_step(x: Array, u: Array) -> Array:
    """True plant dynamics (discrete)."""
    return _A32 @ x + _B32 @ u + 0.08 * jnp.tanh(x)


def linearized_discrete_system():
    """Jacobian linearization at the origin equilibrium as a constrained
    linear system (the 'linear_regressor' fixture analogue)."""
    from ..systems import LinearDiscreteSystem

    A_lin = A + 0.08 * np.eye(NX)  # d tanh/dx at 0 = I
    return LinearDiscreteSystem(
        A=jnp.asarray(A_lin, jnp.float32),
        B=_B32,
        X=X_BOX,
        U=U_BOX,
    )


def stabilizing_gain() -> np.ndarray:
    """LQR gain for closed-loop data collection (u = -K x + noise): an
    unstable plant cannot be excited open loop."""
    import scipy.linalg as sla

    A_lin = A + 0.08 * np.eye(NX)
    P = sla.solve_discrete_are(A_lin, B, np.eye(NX), np.eye(NU))
    return np.linalg.solve(1.0 + B.T @ P @ B, B.T @ P @ A_lin)


def generate_dataset(
    n_traj: int = 64, n_steps: int = 30, seed: int = 0
) -> Tuple[Array, Array, Array]:
    """Closed-loop one-step transition dataset (x, u, x+): LQR feedback
    keeps trajectories bounded, uniform exploration noise excites the
    off-equilibrium dynamics the models must learn."""
    rng = np.random.default_rng(seed)
    K = stabilizing_gain()
    x = jnp.asarray(
        rng.uniform(-1.5, 1.5, (n_traj, NX)).astype(np.float32)
    )
    noise = rng.uniform(-2.0, 2.0, (n_traj, n_steps, NU)).astype(np.float32)
    K32 = jnp.asarray(K, jnp.float32)
    step = jax.jit(jax.vmap(unstable_discrete_step))
    xs, us, xns = [], [], []
    for k in range(n_steps):
        u = jnp.clip(
            -x @ K32.T + jnp.asarray(noise[:, k]), U_BOX.lo, U_BOX.hi
        )
        xn = jnp.clip(step(x, u), X_BOX.lo, X_BOX.hi)
        xs.append(x)
        us.append(u)
        xns.append(xn)
        x = xn
    return jnp.concatenate(xs), jnp.concatenate(us), jnp.concatenate(xns)


def trained_system(family: str, data, **kw):
    """Train a zoo family on the unstable plant and wrap it as a
    constrained NeuralDiscreteSystem."""
    from ..models import zoo
    from ..systems import NeuralDiscreteSystem
    from .training import train_family

    kw.setdefault("hidden", 8)
    kw.setdefault("steps", 600)
    apply_fn, params, rmse = train_family(
        family, data, nx=NX, nu=NU, sample_time=SAMPLE_TIME, **kw
    )
    _, act = zoo.make_apply(family, kw.get("activation"))
    sys = NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=NX, nu=NU, params=params,
        X=X_BOX, U=U_BOX, activation=act,
    )
    return sys, rmse
