"""Training harness for QTP model fixtures.

The reference ships MLJ-serialized *trained* QTP models for every learned
family and its solve suite exercises them end-to-end (closed-loop tracking
+ cross-method consistency, /root/reference/test/computation_mpc_test.jl:
152-169, 970-1054; fixtures listed at modeler_implementation_test.jl:30).
Those binary fixtures are stripped from this mirror, so this module
reproduces them from first principles: excite the true QTP plant
(benchmarks/qtp.py), collect one-step transitions, and fit each zoo family
by Adam on the one-step MSE — small nets, seconds per family on CPU.

Used by tests/test_closed_loop_families.py (the per-family trained-fixture
closed-loop matrix) and available to users as the fixture-generation
recipe the reference never published.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import zoo
from ..systems import NeuralDiscreteSystem
from . import qtp

Array = Any


def generate_qtp_dataset(
    n_traj: int = 64,
    n_steps: int = 40,
    seed: int = 0,
    input_hold: int = 4,
) -> Tuple[Array, Array, Array]:
    """One-step transition dataset (x_k, u_k, x_{k+1}) of the true plant.

    Random initial levels inside the state box, piecewise-constant random
    pump flows inside the input box (held ``input_hold`` samples — the
    standard excitation for slow tank dynamics). Returns float32 arrays of
    shape (n_traj * n_steps, {4, 2, 4}).
    """
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0.25, 1.25, (n_traj, 4)).astype(np.float32)
    n_holds = (n_steps + input_hold - 1) // input_hold
    u_holds = rng.uniform(
        [0.0, 0.0], [4.0, 3.26], (n_traj, n_holds, 2)
    ).astype(np.float32)
    u_seq = np.repeat(u_holds, input_hold, axis=1)[:, :n_steps]

    step = jax.jit(jax.vmap(lambda x, u: qtp.qtp_discrete_step(x, u)))
    xs, us, xns = [], [], []
    x = jnp.asarray(x0)
    for k in range(n_steps):
        u = jnp.asarray(u_seq[:, k])
        xn = step(x, u)
        # keep levels physical (the true plant saturates at empty/overflow)
        xn = jnp.clip(xn, 0.05, 1.4)
        xs.append(x)
        us.append(u)
        xns.append(xn)
        x = xn
    X = jnp.concatenate(xs)
    U = jnp.concatenate(us)
    XN = jnp.concatenate(xns)
    return X, U, XN


def train_family(
    family: str,
    data: Tuple[Array, Array, Array],
    hidden: int = 8,
    depth: int = 1,
    steps: int = 600,
    lr: float = 5e-3,
    seed: int = 0,
    activation: str = None,
    nx: int = 4,
    nu: int = 2,
    sample_time: float = qtp.SAMPLE_TIME,
) -> Tuple[Callable, Any, float]:
    """Fit one zoo family to the transition dataset by full-batch Adam.

    Returns (apply_fn, trained params, final one-step RMSE). The integrator
    families (neuralode / rknn*) get dt = ``sample_time`` so the learned
    vector field is in physical units. Defaults are the QTP fixture shapes;
    pass (nx, nu, sample_time) for other plants (benchmarks/unstable.py).
    """
    X, U, XN = data
    key = jax.random.PRNGKey(seed)
    apply_fn, params = zoo.init_model(
        family, key, nx, nu, hidden=hidden, depth=depth,
        activation=activation, sample_time=sample_time,
    )
    batched = jax.vmap(apply_fn, in_axes=(None, 0, 0))

    def loss_fn(p):
        pred = batched(p, X, U)
        return jnp.mean((pred - XN) ** 2)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def update(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    loss = jnp.inf
    for _ in range(steps):
        params, opt_state, loss = update(params, opt_state)
    return apply_fn, params, float(jnp.sqrt(loss))


def trained_system(
    family: str,
    data: Tuple[Array, Array, Array],
    hidden: int = 8,
    depth: int = 1,
    steps: int = 600,
    lr: float = 5e-3,
    seed: int = 0,
    activation: str = None,
) -> Tuple[NeuralDiscreteSystem, float]:
    """Train a family and wrap it as a constrained NeuralDiscreteSystem on
    the QTP boxes — the stand-in for the reference's .jls fixture load
    (modeler_implementation_test.jl:30-62)."""
    apply_fn, params, rmse = train_family(
        family, data, hidden=hidden, depth=depth, steps=steps, lr=lr,
        seed=seed, activation=activation,
    )
    _, act = zoo.make_apply(family, activation)
    sys = NeuralDiscreteSystem(
        apply_fn=apply_fn, family=family, nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX, activation=act,
    )
    return sys, rmse
