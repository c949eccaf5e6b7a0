"""Activation registry for the learned-dynamics model zoo.

Parity surface: the reference plucks a Flux activation out of the chain and
registers it with JuMP's autodiff (design_mpc.jl:472-496, fnn/...:121-122).
Here activations are ordinary JAX functions — differentiable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_rbf(x):
    """Radial-basis activation exp(-x^2) (Rbf family)."""
    return jnp.exp(-jnp.square(x))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "swish": jax.nn.swish,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "gaussian": gaussian_rbf,
    "identity": lambda x: x,
}


def get_activation(name: str):
    if callable(name):
        return name
    try:
        return ACTIVATIONS[name]
    except KeyError as e:
        raise ValueError(
            f"unknown activation {name!r}; available: {sorted(ACTIVATIONS)}"
        ) from e
