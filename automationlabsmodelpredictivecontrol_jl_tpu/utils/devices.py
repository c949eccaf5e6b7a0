"""Device-placement helpers.

Controller *design* is a host-side, once-per-controller phase (the analogue
of the reference's JuMP model build, SURVEY §3.1): dozens of small eager ops.
On an interactive TPU attachment every eager op is a round-trip dispatch —
so design runs pinned to the in-process CPU backend and the finished operator
pytree is transferred to the accelerator once, by the first jitted solve.
"""

from __future__ import annotations

import contextlib

import jax


def cpu_device():
    """The first CPU device, or None if no CPU backend is registered."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def design_scope():
    """Context manager pinning eager computation to the CPU backend.

    No-op when the default backend already is the CPU (tests) or when no
    CPU backend exists.
    """
    dev = cpu_device()
    if dev is None or jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    return jax.default_device(dev)
