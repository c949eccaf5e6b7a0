"""Model zoo: the 10 learned families' shared contract
(reference modeler families, SURVEY §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automationlabsmodelpredictivecontrol_jl_tpu.models.zoo import (
    MODEL_FAMILIES,
    init_model,
    rollout,
)

LEARNED = [f for f in MODEL_FAMILIES if f not in ("linear", "physical")]


@pytest.mark.parametrize("family", LEARNED)
def test_apply_contract(family):
    apply_fn, params = init_model(family, jax.random.PRNGKey(0), 4, 2, hidden=8,
                                  depth=2, sample_time=0.1)
    x = jnp.asarray([0.1, 0.2, -0.1, 0.05])
    u = jnp.asarray([0.3, -0.2])
    out = apply_fn(params, x, u)
    assert out.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("family", LEARNED)
def test_jacfwd_linearization_finite(family):
    nx = 4 if family == "lstm" else 3  # lstm state stacks [h; c]: even dim
    apply_fn, params = init_model(family, jax.random.PRNGKey(1), nx, 2, hidden=8,
                                  depth=1, sample_time=0.1)
    f = lambda x, u: apply_fn(params, x, u)
    A = jax.jacfwd(f, argnums=0)(jnp.zeros(nx), jnp.zeros(2))
    B = jax.jacfwd(f, argnums=1)(jnp.zeros(nx), jnp.zeros(2))
    assert A.shape == (nx, nx) and B.shape == (nx, 2)
    assert bool(jnp.all(jnp.isfinite(A))) and bool(jnp.all(jnp.isfinite(B)))


def test_lstm_needs_even_state():
    with pytest.raises(ValueError):
        init_model("lstm", jax.random.PRNGKey(0), 3, 2)


def test_recurrent_families_are_markov_in_state():
    """rnn/gru/lstm: the recurrent state is the plant state, so two rollouts
    from the same (x, u) agree — no hidden side-state."""
    for family in ("rnn", "gru", "lstm"):
        apply_fn, params = init_model(family, jax.random.PRNGKey(5), 4, 2)
        x = jnp.asarray([0.1, -0.2, 0.3, 0.05])
        u = jnp.asarray([0.5, -0.1])
        a = apply_fn(params, x, u)
        b = apply_fn(params, x, u)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (4,)


def test_rollout_shapes():
    apply_fn, params = init_model("fnn", jax.random.PRNGKey(2), 4, 2, hidden=8)
    us = jnp.zeros((7, 2))
    xs = rollout(apply_fn, params, jnp.zeros(4), us)
    assert xs.shape == (8, 4)


def test_rknn_hierarchy_consistency():
    """rknn1/2/4 integrate the same vector field; for small dt they agree to
    O(dt^2) and rknn4 is closest to the dense neuralode integrator."""
    key = jax.random.PRNGKey(3)
    dt = 0.01
    results = {}
    for fam in ("rknn1", "rknn2", "rknn4", "neuralode"):
        apply_fn, params = init_model(fam, key, 3, 1, hidden=8, depth=1,
                                      sample_time=dt)
        x = jnp.asarray([0.1, -0.2, 0.3])
        u = jnp.asarray([0.5])
        results[fam] = np.asarray(apply_fn(params, x, u))
    d12 = np.abs(results["rknn1"] - results["rknn2"]).max()
    d24 = np.abs(results["rknn2"] - results["rknn4"]).max()
    d4ode = np.abs(results["rknn4"] - results["neuralode"]).max()
    assert d12 < 1e-3  # same field, one Euler step apart at dt=0.01
    assert d24 < d12 + 1e-9
    assert d4ode < 1e-6


def test_icnn_convexity_in_input():
    """ICNN: output components are convex in (x,u) — midpoint test."""
    apply_fn, params = init_model("icnn", jax.random.PRNGKey(4), 2, 1, hidden=16,
                                  depth=2)
    rng = np.random.default_rng(0)
    for _ in range(20):
        za = jnp.asarray(rng.normal(size=3), jnp.float32)
        zb = jnp.asarray(rng.normal(size=3), jnp.float32)
        fa = apply_fn(params, za[:2], za[2:])
        fb = apply_fn(params, zb[:2], zb[2:])
        zm = 0.5 * (za + zb)
        fm = apply_fn(params, zm[:2], zm[2:])
        assert bool(jnp.all(fm <= 0.5 * (fa + fb) + 1e-5))


def test_densenet_width_growth():
    _, params = init_model("densenet", jax.random.PRNGKey(5), 4, 2, hidden=8,
                           depth=3)
    widths = [blk["W"].shape[1] for blk in params["blocks"]]
    assert widths == [8, 16, 24]  # concatenating skips grow the input width
    assert params["W_out"].shape == (4, 32)


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="unknown model family"):
        init_model("transformer", jax.random.PRNGKey(0), 4, 2)
