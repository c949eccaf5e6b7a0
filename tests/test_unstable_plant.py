"""Per-family validation on the open-loop-unstable benchmark plant
(benchmarks/unstable.py) — the adversarial complement to the
self-stabilizing QTP (VERDICT r2: "a second, open-loop-unstable benchmark
plant to stress SQP/terminal ingredients beyond the QTP").

Every learned family is trained on closed-loop data, then an MPC designed
on the LEARNED model must stabilize the TRUE plant from a far-off state —
on this plant a sloppy controller diverges instead of merely tracking
slowly, and multiple shooting is the robust nonlinear transcription."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import parallel
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import unstable
from automationlabsmodelpredictivecontrol_jl_tpu.solvers.sqp import SqpConfig

X_REF = np.zeros(2, np.float32)
U_REF = np.zeros(1, np.float32)
X0 = jnp.asarray([[1.5, -1.0]], jnp.float32)

LEARNED_FAMILIES = (
    "fnn", "icnn", "resnet", "densenet", "rbf",
    "polynet", "neuralode", "rknn1", "rknn2", "rknn4",
)


@pytest.fixture(scope="module")
def dataset():
    return unstable.generate_dataset(n_traj=64, n_steps=30, seed=0)


# the input-convexity constraint fights this plant's sign-indefinite
# dynamics — the icnn needs more capacity/steps to reach the fit gate
FIT_OVERRIDES = {"icnn": {"hidden": 16, "steps": 1500}}


@pytest.fixture(scope="module")
def trained(dataset):
    cache = {}

    def get(family):
        if family not in cache:
            cache[family] = unstable.trained_system(
                family, dataset, **FIT_OVERRIDES.get(family, {})
            )
        return cache[family]

    return get


def _closed_loop(controller, n_steps=15):
    xs, us, statuses = parallel.closed_loop_batch(
        controller, unstable.unstable_discrete_step, X0, n_steps
    )
    return np.asarray(xs[:, 0]), np.asarray(us[:, 0]), np.asarray(statuses[:, 0])


def test_linear_engine_stabilizes():
    sys = unstable.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 10, unstable.SAMPLE_TIME, X_REF, U_REF
    )
    xs, _, statuses = _closed_loop(c)
    assert statuses.max() == 0
    # small residual offset from the tanh curvature the linearization drops
    assert np.abs(xs[-1]).max() < 0.05


@pytest.mark.parametrize("family", LEARNED_FAMILIES)
def test_closed_loop_stabilization(trained, family):
    """Multiple-shooting SQP on the learned model stabilizes the true
    unstable plant; any divergence or dirty status fails."""
    sys, rmse = trained(family)
    assert rmse < 0.1, f"{family} fixture under-trained (rmse {rmse:.4f})"
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 10, unstable.SAMPLE_TIME,
        X_REF, U_REF,
        sqp_config=SqpConfig(shooting="multiple", max_sqp_iter=15),
    )
    xs, us, statuses = _closed_loop(c)
    assert statuses.max() <= 1
    assert np.all(np.isfinite(xs))
    # contraction: final state well inside the starting ball (a learned
    # one-step model keeps a small steady-state offset under plant-model
    # mismatch — offset-free regulation needs integral action; the
    # reference's own closed-loop gate is atol 0.5)
    assert np.abs(xs[-1]).max() < 0.3
    # inputs honored the box throughout
    assert (np.abs(us) <= 8.0 + 1e-4).all()


@pytest.mark.parametrize("family", ("fnn", "resnet", "rknn2"))
def test_cross_method_linear_vs_ms(trained, family):
    """Linear programming (linearize -> condensed QP) and nonlinear
    multiple-shooting agree on this plant too (reference cross-method
    tolerance atol 0.5, computation_mpc_test.jl:152-169)."""
    sys, _ = trained(family)
    c_lin = mpc.proceed_controller(
        sys, "model_predictive_control", 10, unstable.SAMPLE_TIME,
        X_REF, U_REF, mpc_programming_type="linear",
    )
    c_ms = mpc.proceed_controller(
        sys, "model_predictive_control", 10, unstable.SAMPLE_TIME,
        X_REF, U_REF, mpc_programming_type="non_linear",
        sqp_config=SqpConfig(shooting="multiple", max_sqp_iter=15),
    )
    xs_l, us_l, _ = _closed_loop(c_lin, n_steps=10)
    xs_m, us_m, _ = _closed_loop(c_ms, n_steps=10)
    np.testing.assert_allclose(xs_l, xs_m, atol=0.5)
    np.testing.assert_allclose(us_l[0], us_m[0], atol=1.0)
