"""Controller checkpoint / resume (aux subsystem the reference lacks,
SURVEY §5 checkpoint/resume)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.io import load_controller, save_controller


def test_linear_roundtrip(tmp_path):
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2),
        mpc_terminal_ingredient="contractive",
    )
    c, sol = mpc.step(c, jnp.full(4, 0.62))  # accumulate warm state
    path = os.path.join(tmp_path, "ctrl.npz")
    save_controller(path, c)
    c2 = load_controller(path)
    assert c2.tuning.horizon == 5
    assert c2.tuning.terminal.kind == "contractive"
    np.testing.assert_allclose(np.asarray(c2.warm_z), np.asarray(c.warm_z))
    # resumed controller produces the same next solution
    _, sol_a = mpc.step(c, jnp.full(4, 0.63))
    _, sol_b = mpc.step(c2, jnp.full(4, 0.63))
    np.testing.assert_allclose(np.asarray(sol_b.u), np.asarray(sol_a.u), atol=1e-5)


def test_neural_roundtrip(tmp_path):
    apply_fn, params = mpc.init_model("resnet", jax.random.PRNGKey(0), 4, 2,
                                      hidden=8, depth=2)
    sys = mpc.NeuralDiscreteSystem(
        apply_fn=apply_fn, family="resnet", nx=4, nu=2, params=params,
        X=qtp.X_BOX, U=qtp.U_BOX,
    )
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )
    c, sol = mpc.step(c, jnp.full(4, 0.6))
    path = os.path.join(tmp_path, "neural.npz")
    save_controller(path, c)
    c2 = load_controller(path)
    assert c2.system.family == "resnet"
    # reconstructed apply matches the original model
    x = jnp.asarray([0.6, 0.7, 0.6, 0.7])
    u = jnp.asarray([1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(c2.system.step(x, u)), np.asarray(sys.step(x, u)), atol=1e-6
    )
    # resumed controller continues identically to the saved one (same warm
    # state -> same SQP trajectory; cold-start comparison would be unfair in
    # a nonconvex problem)
    _, sol_a = mpc.step(c, jnp.full(4, 0.61))
    _, sol_b = mpc.step(c2, jnp.full(4, 0.61))
    np.testing.assert_allclose(np.asarray(sol_b.u), np.asarray(sol_a.u), atol=1e-4)
