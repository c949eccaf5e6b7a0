"""Pallas-fused ADMM kernel vs the reference jax engine (interpret mode on
the CPU test mesh; the real Mosaic compile runs in bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import parallel
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp


@pytest.fixture(scope="module")
def controller():
    sys = qtp.linearized_discrete_system()
    return mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )


def _x0s(B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.clip(0.65 + 0.1 * rng.standard_normal((B, 4)), 0.3, 1.3), jnp.float32
    )


def test_fused_matches_reference_engine(controller):
    x0s = _x0s(8)
    sol_ref, _, _, diag_ref = parallel.solve_batch(controller, x0s)
    sol_f, _, _, diag_f = parallel.solve_batch_fused(controller, x0s)
    assert int(diag_f.n_converged) == 8
    np.testing.assert_allclose(
        np.asarray(sol_f.u), np.asarray(sol_ref.u), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.x), np.asarray(sol_ref.x), atol=5e-4
    )


def test_fused_non_multiple_of_8_batch(controller):
    # regression (advisor r4): B % 8 != 0 previously hit a trace-time
    # "no block size fits VMEM" ValueError; the driver now pads to a
    # multiple of 8 and slices back.
    x0s = _x0s(13, seed=7)
    sol_ref, _, _, _ = parallel.solve_batch(controller, x0s)
    sol_f, wz, wy, diag_f = parallel.solve_batch_fused(controller, x0s)
    assert sol_f.u.shape[0] == 13 and wz.shape[0] == 13 and wy.shape[0] == 13
    assert int(diag_f.n_converged) == 13
    np.testing.assert_allclose(
        np.asarray(sol_f.u), np.asarray(sol_ref.u), atol=5e-4
    )


def test_mixed_kernel_matches_reference_engine():
    """r5 mixed kernel (diagonal box block + dense state rows): parity with
    the vmapped engine on state-constrained and terminal-row configs."""
    sys = qtp.linearized_discrete_system()
    x0s = _x0s(8, seed=11)
    for kwargs in (
        dict(mpc_state_constraint=True),
        dict(mpc_state_constraint=True, mpc_terminal_ingredient="neighborhood"),
    ):
        c = mpc.proceed_controller(
            sys, "model_predictive_control", 10, 5.0, np.full(4, 0.65),
            np.full(2, 1.2), **kwargs,
        )
        assert c.engine.op.mixed_a
        sol_f, _, _, df = parallel.solve_batch_fused(c, x0s)
        sol_v, _, _, dv = parallel.solve_batch(c, x0s)
        # borderline lanes near the iteration budget may certify on one
        # path and not the other (round-off ordering); the kernel must not
        # LOSE lanes, and commonly-converged lanes must agree
        assert int(df.n_converged) >= int(dv.n_converged)
        both = (np.asarray(sol_f.status) == 0) & (np.asarray(sol_v.status) == 0)
        assert both.sum() >= 4
        np.testing.assert_allclose(
            np.asarray(sol_f.u)[both], np.asarray(sol_v.u)[both], atol=5e-4
        )


def test_fused_warm_start(controller):
    x0s = _x0s(8, seed=1)
    sol1, wz, wy, d1 = parallel.solve_batch_fused(controller, x0s)
    sol2, _, _, d2 = parallel.solve_batch_fused(controller, x0s, wz, wy)
    assert float(d2.mean_iterations) <= float(d1.mean_iterations)
    assert int(d2.n_converged) == 8


def test_fused_rejects_contractive(controller):
    sys = qtp.linearized_discrete_system()
    c = mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2),
        mpc_terminal_ingredient="contractive",
    )
    with pytest.raises(ValueError, match="ball rows"):
        parallel.solve_batch_fused(c, _x0s(8))


def test_fused_fits_vmem_boundaries():
    """The VMEM viability gate behind the routing rule: small problems
    fit, h200-class condensed problems (n=m=400, R=5) do not leave a
    useful block and must be excluded from the fused default (they failed
    at runtime before r4's gate)."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops import admm_pallas

    assert admm_pallas.fused_fits(40, 40, 2, 0)  # headline shape
    assert admm_pallas.fused_fits(200, 200, 5, 1)  # h100 default grid
    assert not admm_pallas.fused_fits(400, 400, 5, 1)  # h200: no block
    # _pick_block returns 0 (not the whole batch) when nothing fits
    assert admm_pallas._pick_block(4096, 1600, 1600, 5, 1) == 0


def test_kernel_precision_bf16x3_accurate_but_uncertified():
    """Pins the measured r4 precision-lever finding (TPU v5e, headline
    config): bf16x3 kernel dots produce control sequences close to the
    HIGHEST solution, but the residual floor sits above the 1e-6
    certificate — the honest gate must NOT report converged lanes as if
    nothing changed. Run at a modest shape so the interpret path stays
    fast; the convergence claim is asserted loosely (floor behavior is
    hardware-dependent, the accuracy claim is not)."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    sys = qtp.linearized_discrete_system()
    mk = lambda mode: mpc.proceed_controller(
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65),
        np.full(2, 1.2), engine="condensed",
        admm_config=AdmmConfig(max_iter=200, rho=1.0, rho_grid=(1.0, 10.0),
                               refine_steps=0, kernel_precision=mode),
    )
    x0s = _x0s(8, seed=5)
    sol_hi, _, _, _ = parallel.solve_batch_fused(mk("highest"), x0s)
    sol_b3, _, _, _ = parallel.solve_batch_fused(mk("bf16x3"), x0s)
    # iterates agree to ~1e-3 even where certification differs
    np.testing.assert_allclose(
        np.asarray(sol_b3.u), np.asarray(sol_hi.u), atol=5e-3
    )


def test_fused_perr_path_matches_reference_engine():
    """Large-n problems route to the per-rho kernel variant (the packed
    blockdiag operator would exceed VMEM); results must match the jax
    engine the same way the packed path does."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops import admm_pallas

    sys = qtp.linearized_discrete_system()
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    c = mpc.proceed_controller(
        sys, "model_predictive_control", 70, 5.0,
        np.full(4, 0.65), np.full(2, 1.2), engine="condensed",
        admm_config=AdmmConfig(max_iter=2000, refine_steps=1),
    )
    n = c.engine.op.A_s.shape[1]
    m = c.engine.op.A_s.shape[0]
    R = int(c.engine.op.rho_grid.shape[0])
    assert not admm_pallas._use_packed(n, m, R)  # exercises the per-r path
    x0s = _x0s(8, seed=3)
    sol_ref, _, _, _ = parallel.solve_batch(c, x0s)
    sol_f, _, _, diag_f = parallel.solve_batch_fused(c, x0s)
    assert int(diag_f.n_converged) == 8
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u), atol=5e-4)
