"""Parallel layer: vmap batching + shard_map over the 8-device CPU mesh
(SURVEY §2.10: all-new TPU-native surface; no reference counterpart)."""

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
        sys, "model_predictive_control", 5, 5.0, np.full(4, 0.65), np.full(2, 1.2)
    )


def _x0_batch(B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(0.6 + 0.05 * rng.standard_normal((B, 4)), jnp.float32)


def test_solve_batch_matches_single(controller):
    x0s = _x0_batch(4)
    sol, wz, wy, diag = parallel.solve_batch(controller, x0s)
    assert sol.u.shape == (4, 2, 5)
    assert int(diag.n_total) == 4
    assert int(diag.n_converged) == 4
    # lane 2 equals a single solve at the same x0
    single, _, _ = mpc.solve_once(
        controller, x0s[2], controller.warm_z, controller.warm_y
    )
    np.testing.assert_allclose(
        np.asarray(sol.u[2]), np.asarray(single.u), atol=2e-4
    )


def test_solve_sharded_matches_batch(controller):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = parallel.make_mesh(8)
    x0s = _x0_batch(16)
    sol_s, _, _, diag_s = parallel.solve_sharded(controller, x0s, mesh)
    sol_b, _, _, diag_b = parallel.solve_batch(controller, x0s)
    np.testing.assert_allclose(
        np.asarray(sol_s.u), np.asarray(sol_b.u), atol=2e-4
    )
    assert int(diag_s.n_total) == 16
    assert int(diag_s.n_converged) == int(diag_b.n_converged)


def test_sharded_batch_size_check(controller):
    mesh = parallel.make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        parallel.solve_sharded(controller, _x0_batch(10), mesh)


def test_closed_loop_batch_tracks(controller):
    x0s = _x0_batch(3, seed=1)
    xs, us, statuses = parallel.closed_loop_batch(
        controller, lambda x, u: qtp.qtp_discrete_step(x, u), x0s, n_steps=8
    )
    assert xs.shape == (9, 3, 4)
    assert us.shape == (8, 3, 2)
    # every lane moves toward the setpoint (reference tolerance atol=0.5)
    err0 = np.abs(np.asarray(xs[0]) - 0.65).max()
    errN = np.abs(np.asarray(xs[-1]) - 0.65).max()
    assert errN < max(0.5, err0)


def test_warm_start_carry_improves(controller):
    x0s = _x0_batch(4, seed=2)
    sol1, wz, wy, d1 = parallel.solve_batch(controller, x0s)
    sol2, _, _, d2 = parallel.solve_batch(controller, x0s, wz, wy)
    assert float(d2.mean_iterations) <= float(d1.mean_iterations)


@pytest.fixture(scope="module")
def riccati_controller():
    sys = qtp.linearized_discrete_system()
    return mpc.proceed_controller(
        sys, "model_predictive_control", 8, 5.0, np.full(4, 0.65),
        np.full(2, 1.2), engine="riccati",
    )


def test_fused_supported_dispatch(controller, riccati_controller):
    # the module fixture is h5 with the DEFAULT wide-grid + refined config
    # (R=5, refine=1) on a diag operator: inside the audited small-n vmap
    # band (r5 routing audit). The lean variant routes fused.
    assert not parallel.fused_supported(controller)
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    lean = mpc.proceed_controller(
        qtp.linearized_discrete_system(), "model_predictive_control", 5, 5.0,
        np.full(4, 0.65), np.full(2, 1.2),
        admm_config=AdmmConfig(rho=1.0, rho_grid=(1.0, 10.0), refine_steps=0),
    )
    assert parallel.fused_supported(lean)
    # the Riccati engine defaults to its (measured-faster) vmapped path;
    # the Pallas kernel stays reachable via solve_batch_fused / fused=True
    assert not parallel.fused_supported(riccati_controller)
    soft = mpc.proceed_controller(
        qtp.linearized_discrete_system(), "model_predictive_control", 5, 5.0,
        np.full(4, 0.65), np.full(2, 1.2), mpc_soft_state_constraint=10.0,
    )
    assert not parallel.fused_supported(soft)


def test_fused_routing_shape_aware():
    """The measured routing carve-out (TPU v5e table in fused_supported):
    wide-grid + refined configs in the mid-size band route to the vmapped
    engine; lean grids and sizes outside the band stay on the fused
    kernel. solve_batch_auto follows the rule and keeps the solve_batch
    contract."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    sys = qtp.linearized_discrete_system()
    mk = lambda N, cfg: mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, np.full(4, 0.65),
        np.full(2, 1.2), engine="condensed", admm_config=cfg,
    )
    wide = AdmmConfig(max_iter=200)  # R=5 grid, refine_steps=1
    lean = AdmmConfig(max_iter=200, rho=1.0, rho_grid=(1.0, 10.0),
                      refine_steps=0)
    # diagonal-A (box-only) operators run the v3 transposed kernel with
    # their own audited band (r5 routing audit): wide-grid+refined configs
    # route to vmap at n<=64, fused above; lean configs are always fused
    c_diag_band = mk(20, wide)  # n=40, R=5/refine=1 -> audited vmap win
    assert c_diag_band.engine.op.diag_a
    assert not parallel.fused_supported(c_diag_band)
    assert parallel.fused_supported(mk(20, lean))  # lean diag: fused
    assert parallel.fused_supported(mk(50, wide))  # n=100 diag: fused
    mk_sc = lambda N, cfg: mpc.proceed_controller(
        sys, "model_predictive_control", N, 5.0, np.full(4, 0.65),
        np.full(2, 1.2), engine="condensed", admm_config=cfg,
        mpc_state_constraint=True,
    )
    # state-constrained operators are MIXED (diagonal box block + dense
    # state rows) and run the r5 transposed mixed kernel — measured fused
    # wins 2.2x over vmap at the old band's shapes, so they route fused
    c_mixed = mk_sc(20, wide)
    assert c_mixed.engine.op.mixed_a and not c_mixed.engine.op.diag_a
    assert parallel.fused_supported(c_mixed)
    assert parallel.fused_supported(mk_sc(50, wide))
    assert parallel.fused_supported(mk_sc(5, wide))

    # a vmap-routed case still honors the solve_batch contract through the
    # auto path (diag wide-grid+refined at small n routes vmap)
    x0s = _x0_batch(4, seed=3)
    sol_a, wz_a, wy_a, diag = parallel.solve_batch_auto(c_diag_band, x0s)
    sol_v, wz_v, wy_v, _ = parallel.solve_batch(c_diag_band, x0s)
    assert int(diag.n_total) == 4
    np.testing.assert_array_equal(np.asarray(sol_a.u), np.asarray(sol_v.u))
    np.testing.assert_array_equal(np.asarray(wy_a), np.asarray(wy_v))


def test_riccati_fused_batch_matches_vmap(riccati_controller):
    x0s = _x0_batch(8)
    sol_v, wz_v, wy_v, d_v = parallel.solve_batch(riccati_controller, x0s)
    sol_f, wz_f, wy_f, d_f = parallel.solve_batch_fused(riccati_controller, x0s)
    assert int(d_f.n_converged) == int(d_v.n_converged) == 8
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_v.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wz_f), np.asarray(wz_v), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wy_f), np.asarray(wy_v), atol=1e-3)


@pytest.mark.slow
def test_riccati_sharded_fused(riccati_controller):
    """The Riccati engine's fused Pallas kernel still runs inside shard_map
    when requested explicitly (the vmapped engine is the measured-faster
    default — see fused_supported)."""
    mesh = parallel.make_mesh(8)
    x0s = _x0_batch(16, seed=3)
    sol_s, _, _, diag_s = parallel.solve_sharded(
        riccati_controller, x0s, mesh, fused=True
    )
    sol_b, _, _, _ = parallel.solve_batch_fused(riccati_controller, x0s)
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_b.u), atol=2e-4)
    assert int(diag_s.n_total) == 16
    assert int(diag_s.n_converged) == 16


@pytest.mark.slow
def test_condensed_sharded_fused_matches_general(controller):
    """The condensed engine's sharded path also rides the fused kernel by
    default and must agree with the general engine."""
    mesh = parallel.make_mesh(8)
    x0s = _x0_batch(16, seed=4)
    sol_f, _, _, d_f = parallel.solve_sharded(controller, x0s, mesh, fused=True)
    sol_g, _, _, d_g = parallel.solve_sharded(controller, x0s, mesh, fused=False)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_g.u), atol=5e-4)
    assert int(d_f.n_converged) == 16


def test_escalated_solver_closes_tail():
    """Two-tier fleet solve: a deliberately starved fused config leaves
    MAX_ITER stragglers; make_escalated_solver re-dispatches exactly those
    lanes to the full-rho-grid fallback and the merged batch converges
    (VERDICT r1 item 7: kill the non-converged tail)."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    sys = qtp.linearized_discrete_system()
    starved = mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0,
        np.full(4, 0.65), np.full(2, 1.2),
        admm_config=AdmmConfig(max_iter=30, rho=100.0, rho_grid=(100.0,)),
    )
    x0s = _x0_batch(32, seed=7)
    _, _, _, diag0 = parallel.solve_batch_fused(starved, x0s)
    assert int(diag0.n_max_iter) > 0, "config must actually starve some lanes"

    esc = parallel.make_escalated_solver(starved)
    sol, wz, wy, diag = esc(x0s)
    assert int(diag.n_converged) == 32
    assert int(diag.n_max_iter) == 0
    # escalated lanes agree with a full fallback-controller solve
    fb = parallel.escalation_controller(starved)
    sol_fb, _, _, _ = parallel.solve_batch(fb, x0s)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_fb.u), atol=5e-4)


def test_escalated_solver_noop_when_converged(controller):
    """No stragglers -> the fast-pass result is returned unchanged."""
    x0s = _x0_batch(8, seed=8)
    esc = parallel.make_escalated_solver(controller)
    sol, _, _, diag = esc(x0s)
    sol_f, _, _, diag_f = parallel.solve_batch_fused(controller, x0s)
    # (atol: the solver's own jit and the test's separately-jitted call can
    # fuse differently at f32)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_f.u), atol=1e-5)
    assert int(diag.n_converged) == int(diag_f.n_converged) == 8


def test_roofline_model_sanity(controller):
    """Roofline accounting: analytic flops/bytes model is positive, padded
    >= useful, and sol_fraction scales inversely with measured time."""
    from automationlabsmodelpredictivecontrol_jl_tpu.utils import roofline

    op = controller.engine.op
    cfg = controller.engine.config
    it = roofline.admm_iteration_model(
        int(op.K_invs.shape[1]), int(op.A_s.shape[0]), int(op.rho_grid.shape[0])
    )
    assert it["padded_flops"] >= it["useful_flops"] > 0
    r1 = roofline.speed_of_light(op, cfg, 256, 50.0, 0.1)
    r2 = roofline.speed_of_light(op, cfg, 256, 50.0, 0.2)
    assert r1["sol_fraction"] == pytest.approx(2 * r2["sol_fraction"])
    assert r1["bound"] in ("mxu", "hbm")
    assert r1["mfu"] > 0


def test_escalated_native_tier():
    """Tier 3: when even the fallback engine stalls, stragglers cross to
    the host f64 native oracle and come back converged."""
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    sys = qtp.linearized_discrete_system()
    starved = mpc.proceed_controller(
        sys, "model_predictive_control", 10, 5.0,
        np.full(4, 0.65), np.full(2, 1.2),
        admm_config=AdmmConfig(max_iter=30, rho=100.0, rho_grid=(100.0,)),
    )
    x0s = _x0_batch(16, seed=9)
    # fallback == the starved controller itself: tier 2 cannot converge, so
    # every straggler must ride the native tier
    esc = parallel.make_escalated_solver(starved, fallback=starved)
    sol, wz, wy, diag = esc(x0s)
    assert int(diag.n_converged) == 16
    # native-tier lanes agree with the full-grid jax engine
    fb = parallel.escalation_controller(starved)
    sol_fb, _, _, _ = parallel.solve_batch(fb, x0s)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_fb.u), atol=1e-3)
