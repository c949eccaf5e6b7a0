"""Observability surface: roofline accounting + latency statistics.

The reference's entire profiling story is wall-clock prints
(/root/reference/test/runtests.jl:10-18); SURVEY §5 and BASELINE.md make
per-kernel speed-of-light accounting new first-class surface here. These
tests pin the analytic model's invariants so the numbers bench.py reports
stay defensible.
"""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig
from automationlabsmodelpredictivecontrol_jl_tpu.utils import profiling, roofline


def _controller(N=20):
    return mpc.proceed_controller(
        qtp.linearized_discrete_system(), "model_predictive_control",
        N, 5.0, np.full(4, 0.65, np.float32), np.full(2, 1.2, np.float32),
        admm_config=AdmmConfig(max_iter=100),
    )


def test_speed_of_light_report_invariants():
    c = _controller()
    rep = roofline.speed_of_light(
        c.engine.op, c.engine.config, batch=512,
        mean_iterations=80.0, measured_time_s=0.01,
    )
    assert rep["bound"] in ("mxu", "hbm")
    assert 0.0 < rep["sol_fraction"]
    assert rep["roofline_time_s"] > 0.0
    # padded flops are an upper bound on useful flops (tile padding)
    assert rep["achieved_padded_tflops"] >= rep["achieved_useful_tflops"] > 0
    # mfu is the useful-flops utilization: never above SOL fraction
    assert rep["mfu"] <= rep["sol_fraction"] + 1e-12


def test_speed_of_light_scales_with_time():
    """Half the measured time -> double the achieved flop/s and SOL."""
    c = _controller()
    r1 = roofline.speed_of_light(c.engine.op, c.engine.config, 512, 80.0, 0.02)
    r2 = roofline.speed_of_light(c.engine.op, c.engine.config, 512, 80.0, 0.01)
    np.testing.assert_allclose(r2["sol_fraction"], 2 * r1["sol_fraction"], rtol=1e-9)
    np.testing.assert_allclose(
        r2["achieved_padded_tflops"], 2 * r1["achieved_padded_tflops"], rtol=1e-9
    )


def test_device_peaks_known_and_unknown():
    peaks = roofline.device_peaks()  # current device (cpu "host" fallback)
    assert peaks["f32_highest_flops"] > 0
    assert peaks["hbm_bytes_per_s"] > 0


def test_latency_benchmark_stats():
    c = _controller(N=5)
    from automationlabsmodelpredictivecontrol_jl_tpu.runtime import solve_once

    x0 = jnp.asarray([0.6] * 4, jnp.float32)
    f = jax.jit(lambda: solve_once(c, x0, c.warm_z, c.warm_y)[0].u)
    stats = profiling.benchmark(f, warmup=1, reps=5)
    assert stats["p50_ms"] > 0
    assert stats["p99_ms"] >= stats["p50_ms"]
    assert profiling.solve_rate(32, stats) > 0
