"""Headline benchmark: batched linear-MPC solves/s/chip at horizon 20.

BASELINE.json north-star config 1/5: QTP (4 states / 2 inputs), horizon 20,
box constraints, condensed-QP ADMM, thousands of scenario solves batched per
chip. Prints ONE JSON line; vs_baseline is the ratio against the 1e4
solves/s/chip target (the reference publishes no numbers — BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import automationlabsmodelpredictivecontrol_jl_tpu as mpc
    from automationlabsmodelpredictivecontrol_jl_tpu import parallel
    from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    HORIZON = 20
    BATCH = 16384
    # Pallas-fused engine, 2-entry rho grid (calibrated on this scenario
    # distribution): ~99.7% convergence at 1e-6; statuses are exact (the
    # driver checks true residuals between fused chunks).
    cfg = AdmmConfig(max_iter=400, rho=1.0, rho_grid=(1.0, 10.0))

    sys = qtp.linearized_discrete_system()
    controller = mpc.proceed_controller(
        sys,
        "model_predictive_control",
        HORIZON,
        qtp.SAMPLE_TIME,
        np.full(4, 0.65, np.float32),
        np.full(2, 1.2, np.float32),
        admm_config=cfg,
    )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.clip(0.65 + 0.15 * rng.standard_normal((BATCH, 4)), 0.25, 1.3),
        jnp.float32,
    )
    wz, wy = parallel.init_warm_batch(controller, BATCH)

    # headline path: the Pallas-fused ADMM kernel (jax engine is the
    # fallback for configs the kernel doesn't cover — ball/soft rows)
    solve = jax.jit(
        lambda x, z, y: parallel.solve_batch_fused(controller, x, z, y)
    )

    # warmup / compile
    sol, wz1, wy1, diag = solve(x0s, wz, wy)
    jax.block_until_ready(sol.u)
    conv = int(diag.n_converged) / BATCH

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        sol, _, _, diag = solve(x0s, wz, wy)
    jax.block_until_ready(sol.u)
    dt = (time.perf_counter() - t0) / reps

    solves_per_sec = BATCH / dt
    # p50/p99 latency of one batched solve (per-solve amortized)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        sol, _, _, _ = solve(x0s, wz, wy)
        jax.block_until_ready(sol.u)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)

    print(
        json.dumps(
            {
                "metric": "linear_mpc_solves_per_sec_per_chip_h20",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 1e4, 3),
                "extras": {
                    "batch": BATCH,
                    "horizon": HORIZON,
                    "converged_fraction": round(conv, 4),
                    "batch_latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
                    "batch_latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
