"""Virtual-mesh weak-scaling harness (BASELINE ≥0.8 scaling efficiency).

The reference has no parallelism of any kind (SURVEY.md §2.10); multi-device
scaling is new TPU-native surface. Real multi-chip hardware isn't available
in this environment, so this harness measures the *sharded program's* weak
scaling on a virtual 8-device CPU mesh (``xla_force_host_platform_device_count``):
per-device work is held fixed (the same x0 block replicated to every device),
the scenario axis is sharded via ``shard_map``, and diagnostics ride psum
collectives — the exact program the driver's ``dryrun_multichip`` validates
and that a real pod slice would run over ICI.

Two efficiencies are reported per mesh size:

- ``scaling_efficiency`` = throughput(n) / (n · throughput(1)) — classic
  weak scaling. On a virtual CPU mesh the "devices" share host cores
  (this box has very few), so this number is dominated by core
  starvation, NOT by sharding overhead; it is reported for completeness
  but is meaningless as an ICI prediction once n exceeds the core count.
- ``sharding_overhead_efficiency`` = throughput(sharded, n devices) /
  throughput(unsharded single-device program, same total batch). Both
  programs contend for the same host cores, so the ratio mostly reflects
  what sharding itself costs (shard_map partitioning + psum collectives +
  per-shard dispatch). On a VIRTUAL mesh the raw ratio often lands well
  above 1.0 (r4 artifact: 1.17-1.91) — not timing noise alone: each
  virtual CPU device gets its own XLA execution thread, so the sharded
  program exploits more host parallelism than the single-device control.
  That is an artifact of emulating devices on one host, impossible on
  real chips (each chip is saturated either way), which is exactly why
  the reported value is clamped at 1.0.
  The reported value is clamped to 1.0 and carries a measured noise band
  (``noise_band`` = spread over repeats of the unsharded control); treat
  "≈1.0 within the band" as "sharding overhead below measurement noise",
  not as a precise ICI-efficiency prediction — real ≥2-host DCN numbers
  need real hardware (BASELINE's ≥0.8 row).

Must run in its own process (device-count flags are read at backend init):
``python benchmarks_scaling.py [out.json]``. benchmarks_suite.py invokes it
via subprocess and merges the rows into BENCH_SUITE.json.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402

# sitecustomize may force a TPU plugin pre-import (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import automationlabsmodelpredictivecontrol_jl_tpu as mpc  # noqa: E402
from automationlabsmodelpredictivecontrol_jl_tpu import parallel  # noqa: E402
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp  # noqa: E402
from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig  # noqa: E402

PER_DEVICE_BATCH = 512
HORIZON = 20
REPS = 3


def _timeit(fn, reps=REPS):
    out = fn()
    jax.block_until_ready(out)  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main(out_path="BENCH_SCALING.json"):
    rng = np.random.default_rng(0)
    controller = mpc.proceed_controller(
        qtp.linearized_discrete_system(),
        "model_predictive_control",
        HORIZON,
        qtp.SAMPLE_TIME,
        np.full(4, 0.65, np.float32),
        np.full(2, 1.2, np.float32),
        # fixed-budget, single-rho config: every lane does identical work, so
        # throughput differences between mesh sizes isolate sharding overhead
        admm_config=AdmmConfig(max_iter=200, adaptive=False, rho_grid=(10.0,)),
    )
    block = np.clip(
        0.65 + 0.15 * rng.standard_normal((PER_DEVICE_BATCH, 4)), 0.25, 1.3
    ).astype(np.float32)

    host_cores = os.cpu_count() or 1
    rows = []
    base_tput = None
    for n_dev in (1, 2, 4, 8):
        mesh = parallel.make_mesh(n_dev)
        B = PER_DEVICE_BATCH * n_dev
        # identical per-device work: the same x0 block on every device
        x0s = jnp.asarray(np.tile(block, (n_dev, 1)))
        wz, wy = parallel.init_warm_batch(controller, B)
        solve = jax.jit(
            lambda x, z, y, m=mesh: parallel.solve_sharded(
                controller, x, m, z, y
            )
        )
        dt, (sol, _, _, diag) = _timeit(lambda: solve(x0s, wz, wy))
        tput = B / dt
        if base_tput is None:
            base_tput = tput
        eff = tput / (n_dev * base_tput)

        # unsharded control: the same total batch through the plain fused
        # batch solve on device 0 — same host cores, no shard_map/psum.
        # tput/tput_unsharded isolates pure sharding overhead (see header).
        solve_u = jax.jit(
            lambda x, z, y: parallel.solve_batch_fused(controller, x, z, y)
        )
        dts_u = [_timeit(lambda: solve_u(x0s, wz, wy))[0] for _ in range(3)]
        dt_u = float(np.median(dts_u))
        raw_shard_eff = dt_u / dt  # = tput / tput_unsharded
        # clamp at 1.0: >1 means the control program's timing noise exceeds
        # the sharding overhead, not that sharding speeds up same-core work
        shard_eff = min(raw_shard_eff, 1.0)
        noise_band = (max(dts_u) - min(dts_u)) / dt_u

        rows.append(
            {
                "metric": f"weak_scaling_virtual_mesh_{n_dev}dev",
                "value": round(tput, 1),
                "unit": "solves/s",
                "extras": {
                    "devices": n_dev,
                    "per_device_batch": PER_DEVICE_BATCH,
                    "horizon": HORIZON,
                    "scaling_efficiency": round(eff, 3),
                    "sharding_overhead_efficiency": round(shard_eff, 3),
                    "sharding_overhead_efficiency_raw": round(raw_shard_eff, 3),
                    "noise_band": round(noise_band, 3),
                    "unsharded_solves_per_sec": round(B / dt_u, 1),
                    "host_cores": host_cores,
                    "core_starved": n_dev > host_cores,
                    "converged_fraction": round(int(diag.n_converged) / B, 4),
                    "mesh_backend": "cpu-virtual",
                },
            }
        )
        print(json.dumps(rows[-1]))

    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main(*sys.argv[1:2])
