"""Routing audit: does the auto path pick the measured winner at every N?

Reads the condensed fused/vmap rows from BENCH_SUITE.json (config 6, one
clean run), rebuilds each controller, asks the measured routing rule
(`parallel.fused_supported`) which path `solve_batch_auto`/`solve_sharded`
would take, and records winner-vs-routed per horizon — the r3 verdict's
done criterion "the auto-routed path equals max(fused, vmap) at every N,
and no default route is slower than the alternative it hides".

A mismatch where the hidden alternative is faster by more than the
cross-run drift band (NOISE_BAND below, 15%) fails the audit. Merges a `routing_audit` block into
BENCH_SUITE.json. Run on CPU after benchmarks_suite.py:
``python benchmarks_routing_audit.py``.
"""

import json
import re

# Cross-run (separate-process) readings on the tunneled TPU drift up to
# ~±12% — r4 example at h100: the clean-suite single shots read fused
# 22.8k vs vmap 25.5k, while the trustworthy interleaved same-process
# comparison reads fused 18.4k vs vmap 16.2k (fused wins, 3 rounds
# best-of). The audit therefore only flags a routing loss when the hidden
# alternative's single-shot reading beats the routed path by more than
# this cross-run drift; ties inside it are settled by interleaved
# measurement (recorded in fused_supported's docstring table).
NOISE_BAND = 1.15


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import automationlabsmodelpredictivecontrol_jl_tpu as mpc
    from automationlabsmodelpredictivecontrol_jl_tpu import parallel
    from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
    from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

    with open("BENCH_SUITE.json") as f:
        rows = json.load(f)
    rows = [
        r for r in rows
        if not (isinstance(r, dict) and r.get("metric") == "routing_audit")
    ]  # idempotent re-run

    cond = {}
    for r in rows:
        if isinstance(r, dict) and "metric" in r:
            m = re.match(r"linear_mpc_condensed_(fused|vmap)_h(\d+)$", r["metric"])
            if m:
                cond.setdefault(int(m.group(2)), {})[m.group(1)] = r["value"]

    sys_lin = qtp.linearized_discrete_system()
    audit = []
    ok = True
    for N in sorted(cond):
        paths = cond[N]
        c = mpc.proceed_controller(
            sys_lin, "model_predictive_control", N, 5.0,
            np.full(4, 0.65, np.float32), np.full(2, 1.2, np.float32),
            engine="condensed", admm_config=AdmmConfig(max_iter=1000),
        )
        routed = "fused" if parallel.fused_supported(c) else "vmap"
        if len(paths) < 2:
            entry = dict(horizon=N, routed=routed, measured=paths,
                         verdict="single-path (other not benchmarked)")
            audit.append(entry)
            continue
        winner = max(paths, key=paths.get)
        ratio = paths[winner] / paths[routed]
        good = routed == winner or ratio <= NOISE_BAND
        ok = ok and good
        audit.append(dict(
            horizon=N, routed=routed, winner=winner,
            fused=paths.get("fused"), vmap=paths.get("vmap"),
            hidden_alternative_speedup=round(ratio, 3),
            verdict="ok" if good else "ROUTING LOSS > noise band",
        ))
        print(json.dumps(audit[-1]), flush=True)

    rows.append({
        "metric": "routing_audit", "ok": ok, "noise_band": NOISE_BAND,
        "per_horizon": audit,
    })
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("routing audit:", "OK" if ok else "FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
