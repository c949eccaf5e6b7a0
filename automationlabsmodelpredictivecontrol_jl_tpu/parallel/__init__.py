from .scenarios import (
    SCENARIO_AXIS,
    BatchDiagnostics,
    closed_loop_batch,
    fused_supported,
    init_warm_batch,
    make_mesh,
    solve_batch,
    solve_batch_fused,
    solve_sharded,
)

__all__ = [
    "SCENARIO_AXIS",
    "BatchDiagnostics",
    "closed_loop_batch",
    "fused_supported",
    "init_warm_batch",
    "make_mesh",
    "solve_batch",
    "solve_batch_fused",
    "solve_sharded",
]
