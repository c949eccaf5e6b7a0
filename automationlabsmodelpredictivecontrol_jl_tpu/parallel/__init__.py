from .scenarios import (
    SCENARIO_AXIS,
    BatchDiagnostics,
    closed_loop_batch,
    escalation_controller,
    fused_supported,
    init_warm_batch,
    make_escalated_solver,
    make_mesh,
    solve_batch,
    solve_batch_escalated,
    solve_batch_fused,
    solve_sharded,
)

__all__ = [
    "SCENARIO_AXIS",
    "BatchDiagnostics",
    "closed_loop_batch",
    "escalation_controller",
    "fused_supported",
    "init_warm_batch",
    "make_escalated_solver",
    "make_mesh",
    "solve_batch",
    "solve_batch_escalated",
    "solve_batch_fused",
    "solve_sharded",
]
