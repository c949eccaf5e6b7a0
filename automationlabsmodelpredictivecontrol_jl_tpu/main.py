"""Public entry API — drop-in vocabulary parity with the reference.

``proceed_controller`` mirrors the reference entry point (main_mpc.jl:22-84)
including its kwarg names (mpc_programming_type, mpc_solver,
mpc_terminal_ingredient, mpc_Q/mpc_R/mpc_S, mpc_max_time,
mpc_state_constraint, SURVEY §2.1) so a user of the reference finds the
same knobs here.
"""

from __future__ import annotations

from typing import Any, Optional

from .design import MpcController, design_controller
from .ops.admm import AdmmConfig
from .solvers.sqp import SqpConfig

# Defaults: parity with _DEFAULT_PARAMETERS_MODEL_PREDICTIVE_CONTROL
# (main_mpc.jl:87-94).
DEFAULT_PARAMETERS = {
    "mpc_solver": "auto",
    "mpc_terminal_ingredient": "none",
    "mpc_Q": 100.0,
    "mpc_R": 0.1,
    "mpc_S": 0.0,
    "mpc_max_time": 30.0,
}

IMPLEMENTATION_CONTROLLER_LIST = (
    "model_predictive_control",
    "economic_model_predictive_control",
)


def proceed_controller(
    system: Any,
    mpc_controller_type: str,
    mpc_horizon: int,
    mpc_sample_time: float,
    mpc_state_reference,
    mpc_input_reference,
    **kws: Any,
) -> MpcController:
    """Design a controller (reference proceed_controller, main_mpc.jl:22-84).

    ``"model_predictive_control"`` — quadratic tracking MPC (the
    reference's only live branch, main_mpc.jl:37).

    ``"economic_model_predictive_control"`` — economic MPC over a generic
    stage cost (the branch the reference reserved at main_mpc.jl:54-83 but
    shipped dead; removed in its v0.1.4). Requires
    ``mpc_cost_function``: a JAX-traceable ``l(x, u) -> scalar``; optional
    ``mpc_terminal_cost_function``: ``Vf(x) -> scalar`` (default: the
    quasi-infinite-horizon quadratic ``e_N' P e_N``, P from the DARE).
    """
    if mpc_controller_type not in IMPLEMENTATION_CONTROLLER_LIST:
        raise ValueError(
            f"unsupported controller type {mpc_controller_type!r}; "
            f"available: {IMPLEMENTATION_CONTROLLER_LIST}"
        )
    economic = mpc_controller_type == "economic_model_predictive_control"
    if economic and "mpc_cost_function" not in kws:
        raise ValueError(
            "economic_model_predictive_control requires mpc_cost_function "
            "(a JAX-traceable stage cost l(x, u) -> scalar)"
        )
    if not economic and "mpc_cost_function" in kws:
        raise ValueError(
            "mpc_cost_function is only accepted with "
            "mpc_controller_type='economic_model_predictive_control'"
        )
    p = dict(DEFAULT_PARAMETERS)
    return design_controller(
        system,
        int(mpc_horizon),
        float(mpc_sample_time),
        mpc_state_reference,
        mpc_input_reference,
        programming_type=kws.get("mpc_programming_type"),
        solver=kws.get("mpc_solver", p["mpc_solver"]),
        terminal_ingredient=kws.get(
            "mpc_terminal_ingredient", p["mpc_terminal_ingredient"]
        ),
        Q=float(kws.get("mpc_Q", p["mpc_Q"])),
        R=float(kws.get("mpc_R", p["mpc_R"])),
        S=float(kws.get("mpc_S", p["mpc_S"])),
        max_time=float(kws.get("mpc_max_time", p["mpc_max_time"])),
        # presence-flag semantics, like the reference (linear/...:62);
        # mpc_soft_state_constraint=<penalty> turns the state boxes into
        # L1-penalized soft constraints (implies state_constraint)
        state_constraint=(
            ("mpc_state_constraint" in kws and kws["mpc_state_constraint"] is not False)
            or "mpc_soft_state_constraint" in kws
        ),
        soft_state_penalty=(
            float(kws["mpc_soft_state_constraint"])
            if "mpc_soft_state_constraint" in kws
            else None
        ),
        admm_config=kws.get("admm_config"),
        sqp_config=kws.get("sqp_config"),
        engine=kws.get("engine", "auto"),
        riccati_config=kws.get("riccati_config"),
        economic_cost=kws.get("mpc_cost_function"),
        economic_terminal_cost=kws.get("mpc_terminal_cost_function"),
        empc_config=kws.get("empc_config"),
    )
