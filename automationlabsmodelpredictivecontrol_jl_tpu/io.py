"""Controller checkpoint / resume.

The reference has no in-package persistence; its ecosystem serializes MLJ
machines (.jls fixtures, modeler_implementation_test.jl:30) and rebuilds
controllers from scratch (SURVEY.md §5). Here controllers are first-class
checkpoints: the design *spec* plus the runtime state (warm starts, pinned
initialization) go into one .npz; loading re-runs the deterministic design
pipeline and restores the runtime state, so a receding-horizon loop resumes
exactly where it stopped.

Neural systems are reconstructed by model-family name from the zoo registry
(callables themselves are not serialized).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np

from .design import MpcController, design_controller
from .models import zoo
from .systems import LinearDiscreteSystem, NeuralDiscreteSystem
from .types import Box

_FMT_VERSION = 1


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]) -> Any:
    """Flatten a params pytree of dicts/lists/arrays into npz keys; returns
    a JSON-able skeleton describing the structure."""
    if isinstance(tree, dict):
        return {k: _flatten(f"{prefix}.{k}", v, out) for k, v in sorted(tree.items())}
    if isinstance(tree, (list, tuple)):
        return [_flatten(f"{prefix}[{i}]", v, out) for i, v in enumerate(tree)]
    out[prefix] = np.asarray(tree)
    return {"__leaf__": prefix}


def _unflatten(skel: Any, data) -> Any:
    if isinstance(skel, dict):
        if set(skel) == {"__leaf__"}:
            return data[skel["__leaf__"]]
        return {k: _unflatten(v, data) for k, v in skel.items()}
    if isinstance(skel, list):
        return [_unflatten(v, data) for v in skel]
    raise ValueError(f"bad skeleton node {skel!r}")


def save_controller(path: str, controller: MpcController) -> None:
    """Serialize the controller to ``path`` (.npz)."""
    t = controller.tuning
    sys = controller.system
    arrays: Dict[str, np.ndarray] = {
        "X.lo": np.asarray(sys.X.lo),
        "X.hi": np.asarray(sys.X.hi),
        "U.lo": np.asarray(sys.U.lo),
        "U.hi": np.asarray(sys.U.hi),
        "x_ref": np.asarray(t.references.x[:, 0]),
        "u_ref": np.asarray(t.references.u[:, 0]),
        "initialization": np.asarray(controller.initialization),
        "warm_z": np.asarray(controller.warm_z),
        "warm_y": np.asarray(controller.warm_y),
    }
    meta: Dict[str, Any] = {
        "version": _FMT_VERSION,
        "horizon": t.horizon,
        "sample_time": t.sample_time,
        "max_time": t.max_time,
        "programming_type": t.programming_type,
        "solver": t.solver_name,
        "terminal": t.terminal.kind,
        "state_constraint": t.state_constraint,
        # weights are scalar*I by construction (create_weights)
        "Q": float(np.asarray(t.weights.Q)[0, 0]),
        "R": float(np.asarray(t.weights.R)[0, 0]),
        "S": float(np.asarray(t.weights.S)[0, 0]),
    }
    if isinstance(sys, LinearDiscreteSystem):
        meta["system_kind"] = "linear_discrete"
        arrays["A"] = np.asarray(sys.A)
        arrays["B"] = np.asarray(sys.B)
    elif isinstance(sys, NeuralDiscreteSystem):
        if sys.family not in zoo._APPLIES:
            raise ValueError(
                f"cannot serialize neural system of unregistered family "
                f"{sys.family!r}; registered: {sorted(zoo._APPLIES)}"
            )
        meta["system_kind"] = "neural_discrete"
        meta["family"] = sys.family
        meta["nx"] = sys.nx
        meta["nu"] = sys.nu
        meta["activation"] = getattr(sys, "activation", None) or _default_act(
            sys.family
        )
        meta["params_skeleton"] = _flatten("params", sys.params, arrays)
    else:
        raise ValueError(f"cannot serialize system type {type(sys).__name__}")

    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def _default_act(family: str) -> str:
    return {
        "rbf": "gaussian",
        "neuralode": "tanh",
        "rknn1": "tanh",
        "rknn2": "tanh",
        "rknn4": "tanh",
    }.get(family, "relu")


def load_controller(path: str) -> MpcController:
    """Rebuild a controller from a checkpoint: re-runs the design pipeline
    with the saved spec, then restores warm state + initialization."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    if meta["version"] != _FMT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    X = Box(lo=data["X.lo"], hi=data["X.hi"])
    U = Box(lo=data["U.lo"], hi=data["U.hi"])
    if meta["system_kind"] == "linear_discrete":
        system: Any = LinearDiscreteSystem(A=data["A"], B=data["B"], X=X, U=U)
    else:
        family = meta["family"]
        act = meta["activation"]
        params = _unflatten(meta["params_skeleton"], data)
        base_apply = zoo._APPLIES[family]

        def apply_fn(p, x, u):
            return base_apply(p, x, u, activation=act)

        system = NeuralDiscreteSystem(
            apply_fn=apply_fn, family=family, nx=meta["nx"], nu=meta["nu"],
            params=params, X=X, U=U,
        )

    ctrl = design_controller(
        system,
        meta["horizon"],
        meta["sample_time"],
        data["x_ref"],
        data["u_ref"],
        programming_type=meta["programming_type"],
        solver=meta["solver"],
        terminal_ingredient=meta["terminal"],
        Q=meta["Q"],
        R=meta["R"],
        S=meta["S"],
        max_time=meta["max_time"],
        state_constraint=meta["state_constraint"],
    )
    return ctrl.replace(
        initialization=data["initialization"],
        warm_z=data["warm_z"],
        warm_y=data["warm_y"],
    )
