"""Controller checkpoint / resume.

The reference has no in-package persistence; its ecosystem serializes MLJ
machines (.jls fixtures, modeler_implementation_test.jl:30) and rebuilds
controllers from scratch (SURVEY.md §5). Here controllers are first-class
checkpoints: the design *spec* plus the runtime state (warm starts, pinned
initialization) go into one .npz; loading re-runs the deterministic design
pipeline and restores the runtime state, so a receding-horizon loop resumes
exactly where it stopped.

What round-trips bit-exactly: system (linear matrices, or zoo-family params
+ the *recorded* activation), full weight matrices Q/R/S, engine configs
(AdmmConfig / SqpConfig incl. the nested ADMM sub-config), soft state
penalties, terminal kind, warm state. Economic controllers carry arbitrary
Python cost callables and are refused loudly (save the spec yourself and
rebuild with the cost function in hand).

Neural systems are reconstructed by model-family name from the zoo registry
(callables themselves are not serialized).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .design import LinearEngine, MpcController, RiccatiEngine, design_controller
from .models import zoo
from .ops.admm import AdmmConfig
from .ops.riccati import RiccatiConfig
from .systems import LinearDiscreteSystem, NeuralDiscreteSystem
from .types import Box

_FMT_VERSION = 2


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


def _config_to_json(cfg: Any) -> Any:
    """Frozen config dataclass → JSON-able dict (tuples become lists;
    nested configs recurse)."""
    if cfg is None:
        return None
    out: Dict[str, Any] = {"__class__": type(cfg).__name__}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = _config_to_json(v)
        elif isinstance(v, tuple):
            out[f.name] = {"__tuple__": list(v)}
        else:
            out[f.name] = v
    return out


def _config_from_json(d: Any) -> Any:
    if d is None:
        return None
    name = d.pop("__class__")
    if name == "AdmmConfig":
        cls = AdmmConfig
    elif name == "RiccatiConfig":
        cls = RiccatiConfig
    elif name == "SqpConfig":
        from .solvers.sqp import SqpConfig

        cls = SqpConfig
    else:
        raise ValueError(f"unknown config class {name!r} in checkpoint")
    kwargs = {}
    for k, v in d.items():
        if isinstance(v, dict) and "__tuple__" in v:
            kwargs[k] = tuple(v["__tuple__"])
        elif isinstance(v, dict) and "__class__" in v:
            kwargs[k] = _config_from_json(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _engine_spec(controller: MpcController) -> Dict[str, Any]:
    """Engine-specific design kwargs that must survive the round trip."""
    eng = controller.engine
    spec: Dict[str, Any] = {
        "admm_config": None,
        "sqp_config": None,
        "riccati_config": None,
        "engine": None,
        "soft_state_penalty": None,
    }
    if isinstance(eng, LinearEngine):
        spec["engine"] = "condensed"
        spec["admm_config"] = _config_to_json(eng.config)
        if eng.soft_mu is not None:
            mu = np.asarray(eng.soft_mu)
            finite = mu[np.isfinite(mu)]
            if finite.size:
                spec["soft_state_penalty"] = float(finite.min())
        return spec
    if isinstance(eng, RiccatiEngine):
        spec["engine"] = "riccati"
        spec["riccati_config"] = _config_to_json(eng.config)
        return spec
    from .solvers.empc import EmpcEngine
    from .solvers.sqp import SqpEngine

    if isinstance(eng, SqpEngine):
        spec["sqp_config"] = _config_to_json(eng.config)
        if eng.soft_boxes:
            # user-soft boxes: restore the honest-status gate semantics
            spec["soft_state_penalty"] = float(eng.config.soft_state_penalty)
    elif isinstance(eng, EmpcEngine):
        raise ValueError(
            "economic controllers carry arbitrary Python cost callables and "
            "cannot be checkpointed; rebuild with design_controller("
            "economic_cost=...) and restore warm state manually"
        )
    # MilpEngine: deterministic rebuild from (system, tuning) — nothing extra
    return spec


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
        # full weight matrices (scalar*I or not)
        "Q": np.asarray(t.weights.Q),
        "R": np.asarray(t.weights.R),
        "S": np.asarray(t.weights.S),
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
    }
    meta.update(_engine_spec(controller))
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
        # the activation recorded on the system (zoo.make_system); fall back
        # to the family default only when the system never recorded one
        meta["activation"] = sys.activation or zoo.default_activation(sys.family)
        meta["params_skeleton"] = _flatten("params", sys.params, arrays)
    else:
        raise ValueError(f"cannot serialize system type {type(sys).__name__}")

    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_controller(path: str) -> MpcController:
    """Rebuild a controller from a checkpoint: re-runs the design pipeline
    with the saved spec, then restores warm state + initialization."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    if meta["version"] not in (1, _FMT_VERSION):
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    X = Box(lo=data["X.lo"], hi=data["X.hi"])
    U = Box(lo=data["U.lo"], hi=data["U.hi"])
    if meta["system_kind"] == "linear_discrete":
        system: Any = LinearDiscreteSystem(A=data["A"], B=data["B"], X=X, U=U)
    else:
        family = meta["family"]
        act = meta["activation"]
        params = _unflatten(meta["params_skeleton"], data)
        apply_fn, act = zoo.make_apply(family, act)
        system = NeuralDiscreteSystem(
            apply_fn=apply_fn, family=family, nx=meta["nx"], nu=meta["nu"],
            params=params, X=X, U=U, activation=act,
        )

    # v1 checkpoints stored scalar weights; v2 stores full matrices
    Q = data["Q"] if "Q" in data else meta["Q"]
    R = data["R"] if "R" in data else meta["R"]
    S = data["S"] if "S" in data else meta["S"]
    kwargs: Dict[str, Any] = {}
    if meta.get("admm_config") is not None:
        kwargs["admm_config"] = _config_from_json(meta["admm_config"])
    if meta.get("sqp_config") is not None:
        kwargs["sqp_config"] = _config_from_json(meta["sqp_config"])
    if meta.get("riccati_config") is not None:
        kwargs["riccati_config"] = _config_from_json(meta["riccati_config"])
    if meta.get("engine"):
        kwargs["engine"] = meta["engine"]
    if meta.get("soft_state_penalty") is not None:
        kwargs["soft_state_penalty"] = float(meta["soft_state_penalty"])

    ctrl = design_controller(
        system,
        meta["horizon"],
        meta["sample_time"],
        data["x_ref"],
        data["u_ref"],
        programming_type=meta["programming_type"],
        solver=meta["solver"],
        terminal_ingredient=meta["terminal"],
        Q=Q,
        R=R,
        S=S,
        max_time=meta["max_time"],
        state_constraint=meta["state_constraint"],
        **kwargs,
    )
    return ctrl.replace(
        initialization=data["initialization"],
        warm_z=data["warm_z"],
        warm_y=data["warm_y"],
    )
