"""Terminal-ingredient synthesis (terminal cost + terminal set).

Capability parity with ``_create_terminal_ingredient`` (reference
design_mpc.jl:298-394):

- terminal cost P: solution of the discrete algebraic Riccati equation at
  the linearization of the system around the *last* reference point
  (design_mpc.jl:319-327) — here via the in-house doubling DARE solver.
- kind "equality":  e_x[:,end] == 0 (design_mpc.jl:331).
- kind "contractive": ||e_x_N||^2 <= 0.9 ||e_x_1||^2 (design_mpc.jl:333-340)
  — enforced downstream as a Euclidean-ball ADMM projection block.
- kind "neighborhood": LQR-gain maximal constraint-admissible invariant set,
  H e_x_N <= b — the feature the reference stubbed with an @warn
  (design_mpc.jl:345; intended design commented at :346-385). Implemented
  here for real via fixed-depth backward reachability row accumulation.
- kind "none": cost only (design_mpc.jl:386-391).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .ops.dare import lqr_gain, solve_dare
from .systems import linearize
from .types import Box, References, TerminalIngredient, Weights

Array = Any


def invariant_terminal_set(
    A: Array,
    B: Array,
    K: Array,
    X: Box,
    U: Box,
    x_ref: Array,
    u_ref: Array,
    max_depth: int = 30,
    tol: float = 1e-9,
) -> Tuple[np.ndarray, np.ndarray]:
    """Maximal constraint-admissible invariant set O_inf for the LQR-closed
    loop e+ = (A - B K) e, in deviation coordinates around (x_ref, u_ref).

    Base constraint rows C e <= c encode the state box (X.lo - x_ref <= e
    <= X.hi - x_ref) and the input box under the LQR law u = u_ref - K e
    (U.lo - u_ref <= -K e <= U.hi - u_ref). Rows C Acl^t e <= c are
    accumulated for t = 0..max_depth with interval-arithmetic redundancy
    pruning (a row whose worst case over the box hull of the current set is
    already below its bound is dropped). Host-side design-time computation.

    Returns (H, b) with H e <= b.
    """
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    K = np.asarray(K, np.float64)
    x_ref = np.asarray(x_ref, np.float64)
    u_ref = np.asarray(u_ref, np.float64)
    nx = A.shape[0]
    Acl = A - B @ K

    I = np.eye(nx)
    C = np.vstack([I, -I, -K, K])
    c = np.concatenate(
        [
            np.asarray(X.hi, np.float64) - x_ref,
            x_ref - np.asarray(X.lo, np.float64),
            np.asarray(U.hi, np.float64) - u_ref,
            u_ref - np.asarray(U.lo, np.float64),
        ]
    )

    # box hull of the base set (outer bound used for redundancy pruning)
    # e in [lo_e, hi_e] from the state-box rows:
    hi_e = np.asarray(X.hi, np.float64) - x_ref
    lo_e = np.asarray(X.lo, np.float64) - x_ref

    H_rows = [C]
    b_rows = [c]
    M = C @ Acl
    for _ in range(max_depth):
        # worst case of each candidate row over the box hull
        worst = np.where(M > 0, M * hi_e[None, :], M * lo_e[None, :]).sum(axis=1)
        keep = worst > c + tol
        if not np.any(keep):
            break
        H_rows.append(M[keep])
        b_rows.append(c[keep])
        M = M @ Acl
    H = np.vstack(H_rows)
    b = np.concatenate(b_rows)
    return _remove_redundant_rows(H, b)


def _remove_redundant_rows(
    H: np.ndarray, b: np.ndarray, tol: float = 1e-9
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact LP redundancy removal (design-time, host): row i is redundant
    iff max{H_i e : H_{j≠i} e <= b_{j≠i}} <= b_i. The interval-arithmetic
    pruning inside the accumulation loop is only an outer bound — it keeps
    ~4x more rows than the minimal H-rep on the QTP golden config; the LP
    pass reproduces the reference's InvariantSets.jl minimal description
    (the 21 golden rows of terminal_ingredient_test.jl:395-431)."""
    try:
        from scipy.optimize import linprog
    except ImportError:  # scipy is a test/design-time dep; keep the set
        return H, b

    keep = np.ones(len(b), bool)
    for i in range(len(b)):
        mask = keep.copy()
        mask[i] = False
        if not np.any(mask):
            continue
        res = linprog(
            -H[i],
            A_ub=H[mask],
            b_ub=b[mask],
            bounds=[(None, None)] * H.shape[1],
            method="highs",
        )
        if res.status == 0 and -res.fun <= b[i] + tol:
            keep[i] = False
    return H[keep], b[keep]


def create_terminal_ingredient(
    system: Any,
    kind: str,
    references: References,
    weights: Weights,
    max_set_depth: int = 30,
) -> TerminalIngredient:
    """Synthesize the terminal ingredient for a (discrete) system.

    Linearizes at the LAST reference column (design_mpc.jl:312-313) and
    solves the DARE for P; for "neighborhood" also builds the invariant set.
    """
    if kind not in ("none", "equality", "contractive", "neighborhood"):
        raise ValueError(f"unknown terminal ingredient kind {kind!r}")
    x_end = references.x[:, -1]
    u_end = references.u[:, -1]
    A, B = linearize(system, x_end, u_end)
    # design-time DARE in scipy f64 (no XLA compile on the host path; the
    # jittable/vmappable in-house solver ops/dare.py serves on-device use)
    import scipy.linalg as sla

    P = jnp.asarray(
        sla.solve_discrete_are(
            np.asarray(A, np.float64),
            np.asarray(B, np.float64),
            np.asarray(weights.Q, np.float64),
            np.asarray(weights.R, np.float64),
        ),
        jnp.float32,
    )
    H = b = None
    if kind == "neighborhood":
        A64 = np.asarray(A, np.float64)
        B64 = np.asarray(B, np.float64)
        P64 = np.asarray(P, np.float64)
        R64 = np.asarray(weights.R, np.float64)
        K = np.linalg.solve(R64 + B64.T @ P64 @ B64, B64.T @ P64 @ A64)
        H_np, b_np = invariant_terminal_set(
            A, B, K, system.X, system.U, x_end, u_end, max_depth=max_set_depth
        )
        H = jnp.asarray(H_np, jnp.float32)
        b = jnp.asarray(b_np, jnp.float32)
    return TerminalIngredient(kind=kind, P=P, H=H, b=b)
