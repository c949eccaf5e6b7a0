"""Pallas-fused batched ADMM iterator (TPU kernel).

The jax engine (ops/admm.py) expresses one ADMM iteration as ~12 small
GEMMs + elementwise ops; under `vmap` + `while_loop` every iteration round-
trips the solver state (x, s, y, Ax — a few MB) through HBM and pays
per-op dispatch overhead, leaving the chip >100x below peak.

This kernel fuses `chunk` iterations into ONE launch per scenario block:
state lives in VMEM registers for the whole chunk, the rho-grid candidate
x-updates are straight `jnp.dot`s on the MXU, and per-lane rho selection is
a masked sum over the (small) grid axis. The outer driver (jax) runs
convergence diagnostics + OSQP rho adaptation between chunks, so statuses
and residuals stay exact.

Hard box rows only (the contractive ball block and soft rows stay on the
jax engine); see pallas_guide.md for the kernel-authoring rules followed
here (static shapes, f32 min tile (8,128), preferred_element_type).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .admm import AdmmConfig, AdmmOperator, start_rho_index
from ..types import STATUS_CONVERGED, STATUS_MAX_ITER, STATUS_NUMERIC_ERROR

Array = Any

_BLOCK = 512  # scenario lanes per grid program


def _iterate_kernel(
    # inputs (VMEM)
    kinv_ref,  # (R, n, n)
    k_ref,  # (R, n, n)  unfactored K (refinement only)
    atrho_ref,  # (R, n, m)  = A_s' diag(rho_r)
    a_ref,  # (m, n)
    rhov_ref,  # (R, m)
    rhoi_ref,  # (R, m)
    q_ref,  # (BLK, n)
    l_ref,  # (BLK, m)
    u_ref,  # (BLK, m)
    idx_ref,  # (BLK, 1) int32 rho index per lane
    x_in,  # (BLK, n)
    s_in,  # (BLK, m)
    y_in,  # (BLK, m)
    ax_in,  # (BLK, m)
    # outputs (aliased)
    x_out,
    s_out,
    y_out,
    ax_out,
    *,
    R: int,
    chunk: int,
    sigma: float,
    alpha: float,
    refine_steps: int,
    precision,
):
    A = a_ref[:]  # (m, n)
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    idx = idx_ref[:]  # (BLK, 1)

    # per-lane rho vectors via masked sum over the small grid axis
    rho_vec = jnp.zeros_like(l)
    rho_inv = jnp.zeros_like(l)
    for r in range(R):
        m_r = (idx == r).astype(jnp.float32)  # (BLK, 1)
        rho_vec = rho_vec + m_r * rhov_ref[r]
        rho_inv = rho_inv + m_r * rhoi_ref[r]

    def body(_, state):
        x, s, y, ax = state
        aty = jnp.dot(y, A, preferred_element_type=jnp.float32,
                      precision=precision)  # (BLK, n)
        base = sigma * x - q - aty
        xt = jnp.zeros_like(x)
        for r in range(R):
            w = jnp.dot(
                s, atrho_ref[r].T, preferred_element_type=jnp.float32,
                precision=precision,
            )  # (BLK, n)
            rhs = base + w
            cand = jnp.dot(
                rhs, kinv_ref[r], preferred_element_type=jnp.float32,
                precision=precision,
            )  # K_inv symmetric
            # iterative refinement of the f32 K-solve (the jax engine's
            # refine_steps; without it hard lanes hit an f32 dual floor)
            for _ in range(refine_steps):
                Kx = jnp.dot(
                    cand, k_ref[r], preferred_element_type=jnp.float32,
                    precision=precision,
                )  # K symmetric
                cand = cand + jnp.dot(
                    rhs - Kx, kinv_ref[r],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            xt = xt + (idx == r).astype(jnp.float32) * cand
        st = jnp.dot(xt, A.T, preferred_element_type=jnp.float32,
                     precision=precision)  # (BLK, m)
        x_new = alpha * xt + (1.0 - alpha) * x
        v = alpha * st + (1.0 - alpha) * s
        s_new = jnp.clip(v + rho_inv * y, l, u)
        y_new = y + rho_vec * (v - s_new)
        ax_new = alpha * st + (1.0 - alpha) * ax
        return x_new, s_new, y_new, ax_new

    x, s, y, ax = jax.lax.fori_loop(
        0, chunk, body, (x_in[:], s_in[:], y_in[:], ax_in[:])
    )
    x_out[:] = x
    s_out[:] = s
    y_out[:] = y
    ax_out[:] = ax


def _iterate_chunk(
    op: AdmmOperator,
    q_s: Array,  # (B, n) scaled
    l_s: Array,
    u_s: Array,
    idx: Array,  # (B,) int32
    x: Array,
    s: Array,
    y: Array,
    ax: Array,
    chunk: int,
    config: AdmmConfig,
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Run `chunk` fused iterations for the whole batch (grid over blocks)."""
    B, n = q_s.shape
    m = l_s.shape[1]
    R = op.rho_grid.shape[0]
    blk = B if B < _BLOCK else _BLOCK
    assert B % blk == 0, f"batch {B} not divisible by block {blk}"
    atrho = op.A_s.T[None] * op.rho_vecs[:, None, :]  # (R, n, m)

    # Mosaic supports only DEFAULT/HIGHEST dot precisions; DEFAULT (bf16x1)
    # stalls the iteration, so the kernel always runs HIGHEST.
    prec = jax.lax.Precision.HIGHEST
    kernel = functools.partial(
        _iterate_kernel,
        R=int(R),
        chunk=int(chunk),
        sigma=float(config.sigma),
        alpha=float(config.alpha),
        refine_steps=int(config.refine_steps),
        precision=prec,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)  # full array, replicated
    bspec_n = pl.BlockSpec((blk, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec_m = pl.BlockSpec((blk, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec_1 = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[
            shared,  # K_invs
            shared,  # Ks
            shared,  # AtRho
            shared,  # A_s
            shared,  # rho_vecs
            shared,  # rho_invs
            bspec_n,  # q
            bspec_m,  # l
            bspec_m,  # u
            bspec_1,  # idx
            bspec_n,  # x
            bspec_m,  # s
            bspec_m,  # y
            bspec_m,  # ax
        ],
        out_specs=[bspec_n, bspec_m, bspec_m, bspec_m],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
        ],
        input_output_aliases={10: 0, 11: 1, 12: 2, 13: 3},
        interpret=interpret,
    )(
        op.K_invs, op.Ks, atrho, op.A_s, op.rho_vecs, op.rho_invs,
        q_s, l_s, u_s, idx[:, None].astype(jnp.int32), x, s, y, ax,
    )
    return tuple(out)


def solve_batch_fused(
    op: AdmmOperator,
    q: Array,  # (B, n) unscaled
    l: Array,  # (B, m)
    u: Array,  # (B, m)
    z0: Optional[Array] = None,  # (B, n)
    y0: Optional[Array] = None,  # (B, m)
    config: AdmmConfig = AdmmConfig(),
    interpret: Optional[bool] = None,
):
    """Batched QP solve on the fused kernel; returns the same fields as
    ops.admm.solve (z, y, s, status, iterations, primal/dual residuals),
    each with a leading batch axis.

    Between kernel chunks the driver computes exact unscaled residuals and
    applies the OSQP rho rule per lane — identical semantics to the jax
    engine, at a fraction of the HBM traffic.
    """
    if op.n_ball:
        raise ValueError("fused kernel does not support ball rows; use ops.admm")
    if interpret is None:
        # Mosaic kernels need a real TPU; interpret elsewhere (tests/CPU)
        interpret = jax.default_backend() != "tpu"
    B, n = q.shape
    m = l.shape[1]
    dt = jnp.float32
    R = op.rho_grid.shape[0]
    ck = max(1, int(config.check_interval))

    q_s = (op.c * op.D)[None] * q
    l_s = op.E[None] * l
    u_s = op.E[None] * u

    x = jnp.zeros((B, n), dt) if z0 is None else z0 / op.D[None]
    y = jnp.zeros((B, m), dt) if y0 is None else op.c * y0 / op.E[None]
    ax = jnp.matmul(x, op.A_s.T, precision=jax.lax.Precision.HIGHEST)
    idx0 = jnp.full((B,), start_rho_index(config) if R > 1 else 0, jnp.int32)
    rho_inv0 = jnp.take(op.rho_invs, idx0, axis=0)
    s = jnp.clip(ax + rho_inv0 * y, l_s, u_s)

    D_inv = (1.0 / op.D)[None]
    E_inv = (1.0 / op.E)[None]
    c_inv = 1.0 / op.c
    log_grid = jnp.log(op.rho_grid)
    H = jax.lax.Precision.HIGHEST

    def diagnostics(x, s, y, ax):
        r_prim = jnp.max(jnp.abs(E_inv * (ax - s)), axis=1)
        Px = jnp.matmul(x, op.P_s.T, precision=H)
        Aty = jnp.matmul(y, op.A_s, precision=H)
        r_dual = c_inv * jnp.max(jnp.abs(D_inv * (Px + q_s + Aty)), axis=1)
        prim_norm = jnp.maximum(
            jnp.max(jnp.abs(E_inv * ax), axis=1), jnp.max(jnp.abs(E_inv * s), axis=1)
        )
        dual_norm = c_inv * jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(D_inv * Px), axis=1),
                jnp.max(jnp.abs(D_inv * Aty), axis=1),
            ),
            jnp.max(jnp.abs(D_inv * q_s), axis=1),
        )
        conv = (r_prim <= config.eps_abs + config.eps_rel * prim_norm) & (
            r_dual <= config.eps_abs + config.eps_rel * dual_norm
        )
        ratio = (r_prim / jnp.maximum(prim_norm, 1e-12)) / jnp.maximum(
            r_dual / jnp.maximum(dual_norm, 1e-12), 1e-12
        )
        # per-lane NaN/inf guard: poisoned lanes stop iterating and report a
        # distinct status (NaN comparisons are False so conv can't mask it)
        finite = jnp.isfinite(
            jnp.sum(x, axis=1) + jnp.sum(y, axis=1) + jnp.sum(s, axis=1)
        )
        return r_prim, r_dual, conv, ratio, finite

    def adapt(idx, ratio, done):
        if R == 1 or not config.adapt_interval:
            return idx
        log_target = jnp.take(log_grid, idx) + 0.5 * jnp.log(
            jnp.clip(ratio, 1e-8, 1e8)
        )
        idx_new = jnp.argmin(
            jnp.abs(log_grid[None, :] - log_target[:, None]), axis=1
        ).astype(jnp.int32)
        return jnp.where(done, idx, idx_new)

    def cond(state):
        it, done = state[5], state[8]
        return (~jnp.all(done)) & (it < config.max_iter)

    def body(state):
        x, s, y, ax, idx, it, rp, rd, done, itl, bad = state
        x2, s2, y2, ax2 = _iterate_chunk(
            op, q_s, l_s, u_s, idx, x, s, y, ax, ck, config, interpret
        )
        # frozen lanes keep their converged state (kernel advances everyone;
        # keeping the first-converged iterate makes iteration counts exact)
        keep = done[:, None]
        x2 = jnp.where(keep, x, x2)
        s2 = jnp.where(keep, s, s2)
        y2 = jnp.where(keep, y, y2)
        ax2 = jnp.where(keep, ax, ax2)
        rp2, rd2, conv, ratio, finite = diagnostics(x2, s2, y2, ax2)
        bad2 = bad | (~finite & ~done)
        done2 = done | conv | ~finite
        itl2 = jnp.where(done, itl, it + ck)
        idx2 = adapt(idx, ratio, done2)
        return (x2, s2, y2, ax2, idx2, it + ck, rp2, rd2, done2, itl2, bad2)

    zeros = jnp.zeros((B,), dt)
    state = (
        x, s, y, ax, idx0,
        jnp.asarray(0, jnp.int32),
        zeros + jnp.inf,
        zeros + jnp.inf,
        zeros > 1.0,
        jnp.zeros((B,), jnp.int32),
        zeros > 1.0,  # per-lane NaN/inf flag
    )
    x, s, y, ax, idx, it, rp, rd, done, iters, bad = jax.lax.while_loop(
        cond, body, state
    )

    status = jnp.where(
        bad,
        STATUS_NUMERIC_ERROR,
        jnp.where(done, STATUS_CONVERGED, STATUS_MAX_ITER),
    ).astype(jnp.int32)
    return (
        op.D[None] * x,
        op.E[None] * y * c_inv,
        E_inv * s,
        status,
        iters,
        rp,
        rd,
    )
