"""Pallas-fused batched Riccati-ADMM iterator (TPU kernel).

The jax engine (ops/riccati.py) runs each ADMM iteration as two lax.scans
over the horizon (backward affine sweep + forward rollout) plus elementwise
projections; under vmap + while_loop every iteration round-trips the sparse
solver state (X, U, v, lam — O(N) per lane) through HBM and pays per-op
dispatch for every horizon step.

This kernel is the BASELINE north-star shape: the block-tridiagonal KKT
solve (Riccati backward/forward sweeps) fused with the horizon rollout and
the ADMM projections, for `chunk` iterations per launch, with all state in
VMEM. Layout puts scenario lanes on the 128-wide lane axis — every sweep
step is a tiny shared-matrix GEMM (nu, nx) @ (nx, BLK) that vectorizes over
the batch — and the horizon is walked with a fori_loop + dynamic slices, so
N does not unroll the kernel.

Iteration order matches ops.riccati.solve_sparse.admm_iter exactly
(w-update from the carried (v, lam), then projection + dual ascent), so the
outer driver's residuals/certificate/freeze logic follows the jax engine's
semantics at a fraction of the HBM traffic — with ONE documented
divergence: rho adaptation and stall escalation are BATCH-GLOBAL here (the
kernel's rho and factor slabs are compile-time constants selected by
lax.switch), while the jax engine adapts per lane. On batches whose lanes
want different rho the two engines can take different iteration counts
(statuses and solutions still agree within tolerance).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import (
    RiccatiConfig,
    RiccatiOperator,
    rollout_warm,
    _box_support,
    _initial_ridx,
    _project_X,
)
from ..types import (
    CONTRACTIVE_FACTOR,
    STATUS_CONVERGED,
    STATUS_MAX_ITER,
    STATUS_NUMERIC_ERROR,
    STATUS_PRIMAL_INFEASIBLE,
)

Array = Any

_BLOCK = 128  # scenario lanes per grid program (lane axis)


def _kernel(
    # shared (VMEM, replicated across grid programs)
    K_ref,  # (N, nu, nx)
    KT_ref,  # (N, nx, nu)   K_k'
    G_ref,  # (N, nu, nu)
    AmBKT_ref,  # (N, nx, nx) (A - B K_k)'
    A_ref,  # (nx, nx)
    B_ref,  # (nx, nu)
    Bt_ref,  # (nu, nx)
    xlo_ref,  # (1, nx, 1) interior box (deviation space)
    xhi_ref,
    xNlo_ref,  # (nx, 1) terminal box
    xNhi_ref,
    ulo_ref,  # (1, nu, 1)
    uhi_ref,
    # per-lane blocks (VMEM)
    e0_ref,  # (nx, BLK)
    ballr_ref,  # (1, BLK)
    vX_in,  # (N+1, nx, BLK)
    vU_in,  # (N, nu, BLK)
    lamX_in,  # (N+1, nx, BLK)
    lamU_in,  # (N, nu, BLK)
    # outputs (v/lam aliased to the four inputs above)
    X_out,  # (N+1, nx, BLK)
    U_out,  # (N, nu, BLK)
    vX_out,
    vU_out,
    lamX_out,
    lamU_out,
    # scratch
    ffs,  # (N, nu, BLK)
    *,
    N: int,
    nx: int,
    nu: int,
    chunk: int,
    rho: float,
    term_rho_scale: float,
    split_interior: bool,
    split_terminal: bool,
    terminal_ball: bool,
):
    f32 = jnp.float32
    H = jax.lax.Precision.HIGHEST
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=H, preferred_element_type=f32
    )

    A = A_ref[:]
    B = B_ref[:]
    Bt = Bt_ref[:]
    e0 = e0_ref[:]
    blk = e0.shape[-1]
    rho_f = f32(rho)
    rho_inv = f32(1.0 / rho)
    # terminal-node rho (equality boost; matches the boosted factorization)
    rho_t = f32(min(term_rho_scale * rho, 1e3))
    rho_t_inv = f32(1.0 / min(term_rho_scale * rho, 1e3))
    split_x = split_interior or split_terminal

    # The working ADMM state lives in the output refs (Mosaic has no
    # dynamic_slice on loop-carried values — all horizon-indexed reads and
    # writes go through VMEM refs). Output VMEM windows start uninitialized
    # (HBM aliasing does not pre-fill them), so copy the incoming state in
    # explicitly. X/U are fully rewritten by the first w-update.
    vX_out[:] = vX_in[:]
    vU_out[:] = vU_in[:]
    lamX_out[:] = lamX_in[:]
    lamU_out[:] = lamU_in[:]
    X_out[0] = e0
    # rows the engine never lets carry duals (jax engine zeroes them every
    # iteration): the fixed e_1 and — when only the terminal row is split —
    # the interior rows
    if not split_x:
        lamX_out[:] = jnp.zeros((N + 1, nx, blk), f32)
    else:
        lamX_out[0] = jnp.zeros((nx, blk), f32)
        if not split_interior and N > 1:
            lamX_out[1:N] = jnp.zeros((N - 1, nx, blk), f32)

    def iteration(_, carry):
        # ---- w-update: backward affine sweep (fills ffs scratch) ----------
        # value-gradient recursion of ops.riccati._lqr_affine_solve with the
        # augmented-Lagrangian linear terms lin = -rho v + lam inlined
        if split_terminal:
            g0 = -rho_t * vX_out[N] + lamX_out[N]
        else:
            g0 = jnp.zeros((nx, blk), f32)

        def bwd(i, g):
            k = N - 1 - i
            lu_k = -rho_f * vU_out[k] + lamU_out[k]  # (nu, BLK)
            ffs[k] = dot(G_ref[k], dot(Bt, g) + lu_k)
            g_new = dot(AmBKT_ref[k], g) - dot(KT_ref[k], lu_k)
            if split_interior:
                # linear cost on the pre-step state e_{k+1} (0-indexed row
                # k); row 0 is the fixed e_1 and never contributes
                lpre = -rho_f * vX_out[k] + lamX_out[k]
                g_new = g_new + jnp.where(k >= 1, 1.0, 0.0) * lpre
            return g_new

        jax.lax.fori_loop(0, N, bwd, g0)

        # ---- w-update: forward rollout (writes X_out, U_out) --------------
        def fwd(k, e):
            u_k = -dot(K_ref[k], e) - ffs[k]
            e_next = dot(A, e) + dot(B, u_k)
            X_out[k + 1] = e_next
            U_out[k] = u_k
            return e_next

        jax.lax.fori_loop(0, N, fwd, e0)

        # ---- v-update (projection) + dual ascent ---------------------------
        Un = U_out[:]
        vU_new = jnp.clip(Un + rho_inv * lamU_out[:], ulo_ref[:], uhi_ref[:])
        lamU_out[:] = lamU_out[:] + rho_f * (Un - vU_new)
        vU_out[:] = vU_new

        if split_interior and N > 1:
            Xi = X_out[1:N]
            w_int = Xi + rho_inv * lamX_out[1:N]
            vX_int = jnp.clip(w_int, xlo_ref[:], xhi_ref[:])
            lamX_out[1:N] = lamX_out[1:N] + rho_f * (Xi - vX_int)
            vX_out[1:N] = vX_int
        if terminal_ball:
            w = X_out[N] + rho_inv * lamX_out[N]
            nrm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))  # (1, BLK)
            r = ballr_ref[:]
            scale = jnp.where(nrm > r, r / jnp.maximum(nrm, 1e-30), 1.0)
            vX_N = w * scale
            lamX_out[N] = lamX_out[N] + rho_f * (X_out[N] - vX_N)
            vX_out[N] = vX_N
        elif split_terminal:
            w = X_out[N] + rho_t_inv * lamX_out[N]
            vX_N = jnp.clip(w, xNlo_ref[:], xNhi_ref[:])
            lamX_out[N] = lamX_out[N] + rho_t * (X_out[N] - vX_N)
            vX_out[N] = vX_N
        return carry

    jax.lax.fori_loop(0, chunk, iteration, 0)

    # unsplit vX rows mirror X (jax engine: vXn = Xn there) so the driver's
    # residuals see zero contribution from them
    if not split_x:
        vX_out[:] = X_out[:]
    else:
        vX_out[0] = e0
        if not split_interior and N > 1:
            vX_out[1:N] = X_out[1:N]


def _run_chunk(
    op: RiccatiOperator,
    ridx: int,
    e0T: Array,  # (nx, B)
    ballr: Array,  # (1, B)
    vX: Array,  # (N+1, nx, B)
    vU: Array,  # (N, nu, B)
    lamX: Array,
    lamU: Array,
    chunk: int,
    interpret: bool,
):
    N, nx, nu = op.N, op.nx, op.nu
    B = e0T.shape[-1]
    blk = B if B < _BLOCK else _BLOCK
    assert B % blk == 0, f"batch {B} not divisible by block {blk}"
    f = jnp.float32

    K = op.factors.K[ridx]  # (N, nu, nx)
    G = op.factors.G[ridx]
    AmBK = op.factors.AmBK[ridx]
    KT = jnp.swapaxes(K, 1, 2)
    AmBKT = jnp.swapaxes(AmBK, 1, 2)
    rho = float(np.asarray(op.rho_grid)[ridx])

    kernel = functools.partial(
        _kernel,
        N=N, nx=nx, nu=nu, chunk=int(chunk), rho=rho,
        term_rho_scale=float(op.term_rho_scale),
        split_interior=op.split_interior,
        split_terminal=op.split_terminal,
        terminal_ball=op.terminal_ball,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    lane = lambda *dims: pl.BlockSpec(
        dims + (blk,), lambda i: (0,) * len(dims) + (i,),
        memory_space=pltpu.VMEM,
    )
    spec_x = lane(N + 1, nx)
    spec_u = lane(N, nu)
    spec_e0 = lane(nx)
    spec_r = lane(1)

    out = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[
            shared,  # K
            shared,  # KT
            shared,  # G
            shared,  # AmBKT
            shared,  # A
            shared,  # B
            shared,  # Bt
            shared,  # xlo
            shared,  # xhi
            shared,  # xNlo
            shared,  # xNhi
            shared,  # ulo
            shared,  # uhi
            spec_e0,  # e0
            spec_r,  # ball radius
            spec_x,  # vX
            spec_u,  # vU
            spec_x,  # lamX
            spec_u,  # lamU
        ],
        out_specs=[spec_x, spec_u, spec_x, spec_u, spec_x, spec_u],
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, nx, B), f),
            jax.ShapeDtypeStruct((N, nu, B), f),
            jax.ShapeDtypeStruct((N + 1, nx, B), f),
            jax.ShapeDtypeStruct((N, nu, B), f),
            jax.ShapeDtypeStruct((N + 1, nx, B), f),
            jax.ShapeDtypeStruct((N, nu, B), f),
        ],
        input_output_aliases={15: 2, 16: 3, 17: 4, 18: 5},
        scratch_shapes=[pltpu.VMEM((N, nu, blk), f)],
        interpret=interpret,
    )(
        K, KT, G, AmBKT, op.factors.A, op.factors.B, op.factors.Bt,
        op.x_lo.reshape(1, nx, 1), op.x_hi.reshape(1, nx, 1),
        op.xN_lo.reshape(nx, 1), op.xN_hi.reshape(nx, 1),
        op.u_lo.reshape(1, nu, 1), op.u_hi.reshape(1, nu, 1),
        e0T, ballr, vX, vU, lamX, lamU,
    )
    return tuple(out)  # X, U, vX, vU, lamX, lamU


def solve_sparse_fused(
    op: RiccatiOperator,
    e0s: Array,  # (B, nx)
    warm_U: Optional[Array] = None,  # (B, N, nu)
    warm_lam: Optional[Tuple[Array, Array]] = None,  # ((B,N+1,nx),(B,N,nu))
    config: RiccatiConfig = RiccatiConfig(),
    interpret: Optional[bool] = None,
):
    """Batched sparse solves on the fused Riccati kernel. Same contract as
    vmapped ops.riccati.solve_sparse: returns (X (B,N+1,nx), U (B,N,nu),
    status (B,), iterations (B,), rp (B,), rd (B,), (lamX, lamU))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, nx, nu = op.N, op.nx, op.nu
    B_orig = e0s.shape[0]
    if B_orig > _BLOCK and B_orig % _BLOCK:
        # pad to a whole number of kernel blocks with copies of the last
        # lane (they solve normally and are sliced off below)
        pad = _BLOCK - (B_orig % _BLOCK)
        tile = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0
        )
        e0s = tile(e0s)
        warm_U = None if warm_U is None else tile(warm_U)
        if warm_lam is not None:
            warm_lam = (tile(warm_lam[0]), tile(warm_lam[1]))
    B = e0s.shape[0]
    f = jnp.float32
    grid = op.rho_grid
    R_grid = len(grid)
    ridx0 = _initial_ridx(op, config)
    grid_arr = jnp.asarray(np.asarray(grid), f)
    log_grid = jnp.log(grid_arr)
    adapt = int(config.adapt_interval or 0)
    ck = max(1, int(config.check_interval))
    split_x = op.split_interior or op.split_terminal

    e0T = e0s.T.astype(f)  # (nx, B)
    if op.terminal_ball:
        ballr = (
            jnp.sqrt(CONTRACTIVE_FACTOR)
            * jnp.linalg.norm(e0s, axis=1)[None, :]
        ).astype(f)
    else:
        ballr = jnp.zeros((1, B), f)

    U0 = (
        jnp.zeros((N, nu, B), f)
        if warm_U is None
        else jnp.moveaxis(warm_U.astype(f), 0, -1)
    )
    X0 = jax.vmap(
        lambda e, u: rollout_warm(op, e, u), in_axes=(0, -1), out_axes=-1
    )(e0s, U0)  # (N+1, nx, B)
    if warm_lam is None:
        lamX0 = jnp.zeros((N + 1, nx, B), f)
        lamU0 = jnp.zeros((N, nu, B), f)
    else:
        lamX0 = jnp.moveaxis(warm_lam[0].astype(f), 0, -1)
        lamU0 = jnp.moveaxis(warm_lam[1].astype(f), 0, -1)

    vX0 = jax.vmap(
        lambda x, r: _project_X(op, x, r), in_axes=(-1, 1), out_axes=-1
    )(X0, ballr[0][None])
    vU0 = jnp.clip(U0, op.u_lo[:, None], op.u_hi[:, None])

    def residuals(X, U, vX, vU, vX_prev, vU_prev, rho):
        rp = jnp.max(jnp.abs(U - vU), axis=(0, 1))
        rd = rho * jnp.max(jnp.abs(vU - vU_prev), axis=(0, 1))
        if split_x:
            rp = jnp.maximum(jnp.max(jnp.abs(X - vX), axis=(0, 1)), rp)
            rd = jnp.maximum(
                rho * jnp.max(jnp.abs(vX - vX_prev), axis=(0, 1)), rd
            )
        return rp, rd

    # zero-input rollouts: the manifold anchor for the infeasibility
    # certificate's support term (ops.riccati.infeas_certificate)
    Xbar = jax.vmap(
        lambda e: rollout_warm(op, e, jnp.zeros((N, nu), f)),
        in_axes=0, out_axes=-1,
    )(e0s)  # (N+1, nx, B)

    def infeas_cert(dlamX, dlamU):
        """Batched separating-functional certificate (lane axis last);
        semantics of ops.riccati.infeas_certificate per lane."""
        def adj(g, inp):
            dlx_k, dlu_k = inp
            r_k = jnp.matmul(op.factors.Bt, g)
            r_k = r_k + dlu_k
            g_new = jnp.matmul(op.factors.A.T, g) + dlx_k
            return g_new, jnp.max(jnp.abs(r_k), axis=0)

        _, r_all = jax.lax.scan(
            adj, dlamX[-1], (dlamX[:-1], dlamU), reverse=True
        )
        ortho_res = jnp.max(r_all, axis=0)  # (B,)

        def boxsup(d, lo, hi):
            # per-lane sum over the leading (row, dim) axes
            return jax.vmap(
                lambda dd: _box_support(dd, lo, hi), in_axes=-1
            )(d)

        s_c = boxsup(dlamU, op.u_lo, op.u_hi)
        if op.split_interior:
            s_c = s_c + boxsup(dlamX[1:-1], op.x_lo, op.x_hi)
        if op.terminal_ball:
            s_c = s_c + ballr[0] * jnp.linalg.norm(dlamX[-1], axis=0)
        elif op.split_terminal:
            s_c = s_c + boxsup(dlamX[-1], op.xN_lo, op.xN_hi)
        support = s_c - jnp.sum(dlamX * Xbar, axis=(0, 1))
        dnorm = jnp.maximum(
            jnp.max(jnp.abs(dlamX), axis=(0, 1)),
            jnp.max(jnp.abs(dlamU), axis=(0, 1)),
        )
        eps = config.eps_infeas
        return (
            (dnorm > 1e-9)
            & (ortho_res <= eps * dnorm)
            & (support <= -eps * dnorm)
        )

    def cond(state):
        it, done = state[8], state[11]
        return (~jnp.all(done)) & (it < config.max_iter)

    # the kernel's rho and its factor slabs are compile-time constants, so
    # batch-level rho adaptation runs as a lax.switch over one compiled
    # chunk variant per grid entry (R_grid small; per-lane rho would force
    # gathering whole factor slabs inside the kernel)
    def _branch(i):
        def run(args):
            vX, vU, lamX, lamU = args
            return _run_chunk(
                op, i, e0T, ballr, vX, vU, lamX, lamU, ck, interpret
            )

        return run

    branches = [_branch(i) for i in range(R_grid)]

    top_ridx = R_grid - 1

    def body(state):
        (X, U, vX, vU, lamX, lamU, ridx, itl, it, rp, rd, done, stall, bad,
         infeas) = state
        vX_prev, vU_prev = vX, vU
        rho = jnp.take(grid_arr, ridx)
        Xn, Un, vXn, vUn, lamXn, lamUn = jax.lax.switch(
            ridx, branches, (vX, vU, lamX, lamU)
        )
        keep = done[None, None, :]
        Xn = jnp.where(keep, X, Xn)
        Un = jnp.where(keep, U, Un)
        vXn = jnp.where(keep, vX, vXn)
        vUn = jnp.where(keep, vU, vUn)
        lamXn = jnp.where(keep, lamX, lamXn)
        lamUn = jnp.where(keep, lamU, lamUn)
        rp2, rd2 = residuals(Xn, Un, vXn, vUn, vX_prev, vU_prev, rho)
        scale = jnp.maximum(
            jnp.max(jnp.abs(Un), axis=(0, 1)),
            jnp.maximum(jnp.max(jnp.abs(Xn), axis=(0, 1)), 1e-6),
        )
        tol = config.eps_abs + config.eps_rel * scale
        finite = jnp.isfinite(
            jnp.sum(Un, axis=(0, 1)) + jnp.sum(Xn, axis=(0, 1))
        )
        # per-lane certificate verdict; stall only ESCALATES rho (batch-
        # global here, matching this driver's batch-global adaptation)
        cert = infeas_cert(lamXn - lamX, lamUn - lamU) & ~done
        stalled = (rp2 > 10.0 * tol) & (jnp.abs(rp - rp2) <= 1e-3 * rp2)
        stall_tmp = jnp.where(done, stall, jnp.where(stalled, stall + 1, 0))
        esc = jnp.any(~done & (stall_tmp >= config.stall_checks)) & (
            ridx < top_ridx
        )
        stall2 = jnp.where(esc, 0, stall_tmp)
        bad2 = bad | (~finite & ~done)
        infeas2 = infeas | cert
        conv = (rp2 <= tol) & (rd2 <= tol * rho)
        done2 = done | conv | ~finite | cert
        itl2 = jnp.where(done, itl, it + ck)

        # batch-level rho adaptation (OSQP §5.2): mean normalized
        # log-ratio over the still-active lanes picks the next grid entry
        if R_grid > 1 and adapt:
            prim_norm = jnp.maximum(
                jnp.max(jnp.abs(Un), axis=(0, 1)),
                jnp.max(jnp.abs(vUn), axis=(0, 1)),
            )
            dual_norm = jnp.max(jnp.abs(lamUn), axis=(0, 1))
            if split_x:
                prim_norm = jnp.maximum(
                    prim_norm,
                    jnp.maximum(
                        jnp.max(jnp.abs(Xn), axis=(0, 1)),
                        jnp.max(jnp.abs(vXn), axis=(0, 1)),
                    ),
                )
                dual_norm = jnp.maximum(
                    dual_norm, jnp.max(jnp.abs(lamXn), axis=(0, 1))
                )
            ratio = (rp2 / jnp.maximum(prim_norm, 1e-6)) / jnp.maximum(
                rd2 / jnp.maximum(dual_norm, 1e-6), 1e-12
            )
            log_ratio = jnp.log(jnp.clip(ratio, 1e-8, 1e8))
            active = ~done2
            n_act = jnp.maximum(jnp.sum(active), 1)
            mean_lr = jnp.sum(jnp.where(active, log_ratio, 0.0)) / n_act
            log_t = jnp.log(rho) + 0.5 * mean_lr
            ridx_t = jnp.argmin(jnp.abs(log_grid - log_t)).astype(jnp.int32)
            do = (jnp.mod(it + ck, adapt) < ck) & jnp.any(active)
            ridx2 = jnp.where(do, ridx_t, ridx)
        else:
            ridx2 = ridx
        # stall escalation wins the block over the adaptation rule
        ridx3 = jnp.where(esc, jnp.minimum(ridx2 + 1, top_ridx), ridx2)
        return (
            Xn, Un, vXn, vUn, lamXn, lamUn, ridx3, itl2, it + ck, rp2, rd2,
            done2, stall2, bad2, infeas2,
        )

    zeros = jnp.zeros((B,), f)
    izeros = jnp.zeros((B,), jnp.int32)
    state = (
        X0, U0, vX0, vU0, lamX0, lamU0,
        jnp.asarray(ridx0, jnp.int32),
        izeros,
        jnp.asarray(0, jnp.int32),
        zeros + jnp.inf, zeros + jnp.inf,
        zeros > 1.0, izeros, zeros > 1.0, zeros > 1.0,
    )
    (X, U, vX, vU, lamX, lamU, ridx, iters, it, rp, rd, done, stall, bad,
     infeas) = jax.lax.while_loop(cond, body, state)

    status = jnp.where(
        bad,
        STATUS_NUMERIC_ERROR,
        jnp.where(
            infeas,
            STATUS_PRIMAL_INFEASIBLE,
            jnp.where(done, STATUS_CONVERGED, STATUS_MAX_ITER),
        ),
    ).astype(jnp.int32)

    U_out = jnp.clip(U, op.u_lo[:, None], op.u_hi[:, None])
    s = slice(None, B_orig)
    return (
        jnp.moveaxis(X, -1, 0)[s],  # (B, N+1, nx)
        jnp.moveaxis(U_out, -1, 0)[s],  # (B, N, nu)
        status[s],
        iters[s],
        rp[s],
        rd[s],
        (jnp.moveaxis(lamX, -1, 0)[s], jnp.moveaxis(lamU, -1, 0)[s]),
    )
