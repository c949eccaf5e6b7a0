"""Speed-of-light / roofline accounting for the hot kernels.

BASELINE.md north star: "measure rollout + QP kernel speed-of-light per
chip". The reference has no profiling story at all (its entire surface is
wall-clock prints, /root/reference/test/runtests.jl:10-18), so this module
is new TPU-native surface: an analytic flops/bytes model of the fused ADMM
iteration (ops/admm_pallas.py) and the sparse Riccati sweeps
(ops/riccati_pallas.py), compared against the chip's MXU/HBM roofline to
yield a defensible ``kernel_sol_fraction``.

Two flop counts are reported:

- **useful** flops: the algorithmically necessary multiply-adds at the true
  (n, m) problem sizes.
- **padded** flops: what the MXU actually executes after tiling the small
  MPC operands up to the hardware tile (lane=128, sublane=8 for f32).
  ``sol_fraction`` is computed against the padded count — that is the
  honest "how close to the hardware ceiling does the kernel run" number;
  ``mfu`` is the useful-flops fraction (how much of the ceiling is spent on
  real work vs padding).

Peak numbers are public per-chip specs (bf16 MXU TFLOP/s, HBM GB/s). The
kernels run f32 at ``Precision.HIGHEST`` (Mosaic's only stable option for
these ill-conditioned QPs), which the MXU executes as 6 bf16 passes —
hence the /6 on the f32 ceiling.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

Array = Any

# (bf16 peak flop/s, HBM bytes/s) per chip generation — public spec sheet
# numbers. "host" is a placeholder so the model runs on the CPU test mesh.
_DEVICE_PEAKS = {
    "v4": (275e12, 1228e9),
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6 lite": (918e12, 1640e9),
    "v6e": (918e12, 1640e9),
    "host": (1e12, 100e9),
}

# f32 Precision.HIGHEST = 6-pass bf16 emulation on the MXU
_F32_HIGHEST_PASSES = 6

_LANE = 128  # TPU vector lane count (last-dim tile)
_SUBLANE = 8  # f32 sublane tile (second-minor dim)


def device_peaks(device=None) -> Dict[str, float]:
    """(flops_peak_f32_highest, hbm_bytes_per_s) for a jax device."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "host").lower()
    for key, (fl, bw) in _DEVICE_PEAKS.items():
        if key in kind:
            return {
                "device_kind": kind,
                "bf16_flops": fl,
                "f32_highest_flops": fl / _F32_HIGHEST_PASSES,
                "hbm_bytes_per_s": bw,
            }
    fl, bw = _DEVICE_PEAKS["host"]
    return {
        "device_kind": kind,
        "bf16_flops": fl,
        "f32_highest_flops": fl / _F32_HIGHEST_PASSES,
        "hbm_bytes_per_s": bw,
    }


def _pad(v: int, tile: int) -> int:
    return ((v + tile - 1) // tile) * tile


def _matmul_flops(b: int, k: int, n: int, padded: bool) -> float:
    """Flops of a (b,k)x(k,n) dot; padded = after MXU tiling."""
    if padded:
        b, k, n = _pad(b, _SUBLANE), _pad(k, _LANE), _pad(n, _LANE)
    return 2.0 * b * k * n


def admm_iteration_model(
    n: int, m: int, R: int, block: int = 512, refine_steps: int = 0
) -> Dict[str, float]:
    """Per-iteration flops/bytes of the fused ADMM kernel for one block of
    ``block`` scenario lanes (ops/admm_pallas.py _iterate_kernel).

    Matmuls per iteration: y·A (m→n), per rho r: s·AtRho_rᵀ (m→n),
    (base+w)·K⁻¹_r (n→n) plus 2 n→n dots per refinement step, then xt·Aᵀ
    (n→m). State stays in VMEM for the whole chunk, so per-iteration HBM
    traffic is ~zero; bytes are accounted per chunk in
    :func:`admm_chunk_bytes`.
    """
    nn_dots = 1 + 2 * refine_steps
    useful = (
        _matmul_flops(block, n, m, False)  # xt·Aᵀ
        + _matmul_flops(block, m, n, False)  # y·A
        + R
        * (
            _matmul_flops(block, m, n, False)  # s·AtRho_rᵀ
            + nn_dots * _matmul_flops(block, n, n, False)  # K⁻¹ + refine
        )
    )
    padded = (
        _matmul_flops(block, n, m, True)
        + _matmul_flops(block, m, n, True)
        + R
        * (
            _matmul_flops(block, m, n, True)
            + nn_dots * _matmul_flops(block, n, n, True)
        )
    )
    return {"useful_flops": useful, "padded_flops": padded, "block": block}


def admm_chunk_bytes(n: int, m: int, R: int, block: int = 512) -> float:
    """HBM bytes moved per kernel launch for one block: lane state + vectors
    in/out plus the replicated operator matrices."""
    lane_in = block * (2 * n + 4 * m + 1) * 4  # q,l,u,idx,x,s,y,ax
    lane_out = block * (n + 3 * m) * 4
    shared = (2 * R * n * n + R * n * m + m * n + 2 * R * m) * 4  # K⁻¹+K
    return float(lane_in + lane_out + shared)


def admm_diag_model(n: int, m: int, batch: int) -> Dict[str, float]:
    """Between-chunk diagnostics (plain XLA): Px, Aᵀy matmuls + elementwise
    reductions over the full batch, all streamed through HBM."""
    flops = _matmul_flops(batch, n, n, False) + _matmul_flops(batch, m, n, False)
    padded = _matmul_flops(batch, n, n, True) + _matmul_flops(batch, m, n, True)
    # read x,s,y,ax + q,l,u; write residuals/masks (~4 scalars/lane)
    bytes_ = batch * (2 * n + 5 * m + 8) * 4.0
    return {"useful_flops": flops, "padded_flops": padded, "bytes": bytes_}


def speed_of_light(
    op,
    config,
    batch: int,
    mean_iterations: float,
    measured_time_s: float,
    device=None,
) -> Dict[str, float]:
    """Roofline report for a measured fused-ADMM batch solve.

    Returns achieved flop/s, the roofline lower-bound time (max of the MXU
    and HBM limbs over kernel chunks + diagnostics), ``sol_fraction`` =
    roofline_time / measured_time (1.0 = running at the hardware ceiling)
    and ``mfu`` (useful-flops utilization of the f32-HIGHEST ceiling).
    """
    peaks = device_peaks(device)
    n = int(op.K_invs.shape[1])
    m = int(op.A_s.shape[0])
    R = int(op.rho_grid.shape[0])
    block = min(batch, 512)
    n_blocks = max(1, batch // block)
    chunk = max(1, int(config.check_interval))
    n_chunks = max(1.0, float(mean_iterations) / chunk)

    it = admm_iteration_model(
        n, m, R, block, refine_steps=int(getattr(config, "refine_steps", 0))
    )
    kernel_flops_padded = it["padded_flops"] * mean_iterations * n_blocks
    kernel_flops_useful = it["useful_flops"] * mean_iterations * n_blocks
    kernel_bytes = admm_chunk_bytes(n, m, R, block) * n_chunks * n_blocks

    dg = admm_diag_model(n, m, batch)
    diag_flops_padded = dg["padded_flops"] * n_chunks
    diag_flops_useful = dg["useful_flops"] * n_chunks
    diag_bytes = dg["bytes"] * n_chunks

    flops_padded = kernel_flops_padded + diag_flops_padded
    flops_useful = kernel_flops_useful + diag_flops_useful
    bytes_total = kernel_bytes + diag_bytes

    t_mxu = flops_padded / peaks["f32_highest_flops"]
    t_hbm = bytes_total / peaks["hbm_bytes_per_s"]
    roofline_t = max(t_mxu, t_hbm)
    return {
        "device_kind": peaks["device_kind"],
        "n": n,
        "m": m,
        "rho_grid": R,
        "mean_iterations": float(mean_iterations),
        "achieved_padded_tflops": flops_padded / measured_time_s / 1e12,
        "achieved_useful_tflops": flops_useful / measured_time_s / 1e12,
        "roofline_time_s": roofline_t,
        "measured_time_s": measured_time_s,
        "bound": "mxu" if t_mxu >= t_hbm else "hbm",
        "sol_fraction": roofline_t / measured_time_s,
        "mfu": (flops_useful / measured_time_s) / peaks["f32_highest_flops"],
    }


def riccati_iteration_model(
    N: int, nx: int, nu: int, block: int
) -> Dict[str, float]:
    """Per-iteration flops of the sparse Riccati-ADMM engine for one block:
    backward affine sweep (prefactorized gains: K_k e_k + d-recursion
    matvecs) + forward rollout + box projections, O(N) in the horizon."""
    per_step_useful = (
        2.0 * block * nx * nx * 2  # P-recursion matvecs (affine term)
        + 2.0 * block * nx * nu  # gain application K_k x
        + 2.0 * block * nx * (nx + nu)  # forward rollout A x + B u
    )
    per_step_padded = (
        _matmul_flops(block, nx, nx, True) * 2
        + _matmul_flops(block, nx, nu, True)
        + _matmul_flops(block, nx + nu, nx, True)
    )
    return {
        "useful_flops": per_step_useful * N,
        "padded_flops": per_step_padded * N,
        "block": block,
    }
