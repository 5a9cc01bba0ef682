"""Roofline / MFU accounting from XLA's compiled-program cost analysis.

The reference has no perf accounting at all (SURVEY.md §5 tracing row); the
TPU framework reports, per solver program:

- FLOP/s and %-of-peak (MFU) against the chip's MXU peaks,
- HBM traffic and %-of-peak bandwidth,
- arithmetic intensity (flops/byte), which classifies each domain as
  compute-bound (QAP's matmul deltas) or memory/VPU-bound (nqueens'
  elementwise delta chains) on the roofline.

Flop/byte counts come from ``compiled.cost_analysis()`` — XLA's own
accounting of the optimized HLO — not hand-maintained per-domain constants,
so they stay correct as kernels evolve.  Peaks are public chip specs
(approximate; see PEAKS), defaulting to TPU v5e. MFU here is utilization of
the bf16 MXU peak; solver hot loops are mostly f32 VPU work, so also read
``vpu_frac`` (vs the ~2 TFLOP/s-class VPU) and ``hbm_frac`` before calling
a kernel slow — a VPU-bound op at 1% "MXU MFU" may still be at the
hardware's speed of light.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    name: str
    mxu_bf16: float  # FLOP/s
    mxu_f32: float   # FLOP/s (MXU f32-accumulate path, ~half bf16)
    vpu_f32: float   # FLOP/s (vector unit, approximate)
    hbm_bw: float    # bytes/s


# Public spec numbers (approximate where unpublished).
PEAKS = {
    "v5e": ChipPeaks("v5e", 197e12, 98.5e12, 2.0e12, 819e9),
    "v5p": ChipPeaks("v5p", 459e12, 229.5e12, 4.0e12, 2765e9),
    "cpu": ChipPeaks("cpu", 1e11, 1e11, 1e11, 5e10),  # rough host fallback
}


def detect_peaks() -> ChipPeaks:
    import jax

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5p" in kind or "v5 p" in kind:
        return PEAKS["v5p"]
    if "v5" in kind:  # "TPU v5 lite" = v5e
        return PEAKS["v5e"]
    if dev.platform == "cpu":
        return PEAKS["cpu"]
    return PEAKS["v5e"]


def cost_analysis(jitted, *args) -> dict[str, float]:
    """XLA-accounted flops / HBM bytes of one call of a jitted program."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def roofline(
    flops_per_call: float,
    bytes_per_call: float,
    calls: int,
    wall_s: float,
    peaks: ChipPeaks | None = None,
) -> dict[str, Any]:
    """Measured roofline point: achieved FLOP/s + fractions of each peak."""
    peaks = peaks or detect_peaks()
    f = flops_per_call * calls / wall_s
    b = bytes_per_call * calls / wall_s
    return {
        "chip": peaks.name,
        "flops_per_sec": f,
        "hbm_bytes_per_sec": b,
        "mfu_bf16": f / peaks.mxu_bf16,
        "mfu_f32": f / peaks.mxu_f32,
        "vpu_frac": f / peaks.vpu_f32,
        "hbm_frac": b / peaks.hbm_bw,
        "intensity_flops_per_byte": (flops_per_call / bytes_per_call)
        if bytes_per_call
        else float("inf"),
    }


def chunk_roofline(
    chunk_jit,
    state,
    rounds: int,
    wall_s: float,
    chunk: int = 2,
) -> dict[str, Any]:
    """Roofline of a solver's jitted chunk program over a measured solve.

    XLA's cost analysis of one ``chunk_jit(state, chunk)`` call gives
    flops/bytes per round; scaling by the solve's executed ``rounds`` over
    its measured ``wall_s`` yields the achieved FLOP/s / HBM-bandwidth
    point.  Lowers and compiles one fresh program instance (the live jit
    cache is not reachable through ``.lower()``), so call this after a
    solve, never inside one.
    """
    ca = cost_analysis(chunk_jit, state, chunk)
    per_round_flops = ca["flops"] / chunk
    per_round_bytes = ca["bytes"] / chunk
    out = roofline(per_round_flops, per_round_bytes, max(rounds, 1), max(wall_s, 1e-9))
    out["flops_per_round"] = per_round_flops
    out["hbm_bytes_per_round"] = per_round_bytes
    out["rounds"] = rounds
    out["wall_s"] = wall_s
    return out


def format_roofline(r: dict[str, Any]) -> str:
    return (
        f"[{r['chip']}] {r['flops_per_sec']:.3g} FLOP/s "
        f"(MFU bf16 {100 * r['mfu_bf16']:.2f}%, f32 {100 * r['mfu_f32']:.2f}%, "
        f"VPU {100 * r['vpu_frac']:.1f}%), "
        f"HBM {r['hbm_bytes_per_sec'] / 1e9:.1f} GB/s "
        f"({100 * r['hbm_frac']:.1f}% of peak), "
        f"intensity {r['intensity_flops_per_byte']:.2f} flop/B"
    )
