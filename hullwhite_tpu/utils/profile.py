"""Compiled-kernel introspection — the TPU analogue of the reference's
CUDA occupancy analyzer (3_sensitivity_analysis.cu:183-239, C34), which
reported registers/thread, shared-memory usage, spilling and theoretical
occupancy before launching the hot kernel.

On TPU the analogous pre-flight introspection is the XLA compile report:
FLOPs and transcendentals from ``cost_analysis`` and the HBM/argument/
output/temp/code footprint from ``memory_analysis``; "occupancy" is
replaced by arithmetic-intensity and roofline utilization against the
device's published peaks.
"""

from __future__ import annotations

from typing import Any

import jax

# rough single-chip peaks for roofline context (published numbers; the
# match is a substring test against str(device), most-specific first)
_PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
    "TPU v6e": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v3": {"bf16_tflops": 123.0, "hbm_gbps": 900.0},
}
# documented fallback when the device string matches no row: v5e-class
# numbers, flagged as assumed so the roofline lines stay interpretable
_DEFAULT_PEAKS = {"bf16_tflops": 197.0, "hbm_gbps": 819.0,
                  "assumed": "unrecognized TPU; v5e-class peaks assumed"}


def kernel_report(fn, *args, static_argnums=()) -> dict[str, Any]:
    """Lower + compile ``fn`` on ``args`` and extract the compile report."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn,
                                                     static_argnums=static_argnums)
    compiled = jitted.lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    try:
        mem = compiled.memory_analysis()
    except Exception:  # noqa: BLE001 - backend-dependent
        mem = None

    report: dict[str, Any] = {
        "flops": cost.get("flops"),
        "transcendentals": cost.get("transcendentals"),
        "bytes_accessed": cost.get("bytes accessed"),
    }
    if mem is not None:
        for field in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
            report[field] = getattr(mem, field, None)
    dev = jax.devices()[0]
    report["device"] = str(dev)
    for name, peaks in _PEAKS.items():
        if name in str(dev):
            report["peaks"] = peaks
            break
    else:
        if dev.platform == "tpu":
            report["peaks"] = _DEFAULT_PEAKS
    if (report.get("peaks") and report.get("flops")
            and report.get("bytes_accessed")):
        report["arithmetic_intensity_flops_per_byte"] = (
            report["flops"] / max(report["bytes_accessed"], 1.0))
    return report


def limiting_factor(report: dict[str, Any],
                    time_s: float | None = None) -> dict[str, Any]:
    """Name the resource that bounds the kernel — the analogue of the
    reference analyzer's 'limiting factor' line (it reports which of
    registers/shared-memory/blocks caps occupancy,
    3_sensitivity_analysis.cu:183-239).

    Pre-flight (no timing): classify by arithmetic intensity against the
    device's roofline ridge point.  With a measured ``time_s``: compute
    both achieved utilizations and name the higher one.
    """
    peaks = report.get("peaks")
    flops = report.get("flops")
    bts = report.get("bytes_accessed")
    if not peaks or not flops or not bts:
        return {"factor": "unknown",
                "detail": "no peak table or cost analysis for this device"}
    ridge = peaks["bf16_tflops"] * 1e12 / (peaks["hbm_gbps"] * 1e9)
    ai = flops / max(bts, 1.0)
    if time_s:
        mxu = flops / time_s / (peaks["bf16_tflops"] * 1e12)
        hbm = bts / time_s / (peaks["hbm_gbps"] * 1e9)
        factor = "MXU compute" if mxu >= hbm else "HBM bandwidth"
        return {"factor": factor, "mxu_utilization": mxu,
                "hbm_utilization": hbm,
                "detail": f"achieved {mxu:.1%} of bf16 peak, "
                          f"{hbm:.1%} of HBM peak"}
    factor = "MXU compute" if ai >= ridge else "HBM bandwidth"
    return {"factor": factor, "arithmetic_intensity": ai,
            "ridge_point": ridge,
            "detail": f"AI {ai:.1f} flop/B vs ridge {ridge:.1f} flop/B"}


def format_report(report: dict[str, Any], time_s: float | None = None) -> str:
    """Human-readable block, printed by the CLI before the hot launch
    (mirrors the reference's 'CUDA Kernel Analysis' section)."""
    lines = ["XLA kernel analysis"]

    def fmt(v, unit=""):
        if v is None:
            return "n/a"
        if v > 1e9:
            return f"{v/1e9:.2f} G{unit}"
        if v > 1e6:
            return f"{v/1e6:.2f} M{unit}"
        return f"{v:.0f} {unit}"

    lines.append(f"  FLOPs:                {fmt(report.get('flops'))}")
    lines.append(f"  transcendentals:      {fmt(report.get('transcendentals'))}")
    lines.append(f"  bytes accessed (HBM): {fmt(report.get('bytes_accessed'), 'B')}")
    for k, label in [("argument_size_in_bytes", "argument bytes"),
                     ("output_size_in_bytes", "output bytes"),
                     ("temp_size_in_bytes", "temp (scratch) bytes"),
                     ("generated_code_size_in_bytes", "code size")]:
        if report.get(k) is not None:
            lines.append(f"  {label + ':':22s}{fmt(report[k], 'B')}")
    ai = report.get("arithmetic_intensity_flops_per_byte")
    if ai is not None:
        lines.append(f"  arithmetic intensity: {ai:.1f} flop/byte")
    if time_s and report.get("peaks"):
        p = report["peaks"]
        if report.get("flops"):
            util = report["flops"] / time_s / (p["bf16_tflops"] * 1e12) * 100
            lines.append(f"  MXU utilization:      {util:.1f}% of bf16 peak")
        if report.get("bytes_accessed"):
            bw = report["bytes_accessed"] / time_s / (p["hbm_gbps"] * 1e9) * 100
            lines.append(f"  HBM utilization:      {bw:.1f}% of peak")
    lf = limiting_factor(report, time_s)
    lines.append(f"  limiting factor:      {lf['factor']} ({lf['detail']})")
    if report.get("peaks", {}).get("assumed"):
        lines.append(f"  NOTE: {report['peaks']['assumed']}")
    return "\n".join(lines)


def format_vmem_datasheet(cfg) -> str:
    """Mosaic-level static table: per fused kernel, the declared VMEM
    working set from the live tile constants (pallas/fused.vmem_datasheet)
    — the second half of the reference's occupancy report (its
    shared/const-memory-per-block lines)."""
    from ..pallas import fused

    lines = ["Fused-kernel VMEM datasheet (declared working set / tile)",
             f"  {'kernel':14s}{'paths/tile':>11s}{'grid':>7s}"
             f"{'VMEM':>11s}  dominant buffer"]
    for name, e in fused.vmem_datasheet(cfg).items():
        dom = max(e["buffers"], key=e["buffers"].get)
        lines.append(
            f"  {name:14s}{e['paths_per_tile']:>11d}{e['grid_tiles']:>7d}"
            f"{e['declared_bytes'] / 2**20:>9.2f} Mi  "
            f"{dom} ({e['buffers'][dom] / 2**20:.2f} Mi)")
    lines.append("  (Mosaic adds scheduling copies; hardware bracket: "
                 "tpu_tests/test_vmem_datasheet.py)")
    return "\n".join(lines)
