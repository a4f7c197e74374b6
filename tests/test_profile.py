"""Compile-report introspection (utils/profile.py) — untested in round 1."""

import jax
import jax.numpy as jnp

from hullwhite_tpu.utils import profile as prof


def test_kernel_report_smoke():
    def f(x):
        return jnp.sum(jnp.dot(x, x, precision="highest"))

    x = jnp.ones((64, 64), jnp.float32)
    rep = prof.kernel_report(f, x)
    assert rep["device"]
    # CPU cost analysis reports flops for the matmul
    if rep.get("flops") is not None:
        assert rep["flops"] >= 2 * 64 ** 3 * 0.5
    s = prof.format_report(rep)
    assert "FLOPs" in s and "limiting factor" in s


def _synthetic(flops, bts):
    return {"flops": flops, "bytes_accessed": bts,
            "peaks": prof._PEAKS["TPU v5 lite"]}


def test_limiting_factor_classification():
    ridge = 197e12 / 819e9  # ~240 flop/B for v5e
    lo = prof.limiting_factor(_synthetic(1e9, 1e9))   # AI 1 << ridge
    hi = prof.limiting_factor(_synthetic(1e15, 1e9))  # AI 1e6 >> ridge
    assert lo["factor"] == "HBM bandwidth"
    assert hi["factor"] == "MXU compute"
    assert abs(lo["ridge_point"] - ridge) < 1.0


def test_limiting_factor_with_timing():
    # 1 ms kernel doing 100 Tflop-equivalents -> MXU-bound
    r = prof.limiting_factor(_synthetic(100e9, 1e6), time_s=1e-3)
    assert r["factor"] == "MXU compute"
    assert r["mxu_utilization"] > r["hbm_utilization"]
    # same bytes at trivial flops -> bandwidth-bound
    r2 = prof.limiting_factor(_synthetic(1e6, 800e6), time_s=1e-3)
    assert r2["factor"] == "HBM bandwidth"


def test_limiting_factor_unknown_device():
    r = prof.limiting_factor({"flops": 1.0, "bytes_accessed": 1.0})
    assert r["factor"] == "unknown"


def test_vmem_datasheet_static_accounting():
    """The declared working sets follow from the live tile constants."""
    from hullwhite_tpu import HWConfig
    from hullwhite_tpu.pallas import fused
    from hullwhite_tpu.utils.profile import format_vmem_datasheet

    cfg = HWConfig()
    sheet = fused.vmem_datasheet(cfg)
    assert set(sheet) == {"curve_full", "curve_exact", "zbc_exact",
                          "vega_exact", "delta_exact", "zbc_full",
                          "vega_full"}
    for e in sheet.values():
        assert e["declared_bytes"] == sum(e["buffers"].values()) > 0
        assert cfg.n_paths % e["paths_per_tile"] == 0
    # the curve exact kernel's two BM half-tiles dominate everything else
    assert (sheet["curve_exact"]["declared_bytes"]
            > sheet["zbc_exact"]["declared_bytes"])
    # all tiles fit the ~16 MiB scoped VMEM budget by design
    assert all(e["declared_bytes"] < 16 * 2**20 for e in sheet.values())
    out = format_vmem_datasheet(cfg)
    assert "curve_exact" in out and "Mi" in out
