"""Engine-tier benchmark harness.

The TPU analogue of the reference's reduction-strategy benchmark
(src/benchmark_reductions.cu, C40): where the CUDA project compares three
reduction implementations of the same pricing kernel (naive atomics /
shared-memory tree / warp+block shuffle), this framework compares its
engine tiers of the same estimator:

    scan          sequential lax.scan over steps  (the "naive" tier)
    linear        full shock matmul on the MXU
    exact         Cholesky functional sampling (XLA)
    pallas        fused on-chip RNG + matmul kernel, full steps
    pallas_exact  fused Cholesky kernel

with the same cross-variant price-consistency gate (the reference requires
< 1e-6 absolute agreement between its kernels, benchmark_reductions.cu:
158-169; our tiers consume different random streams, so the gate is
4-sigma statistical).  ``--sweep`` adds the path_block autotune sweep, the
analogue of the block-size sweep (3_sensitivity_analysis.cu:277-371, C39).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import HWConfig
from . import pricing
from .ops.payoffs import cv_estimate
from .utils import io as hwio
from .utils.timing import bench, fetch_rtt

# the scan tier is minutes-slow at full scale on TPU (it is the design
# antipattern the framework exists to avoid); benchmark it at reduced size
SCAN_PATHS = 1 << 16


def run_benchmark(cfg: HWConfig, key, reps: int = 10, sweep: bool = False):
    on_tpu = jax.devices()[0].platform != "cpu"
    engines = ["linear", "exact"]
    bootstrap_engine = "exact"
    if on_tpu:
        from .pallas import fused

        # fused kernels need path_block to be a multiple of their tile;
        # the full-step ZBC kernel only needs TILE_FULL_OPT, the
        # curve/option exact kernels have their own tiles
        if cfg.path_block % fused.TILE_FULL_OPT == 0:
            engines.append("pallas")
        if cfg.path_block % (fused.TILE_OPT * fused.PAD) == 0:
            engines.append("pallas_exact")
        if cfg.path_block % (2 * fused.TILE_EXACT) == 0:
            bootstrap_engine = "pallas_exact"
    rtt = fetch_rtt()
    market = pricing.bootstrap_curve(cfg, key, engine=bootstrap_engine)

    print("--- Engine-tier benchmark: ZBC control-variate pricing ---")
    scan_note = f" (+ scan tier at {SCAN_PATHS} pairs)" if not on_tpu else ""
    print(f"config: {cfg.n_paths} path pairs x {cfg.n_steps_s1} steps to S1"
          f"{scan_note}\n")
    print(f"{'engine':14s} {'time (ms)':>10s} {'M paths/s':>10s} "
          f"{'price':>12s} {'beta':>8s}")

    rows = {}
    for eng in engines:
        prep = pricing._option_prep_fn(cfg, eng, "zbc")(
            cfg.sigma, cfg.sigma, market)
        f = pricing._option_run_fn(cfg, eng, "zbc", None)
        dt, m = bench(f, key, prep, market, n=reps, rtt=rtt)
        est = cv_estimate(jnp.asarray(m), market.P[-1])
        rows[eng] = {"ms": dt * 1e3,
                     "paths_per_sec": 2 * cfg.n_paths / dt,
                     "price": float(est.price), "beta": float(est.beta)}
        print(f"{eng:14s} {dt*1e3:10.3f} {2*cfg.n_paths/dt/1e6:10.0f} "
              f"{float(est.price):12.8f} {float(est.beta):8.4f}", flush=True)

    # scan tier, reduced size (normalized throughput still comparable;
    # the tier exists as the semantic reference — the step-by-step
    # antipattern the framework avoids, ~700x slower than the exact tier
    # at full scale on v5e: 37 M paths/s, RESULTS.md.  Compiles in ~7 s on
    # the current remote toolchain.)
    scan_pairs = min(cfg.n_paths, SCAN_PATHS)
    if True:
        scfg = cfg.replace(n_paths=scan_pairs,
                           path_block=min(cfg.path_block, SCAN_PATHS))
        prep = pricing._option_prep_fn(scfg, "scan", "zbc")(
            scfg.sigma, scfg.sigma, market)
        f = pricing._option_run_fn(scfg, "scan", "zbc", None)
        dt, m = bench(f, key, prep, market, n=3, rtt=rtt)
        est = cv_estimate(jnp.asarray(m), market.P[-1])
        rows["scan"] = {"ms": dt * 1e3,
                        "paths_per_sec": 2 * scfg.n_paths / dt,
                        "price": float(est.price), "beta": float(est.beta),
                        "n_paths": scan_pairs}
        print(f"{f'scan ({scan_pairs})':14s} {dt*1e3:10.3f} "
              f"{2*scfg.n_paths/dt/1e6:10.0f} "
              f"{float(est.price):12.8f} {float(est.beta):8.4f}", flush=True)

    best = max((e for e in rows if e != "scan"),
               key=lambda e: rows[e]["paths_per_sec"])

    base = min(rows, key=lambda e: rows[e]["paths_per_sec"])
    print(f"\nspeedup (best '{best}' vs slowest '{base}'): "
          f"{rows[best]['paths_per_sec']/rows[base]['paths_per_sec']:.1f}x")

    # price-consistency gate (statistical: independent streams); the scan
    # tier runs fewer paths, so its own MC noise sets its tolerance —
    # without this a full-scale run had a ~3% chance of a spurious FAIL
    prices = np.array([r["price"] for r in rows.values()
                       if "n_paths" not in r])
    se = 0.05 / np.sqrt(2 * cfg.n_paths)  # payoff sd ~0.05
    tol = max(8 * se, 3e-4)
    spread = float(np.ptp(prices))
    consistent = spread < tol
    if "scan" in rows:
        se_scan = 0.05 / np.sqrt(2 * scan_pairs)
        scan_dev = abs(rows["scan"]["price"] - float(np.mean(prices)))
        scan_ok = scan_dev < 6 * se_scan + tol
        consistent = consistent and scan_ok
        print(f"scan-tier deviation: {scan_dev:.2e} "
              f"(tol {6 * se_scan + tol:.2e}) -> "
              f"{'PASS' if scan_ok else 'FAIL'}")
    print(f"price consistency: max spread {spread:.2e} "
          f"(tol {tol:.2e}) -> {'PASS' if consistent else 'FAIL'}")

    result = {"engines": rows, "consistency_pass": bool(consistent),
              "price_spread": spread}

    if sweep:
        result["block_sweep"] = _block_sweep(cfg, key, market, rtt,
                                             best if on_tpu else "exact")

    hwio.write_json(hwio.DATA_DIR / "benchmark_engines.json",
                    "Engine benchmark", cfg, results=result)
    print("saved data/benchmark_engines.json")
    return 0 if consistent else 1


def ab_compare(cfg_a, cfg_b, key, market, engine_a, engine_b,
               n_runs: int = 20, label: str = ""):
    """N-run A/B of two (config, engine) arms at the 20-run CI level.

    The statistical-validation analogue of the reference's method-agreement
    z-test (3_sensitivity_analysis.cu:656-695), applied to engineering
    choices instead of estimators: RNG designs (MXU-mixed vs exact
    Gaussian) or MXU precisions (bf16 'default' vs fp32 'highest').  Both
    arms run n_runs independent seeds in one device call each
    (pricing.validate_zbc_runs / validate_vega_runs); the z-score uses the
    measured per-arm standard errors.
    """
    import numpy as np

    out = {"label": label, "n_runs": n_runs,
           "a": f"{engine_a}/{cfg_a.matmul_precision}",
           "b": f"{engine_b}/{cfg_b.matmul_precision}"}
    for kind in ("price", "vega"):
        if kind == "price":
            xa = np.asarray([float(x) for x in pricing.validate_zbc_runs(
                cfg_a, key, market, n_runs=n_runs, engine=engine_a).price])
            xb = np.asarray([float(x) for x in pricing.validate_zbc_runs(
                cfg_b, key, market, n_runs=n_runs, engine=engine_b).price])
        else:
            xa = np.asarray([float(x) for x in pricing.validate_vega_runs(
                cfg_a, key, market, n_runs=n_runs, engine=engine_a)])
            xb = np.asarray([float(x) for x in pricing.validate_vega_runs(
                cfg_b, key, market, n_runs=n_runs, engine=engine_b)])
        # both arms run the SAME folded seeds, so the runs are PAIRED: use
        # the SE of the per-run differences.  For same-engine arms (e.g. a
        # precision A/B on identical normals) the pairing is near-perfect
        # and a deterministic shift shows up at its true (huge) z instead
        # of being washed out by sqrt(se_a^2 + se_b^2); for different
        # engines the streams are independent and the paired SE reduces to
        # the unpaired one.
        d = xa - xb
        diff = float(d.mean())
        se = float(d.std(ddof=1) / np.sqrt(n_runs))
        if se < 1e-15:
            z = 0.0 if abs(diff) < 1e-15 else float("inf") * np.sign(diff)
        else:
            z = diff / se
        out[kind] = {"mean_a": float(xa.mean()), "mean_b": float(xb.mean()),
                     "diff": diff, "se_diff": se, "z": z}
        print(f"[A/B {label}] {kind}: A={xa.mean():.8f} B={xb.mean():.8f} "
              f"diff={diff:+.2e} (paired SE {se:.2e}, z={z:+.2f})")
    return out


def _block_sweep(cfg, key, market, rtt, engine):
    """path_block autotune sweep (analogue of reference C39 block sizes)."""
    print(f"\n--- path_block sweep [{engine}] ---")
    out = {}
    for pb_log2 in [13, 14, 15, 16, 17]:
        pb = 1 << pb_log2
        if cfg.n_paths % pb != 0:
            continue
        c = cfg.replace(path_block=pb)
        try:
            prep = pricing._option_prep_fn(c, engine, "vega")(
                c.sigma, c.sigma, market)
            f = pricing._option_run_fn(c, engine, "vega", None)
            dt, _ = bench(f, key, prep, market, n=10, rtt=rtt)
        except ValueError as e:
            # fused kernels need path_block >= their path tile
            print(f"path_block=2^{pb_log2}: skipped ({e})")
            continue
        out[pb] = dt * 1e3
        print(f"path_block=2^{pb_log2}: {dt*1e3:8.3f} ms "
              f"({c.n_paths/dt/1e6:6.0f} M paths/s)")
    best = min(out, key=out.get)
    print(f"best: path_block={best} ({out[best]:.3f} ms)")
    return {str(k): v for k, v in out.items()}
