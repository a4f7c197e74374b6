"""Command-line entry points: q1 / q2 / q3 / benchmark / all.

Replaces the reference's four executables (src/1_bond_pricing.cu,
src/2_option_pricing.cu, src/3_sensitivity_analysis.cu,
src/benchmark_reductions.cu) with argparse subcommands.  Differences by
design (SURVEY §5 "config/flag system"): everything is a flag — no
interactive scanf gates — and validation loops run by default with
``--validate 0`` to disable.

    python -m hullwhite_tpu.cli q1 --engine pallas_exact
    python -m hullwhite_tpu.cli q2 --validate 20
    python -m hullwhite_tpu.cli q3
    python -m hullwhite_tpu.cli benchmark
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from .config import HWConfig
from . import greeks, pricing
from .models import hull_white as hw
from .ops import engine_scan
from .ops.rng import block_normals
from .utils import io as hwio
from .utils import stats as hwstats
from .utils.timing import bench, fetch_rtt


def _default_engine(cfg=None):
    if jax.devices()[0].platform == "cpu":
        return "exact"
    if cfg is not None:
        from .pallas import fused

        # the fused option kernels need path_block to be a multiple of
        # their path tile; small --paths runs fall back to the XLA exact
        # engine (still fast) instead of erroring
        if (cfg.path_block % (fused.TILE_OPT * fused.PAD) != 0
                or cfg.path_block % (2 * fused.TILE_EXACT) != 0):
            return "exact"
    return "pallas_exact"


def _cfg(args) -> HWConfig:
    kw = {}
    if args.paths:
        kw["n_paths"] = args.paths
        # largest power-of-two divisor of n_paths, capped at 2^15 — always a
        # valid block size, so any --paths value is accepted
        kw["path_block"] = min(args.paths & -args.paths, 1 << 15)
    if getattr(args, "precision", None):
        kw["matmul_precision"] = args.precision
    return HWConfig(**kw)


def _key(cfg, args):
    return jax.random.key(args.seed if args.seed is not None else cfg.seed)


# ---------------------------------------------------------------------------
# Q1 — bond pricing / curve bootstrap (reference 1_bond_pricing.cu)
# ---------------------------------------------------------------------------

def cmd_q1(args):
    cfg = _cfg(args)
    key = _key(cfg, args)
    engine = args.engine or _default_engine(cfg)
    print(f"--- Q1: Zero-coupon bond curve bootstrap [{engine}] ---")
    print(f"paths: {cfg.n_paths} x2 antithetic, steps: {cfg.n_steps}, "
          f"maturities: {cfg.n_mat}")

    rtt = fetch_rtt()
    # tables/weights prepare once outside the timed loop (the reference's
    # compute_constants also runs before its cudaEvent window)
    prep = pricing._curve_prep_fn(cfg, engine)(cfg.sigma, cfg.sigma)
    f = pricing._curve_sums_run_fn(cfg, engine, None)
    dt, sums = bench(f, key, prep, n=args.reps, rtt=rtt)
    P = jnp.asarray(sums) / (2.0 * cfg.n_paths)
    market = hw.MarketCurve(P=P, f=hw.forward_from_p(cfg, P))

    ms = dt * 1e3
    paths_s = 2 * cfg.n_paths / dt
    print(f"simulation time: {ms:.2f} ms   throughput: {paths_s/1e6:.0f} M paths/sec")
    Pn, fn = np.asarray(market.P), np.asarray(market.f)
    print(f"P(0,0)  = {Pn[0]:.6f}   (expect 1.0)")
    print(f"P(0,10) = {Pn[-1]:.6f}   (reference: 0.876844)")
    print(f"f(0,0)  = {fn[0]*100:.2f}%   (expect ~1.21%)")

    ok = (0.99 < Pn[0] < 1.01) and (0.3 < Pn[-1] < 0.9) and (0.005 < fn[0] < 0.02)
    print("validation:", "PASS" if ok else "FAIL")

    hwio.save_market(cfg, market)
    hwio.csv_timeseries(hwio.DATA_DIR / "P.csv", "P", Pn, cfg.mat_spacing)
    hwio.csv_timeseries(hwio.DATA_DIR / "f.csv", "f", fn, cfg.mat_spacing)
    hwio.write_json(
        hwio.DATA_DIR / "q1_results.json", "Q1: Bond Pricing", cfg,
        results={"P_0_0": float(Pn[0]), "P_0_10": float(Pn[-1]),
                 "f_0_0": float(fn[0]), "validation_pass": bool(ok),
                 "engine": engine},
        performance=hwio.performance_block(ms, 2 * cfg.n_paths),
        arrays={"P": Pn, "f": fn},
    )

    # 32 sample r(t) trajectories for plotting (reference simulate_paths_show)
    tables = hw.step_tables(cfg, cfg.sigma)
    G = block_normals(jax.random.fold_in(key, 999), 0, (32, cfg.n_steps))
    paths = np.asarray(engine_scan.sample_paths(cfg, tables, G))
    hwio.save_bin(hwio.DATA_DIR / "r_paths.bin", paths.astype(np.float32))

    hwio.summary_init(cfg)
    hwio.summary_append("Q1: BOND PRICING", [
        f"P(0,10) = {Pn[-1]:.6f}",
        f"f(0,0)  = {fn[0]*100:.2f}%",
        f"Simulation: {ms:.2f} ms ({paths_s/1e6:.0f} M paths/sec)",
        f"Validation: {'PASS' if ok else 'FAIL'}",
    ])
    return 0 if ok else 1


# ---------------------------------------------------------------------------
# Q2 — theta recovery + ZBC option pricing (reference 2_option_pricing.cu)
# ---------------------------------------------------------------------------

def cmd_q2(args):
    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 54321)
    engine = args.engine or _default_engine(cfg)
    market = hwio.load_market(cfg)
    print(f"--- Q2: Theta recovery & ZBC option pricing [{engine}] ---")

    # Q2a
    rec = pricing.theta_recovery(cfg, market)
    print("\n[Q2a] theta(T) recovery from f(0,T):")
    stride = max(cfg.n_mat // 10, 1)
    print("   T     theta_true   theta_recovered   |error|")
    for i in range(0, cfg.n_mat, stride):
        print(f"  {float(rec.Ts[i]):4.1f}   {float(rec.theta_true[i]):.6f}"
              f"     {float(rec.theta_recovered[i]):.6f}        "
              f"{abs(float(rec.theta_recovered[i]-rec.theta_true[i])):.2e}")
    print(f"max error:  {rec.max_error:.2e}   mean error: {rec.mean_error:.2e}")
    print(f"recovery: {'SUCCESS' if rec.success else 'FAILED'} (threshold 0.01)")
    hwio.csv_comparison(hwio.DATA_DIR / "theta_comparison.csv",
                        np.asarray(rec.Ts), np.asarray(rec.theta_true),
                        np.asarray(rec.theta_recovered),
                        ["T", "theta_original", "theta_recovered"])
    hwio.write_json(hwio.DATA_DIR / "q2a_results.json", "q2a_results", cfg,
                    results={"max_error": rec.max_error,
                             "mean_error": rec.mean_error,
                             "success": bool(rec.success)})

    # Q2b
    rtt = fetch_rtt()
    prep = pricing._option_prep_fn(cfg, engine, "zbc")(cfg.sigma, cfg.sigma,
                                                       market)
    f = pricing._option_run_fn(cfg, engine, "zbc", None)
    dt, m = bench(f, key, prep, market, n=args.reps, rtt=rtt)
    from .ops.payoffs import cv_estimate

    est = cv_estimate(jnp.asarray(m), market.P[-1])
    ms = dt * 1e3
    print(f"\n[Q2b] ZBC(S1={cfg.s1}, S2={cfg.s2}, K=e^-0.1) with optimal-beta CV:")
    print(f"ZBC raw:                 {float(est.price_raw):.8f}")
    print(f"control mean:            {float(est.mean_control):.8f} "
          f"(expected P(0,S2) = {float(market.P[-1]):.8f})")
    print(f"beta* = Cov/Var:         {float(est.beta):.6f}")
    print(f"correlation:             {float(est.correlation):.6f}")
    print(f"expected var reduction:  {float(est.correlation)**2*100:.1f}% (rho^2)")
    print(f"ZBC (CV adjusted):       {float(est.price):.8f}   (reference: 0.03549203)")
    print(f"simulation time: {ms:.2f} ms   "
          f"throughput: {2*cfg.n_paths/dt/1e6:.0f} M paths/sec")
    hwio.write_json(
        hwio.DATA_DIR / "q2b_results.json", "q2b_results", cfg,
        results={"ZBC_control_variate": float(est.price),
                 "ZBC_raw": float(est.price_raw),
                 "beta_optimal": float(est.beta),
                 "correlation": float(est.correlation),
                 "engine": engine},
        performance=hwio.performance_block(ms, 2 * cfg.n_paths),
    )

    lines = [f"Theta recovery: {'SUCCESS' if rec.success else 'FAILED'} "
             f"(max error {rec.max_error:.2e})",
             f"ZBC option (CV): {float(est.price):.8f}",
             f"beta* = {float(est.beta):.6f}, rho = {float(est.correlation):.4f}"]

    if args.qmc:
        from .ops.qmc import price_zbc_qmc

        res = price_zbc_qmc(cfg, key, market, n_points=args.qmc)
        print(f"\n[Q2b] RQMC (scrambled Sobol, {res.n_points} pts x "
              f"{res.n_shifts} shifts):")
        print(f"price = {float(res.value):.8f} +/- {float(res.std_error):.2e} (SE)")
        # per-leg iid SE; antithetic pairing improves plain MC by a
        # further ~1.45x (measured), which this comparison does not credit
        mc_se = float(jnp.sqrt(est.var_x / est.n))
        print(f"SE vs per-leg-iid MC at 2^{cfg.n_paths.bit_length()-1} pairs: "
              f"{float(res.std_error):.2e} vs {mc_se:.2e} "
              f"({mc_se/max(float(res.std_error),1e-12):.0f}x tighter; "
              f"~{mc_se/1.45/max(float(res.std_error),1e-12):.0f}x vs antithetic MC)")
        lines.append(f"RQMC price: {float(res.value):.8f} "
                     f"+/- {float(res.std_error):.2e}")

    if args.validate:
        lines += _validate_zbc(cfg, key, market, engine, args.validate)
    hwio.summary_append("Q2: THETA RECOVERY & OPTION PRICING", lines)
    return 0 if rec.success else 1


def _validate_zbc(cfg, key, market, engine, n_runs):
    """20-run statistical validation (reference 2_option_pricing.cu:210-468).

    All n runs execute in ONE device call (lax.map over folded keys) —
    the reference's host loop re-launching the kernel per seed costs
    ~30 ms tunnel RTT per run here, so the batch form is what lets the
    validation run at every CI scale."""
    print(f"\n[Q2b] statistical validation: {n_runs} independent runs "
          "(single device call)...")
    est = pricing.validate_zbc_runs(cfg, key, market, n_runs=n_runs,
                                    engine=engine, offset=1000)
    adj = [float(x) for x in est.price]
    raw = [float(x) for x in est.price_raw]
    betas = [float(x) for x in est.beta]
    corrs = [float(x) for x in est.correlation]

    s = hwstats.summarize(adj)
    s_raw = hwstats.summarize(raw)
    s_beta = hwstats.summarize(betas)
    vr = hwstats.variance_reduction_percent(adj, raw)
    print(f"mean price (CV):   {s.mean:.8f}  +/- {s.margin_of_error:.8f} (95% CI)")
    print(f"95% CI:            [{s.ci_lower:.8f}, {s.ci_upper:.8f}]")
    print(f"CV%:               {s.cv_percent:.4f}%")
    print(f"mean price (raw):  {s_raw.mean:.8f}  (sd {s_raw.std:.8f})")
    print(f"variance reduction: {vr:.1f}%")
    print(f"mean beta:         {s_beta.mean:.6f} (sd {s_beta.std:.6f})")
    print(f"mean correlation:  {np.mean(corrs):.4f}")
    if s_beta.std / abs(s_beta.mean) > 0.2:
        print(f"warning: beta varies significantly "
              f"(CV = {100*s_beta.std/abs(s_beta.mean):.1f}%)")
    hwio.csv_rows(hwio.DATA_DIR / "zbc_bootstrap_optimal.csv",
                  ["run", "price_adjusted", "price_raw", "beta_optimal",
                   "correlation"],
                  [(i + 1, adj[i], raw[i], betas[i], corrs[i])
                   for i in range(n_runs)])
    hwio.write_json(
        hwio.DATA_DIR / "zbc_statistics_optimal.json", "q2b_validation",
        cfg, results={
            "n_runs": n_runs, "mean_price": s.mean, "std_dev": s.std,
            "std_error": s.std_error, "ci_95": [s.ci_lower, s.ci_upper],
            "cv_percent": s.cv_percent,
            "variance_reduction_percent": vr,
            "mean_beta": s_beta.mean, "beta_std": s_beta.std,
            "mean_correlation": float(np.mean(corrs)),
            "quartiles": s.quartiles,
        })
    return [f"20-run mean (CV): {s.mean:.8f} +/- {s.margin_of_error:.8f}",
            f"Variance reduction: {vr:.1f}%"]


# ---------------------------------------------------------------------------
# Q3 — sensitivity analysis (reference 3_sensitivity_analysis.cu)
# ---------------------------------------------------------------------------

def cmd_q3(args):
    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 777)
    engine = args.engine or _default_engine(cfg)
    market = hwio.load_market(cfg)
    print(f"--- Q3: Sensitivity analysis (vega) [{engine}] ---")

    rtt = fetch_rtt()
    prep_v = pricing._option_prep_fn(cfg, engine, "vega")(
        cfg.sigma, cfg.sigma, market)
    fv = pricing._option_run_fn(cfg, engine, "vega", None)
    if args.profile:
        # pre-flight compile report (the reference prints its CUDA occupancy
        # analysis before launching the sensitivity kernel).  Opt-in: the
        # AOT lower/compile cannot share the jit cache, so on TPU this
        # costs one extra remote kernel compile.
        try:
            from .utils.profile import format_report, kernel_report

            rep = kernel_report(fv, key, prep_v, market)
            print("\n" + format_report(rep))
        except Exception as e:  # noqa: BLE001 - introspection is best-effort
            print(f"\n(kernel analysis unavailable: {e})")
        from .utils.profile import format_vmem_datasheet

        print("\n" + format_vmem_datasheet(cfg))
    if getattr(args, "trace", None):
        # runtime trace capture: a perfetto/tensorboard trace of the hot
        # launches lands next to the XLA report (open with perfetto.dev
        # or tensorboard --logdir).  The reference's profiling story ends
        # at the static occupancy print; this is the dynamic half.
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(fv(key, prep_v, market))
        print(f"\n[trace] profiler trace written to {args.trace}/")
    dt, v = bench(fv, key, prep_v, market, n=args.reps, rtt=rtt)
    vega_pw = float(v[0] / v[1])
    ms = dt * 1e3
    print("\n[pathwise derivative] simultaneous r(t), dr/dsigma(t):")
    print(f"vega: {vega_pw:.6f}   (reference: 0.229895)")
    print(f"computation: {ms:.2f} ms   throughput: {cfg.n_paths/dt/1e6:.0f} M paths/sec")

    fd = greeks.fd_vega_crn(cfg, key, market, eps=args.eps, engine=engine)
    print(f"\n[finite difference, CRN] eps = {args.eps}:")
    print(f"ZBC(sigma-eps) = {float(fd.price_minus):.8f}")
    print(f"ZBC(sigma+eps) = {float(fd.price_plus):.8f}")
    print(f"FD vega = {float(fd.vega):.6f}   (reference: 0.230316)")

    fdr = greeks.fd_vega_recalibrated(cfg, key, jax.random.fold_in(key, 5),
                                      eps=args.eps, engine=engine)
    print(f"\n[finite difference, full market recalibration]:")
    print(f"FD vega (recalibrated) = {float(fdr.vega):.6f}")
    print("note: recalibration injects curve-level MC noise "
          "(the reference measures 127% error, README.md:51)")

    _, vega_ad = greeks.jvp_vega(cfg, key, market)
    print(f"\n[AD jvp through the simulation]: vega = {float(vega_ad):.6f}")

    rel = abs(vega_pw - float(fd.vega)) / abs(vega_pw) * 100
    print(f"\npathwise vs FD-CRN: {rel:.2f}% difference "
          f"({'<10% PASS' if rel < 10 else 'CHECK'})")
    sign_ok = vega_pw > 0 and float(fd.vega) > 0
    mag_ok = 0.05 < vega_pw < 0.5
    print(f"sign check: {'PASS' if sign_ok else 'FAIL'}   "
          f"magnitude check: {'PASS' if mag_ok else 'FAIL'}")

    results = {"sensitivity_mc": vega_pw, "sensitivity_fd": float(fd.vega),
               "sensitivity_fd_recalibrated": float(fdr.vega),
               "sensitivity_ad_jvp": float(vega_ad),
               "abs_diff": abs(vega_pw - float(fd.vega)), "engine": engine}

    if args.qmc:
        from .ops.qmc import vega_zbc_qmc

        res = vega_zbc_qmc(cfg, key, market, n_points=args.qmc)
        print(f"\n[RQMC vega] {res.n_points} pts x {res.n_shifts} shifts: "
              f"{float(res.value):.6f} +/- {float(res.std_error):.2e} (SE)")
        results["sensitivity_qmc"] = float(res.value)
        results["sensitivity_qmc_se"] = float(res.std_error)
    lines = [f"Sens (MC): {vega_pw:.6f}", f"Sens (FD): {float(fd.vega):.6f}",
             f"Sens (FD recal): {float(fdr.vega):.6f}"]

    if args.validate:
        print(f"\nstatistical validation: {args.validate} independent runs "
              "(single device call)...")
        samples = [float(x) for x in pricing.validate_vega_runs(
            cfg, key, market, n_runs=args.validate, engine=engine,
            offset=2000)]
        s = hwstats.summarize(samples)
        print(f"mean vega: {s.mean:.6f}   sd: {s.std:.6f}   SE: {s.std_error:.6f}")
        print(f"95% CI: [{s.ci_lower:.6f}, {s.ci_upper:.6f}]   CV: {s.cv_percent:.4f}%")
        agree = hwstats.method_agreement(vega_pw, float(fd.vega), s.std_error)
        print(f"z-score pathwise vs FD: {agree.z_score:.2f} -> "
              f"{agree.interpretation}")
        hwio.csv_rows(hwio.DATA_DIR / "vega_bootstrap.csv", ["run", "vega"],
                      [(i + 1, x) for i, x in enumerate(samples)])
        results.update({"validation_mean": s.mean, "validation_se": s.std_error,
                        "validation_ci": [s.ci_lower, s.ci_upper],
                        "z_score_vs_fd": agree.z_score})
        lines.append(f"20-run vega: {s.mean:.6f} +/- {s.margin_of_error:.6f}")

    hwio.write_json(hwio.DATA_DIR / "q3_results.json",
                    "Q3: Sensitivity Analysis", cfg, results=results,
                    performance=hwio.performance_block(ms, cfg.n_paths))
    hwio.summary_append("Q3: SENSITIVITY ANALYSIS", lines)
    return 0


# ---------------------------------------------------------------------------
# swaption / grid — instrument-family extensions (beyond the reference)
# ---------------------------------------------------------------------------

def cmd_swaption(args):
    from . import bermudan as bermudan_mod
    from . import instruments

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 4242)
    market = hwio.load_market(cfg)
    kind = "payer" if args.payer else "receiver"
    print(f"--- European {kind} swaption: expiry {cfg.s1}y, "
          f"tenor {args.tenor}y @ {args.rate*100:.2f}% ---")
    est = instruments.price_swaption(cfg, key, market, rate=args.rate,
                                     tenor=args.tenor, freq=args.freq,
                                     payer=args.payer)
    sched = instruments.swap_fixed_leg(cfg, args.rate, args.tenor, args.freq)
    jam = instruments.jamshidian_price(cfg, market, sched, payer=args.payer)
    qp, qse = instruments.price_coupon_bond_option_qmc(
        cfg, key, market, sched, 1.0, payer=args.payer)
    print(f"MC (CV-adjusted):   {float(est.price):.8f}  (beta {float(est.beta):.4f})")
    print(f"RQMC:               {float(qp):.8f} +/- {float(qse):.2e} (SE)")
    print(f"Jamshidian (exact): {jam:.8f}")
    results = {"mc_price": float(est.price), "qmc_price": float(qp),
               "qmc_se": float(qse), "jamshidian": jam,
               "rate": args.rate, "tenor": args.tenor, "payer": args.payer}
    if args.bermudan:
        ex = [cfg.s1 + j for j in range(int(args.tenor))]
        res = bermudan_mod.price_bermudan(cfg, key, market, sched,
                                          ex, payer=args.payer)
        orc = bermudan_mod.dp_oracle(cfg, market, sched, ex,
                                     payer=args.payer)
        print(f"Bermudan ({len(ex)} annual exercises): "
              f"[{float(res.price_cv):.8f}, {float(res.upper):.8f}] "
              f"(SE {float(res.cv_std_error):.2e}/"
              f"{float(res.upper_std_error):.2e}; raw LSMC lower "
              f"{float(res.price):.8f} +/- {float(res.std_error):.2e}; "
              f"DP oracle {orc:.8f}; "
              f"early-exercise premium {float(res.price_cv)-jam:.6f})")
        results["bermudan_lower"] = float(res.price)
        results["bermudan_lower_cv"] = float(res.price_cv)
        results["bermudan_cv_se"] = float(res.cv_std_error)
        results["bermudan_upper"] = float(res.upper)
        results["bermudan_dp_oracle"] = orc
        results["bermudan_se"] = float(res.std_error)
        if args.delta:
            h = 1e-3
            dl, du = greeks.bermudan_delta(cfg, key, market, sched, ex,
                                           payer=args.payer, h=h)
            d_dp = (bermudan_mod.dp_oracle(
                        cfg, greeks.shift_curve(cfg, market, +h), sched,
                        ex, payer=args.payer)
                    - bermudan_mod.dp_oracle(
                        cfg, greeks.shift_curve(cfg, market, -h), sched,
                        ex, payer=args.payer)) / (2.0 * h)
            print(f"Bermudan curve-delta (parallel shift): "
                  f"[{dl:.6f}, {du:.6f}]  DP oracle {d_dp:.6f}")
            results["bermudan_delta_lower"] = dl
            results["bermudan_delta_upper"] = du
            results["bermudan_delta_dp_oracle"] = d_dp
    hwio.write_json(hwio.DATA_DIR / "swaption_results.json",
                    "Swaption pricing", cfg, results=results)
    if args.bermudan_sweep:
        sweep = {"k": [], "lower": [], "lower_se": [], "upper": [],
                 "upper_se": [], "dp_oracle": [], "european": jam}
        print(f"\n--- Bermudan sweep: bracket vs exercise rights ---")
        # annual exercises must precede the last cashflow at s1 + tenor
        max_k = min(5, int(np.ceil(args.tenor)))
        for k in range(1, max_k + 1):
            ex = [cfg.s1 + j for j in range(k)]
            res = bermudan_mod.price_bermudan(cfg, key, market, sched,
                                              ex, payer=args.payer)
            orc = bermudan_mod.dp_oracle(cfg, market, sched, ex,
                                         payer=args.payer)
            print(f"k={k}: [{float(res.price_cv):.8f}, "
                  f"{float(res.upper):.8f}]  DP {orc:.8f}")
            sweep["k"].append(k)
            sweep["lower"].append(float(res.price_cv))
            sweep["lower_se"].append(float(res.cv_std_error))
            sweep["upper"].append(float(res.upper))
            sweep["upper_se"].append(float(res.upper_std_error))
            sweep["dp_oracle"].append(orc)
        hwio.write_json(hwio.DATA_DIR / "bermudan_sweep.json",
                        "Bermudan exercise-rights sweep", cfg,
                        results=sweep)
    return 0


def cmd_calibrate(args):
    """Joint parameter calibration roundtrip on the loaded market: build
    closed-form quotes at ground-truth parameters, start far away,
    recover (beyond-reference; the CUDA project hard-codes a and sigma,
    common.cuh:31-39)."""
    from .instruments import swap_fixed_leg
    from .models import g2pp

    cfg = _cfg(args)
    market = hwio.load_market(cfg)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    results = {}

    print(f"--- Hull-White joint (a, sigma) calibration ---")
    pricers = [greeks.zbc_quote(market),
               greeks.cap_quote(market, rate=0.02, tenor=4.0),
               greeks.swaption_quote(market, sched)]
    quotes = [(p, p(cfg)) for p in pricers]
    res = greeks.calibrate_hw(cfg, quotes, a0=cfg.a / 2,
                              sigma0=cfg.sigma / 2)
    print(f"true (a, sigma) = ({cfg.a}, {cfg.sigma});  start = "
          f"({cfg.a / 2}, {cfg.sigma / 2})")
    print(f"recovered: a = {res.a:.8f}  sigma = {res.sigma:.8f}  "
          f"(rmse {res.rmse:.2e}, {res.n_iter} iterations)")
    ok = abs(res.a - cfg.a) < 1e-4 and abs(res.sigma - cfg.sigma) < 1e-5
    results.update({"hw_a": res.a, "hw_sigma": res.sigma,
                    "hw_rmse": res.rmse, "hw_iters": res.n_iter})

    g_true = g2pp.G2Params(a=args.g2a, b=args.g2b, sigma=args.g2sigma,
                           eta=args.g2eta, rho=args.g2rho)
    sched3 = swap_fixed_leg(cfg, 0.03, 3.0)
    gp = [lambda g: g2pp.zbc_price_analytic(cfg, g, market),
          lambda g: g2pp.swaption_g2_analytic(cfg, g, market, sched),
          lambda g: g2pp.swaption_g2_analytic(cfg, g, market, sched3,
                                              payer=True),
          lambda g: g2pp.cap_closed_form_g2(cfg, g, market, rate=0.02)[0]]
    gq = [(p, p(g_true)) for p in gp]
    g0 = g2pp.G2Params(a=g_true.a, b=g_true.b, sigma=2 * g_true.sigma,
                       eta=2 * g_true.eta, rho=-g_true.rho / 2)
    gres = g2pp.calibrate_g2(cfg, g0, gq)
    print(f"\n--- G2++ (sigma, eta, rho) calibration, (a, b) fixed ---")
    print(f"true = ({g_true.sigma}, {g_true.eta}, {g_true.rho})")
    print(f"recovered: sigma = {gres.params.sigma:.8f}  "
          f"eta = {gres.params.eta:.8f}  rho = {gres.params.rho:.6f}  "
          f"(rmse {gres.rmse:.2e}, {gres.n_iter} iterations)")
    ok = ok and (abs(gres.params.sigma - g_true.sigma) < 1e-5
                 and abs(gres.params.eta - g_true.eta) < 1e-5
                 and abs(gres.params.rho - g_true.rho) < 1e-3)
    results.update({"g2_sigma": gres.params.sigma,
                    "g2_eta": gres.params.eta, "g2_rho": gres.params.rho,
                    "g2_rmse": gres.rmse, "g2_iters": gres.n_iter})
    hwio.write_json(hwio.DATA_DIR / "calibration_results.json",
                    "Parameter calibration", cfg, results=results)
    print("\nvalidation:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def cmd_cap(args):
    """Cap/floor pricing: MC on exact multi-date states vs the per-caplet
    ZBP closed forms (instrument family beyond the reference)."""
    from . import instruments

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 6161)
    market = hwio.load_market(cfg)
    kind = "floor" if args.floor else "cap"
    print(f"--- {kind}: start {cfg.s1}y, tenor {args.tenor}y @ "
          f"{args.rate*100:.2f}%, freq {args.freq}/y ---")
    res = instruments.price_cap(cfg, key, market, rate=args.rate,
                                tenor=args.tenor, freq=args.freq,
                                floor=args.floor)
    tot, per = instruments.cap_closed_form(cfg, market, rate=args.rate,
                                           tenor=args.tenor, freq=args.freq,
                                           floor=args.floor)
    print(f"MC:           {float(res.price):.8f} +/- {float(res.std_error):.2e} (SE)")
    print(f"closed form:  {tot:.8f}")
    print("per-caplet MC:", np.array2string(np.asarray(res.caplets),
                                            precision=6))
    z = (float(res.price) - tot) / max(float(res.std_error), 1e-12)
    # Curve-noise allowance: the MC bond reconstruction A(t1,t2) consumes
    # the DIFFERENTIATED forward curve f(0,t1) of the noisy MC bootstrap,
    # while the closed form uses only P levels, so conditional on one
    # curve draw the two sit a few e-5 apart with a common sign (mean-zero
    # across curve draws; measured +7e-5-scale — see RESULTS.md Q2b note).
    ok = abs(z) < 4 or abs(float(res.price) - tot) < 2e-4
    print(f"agreement: z = {z:.2f} "
          f"({'PASS' if ok else 'CHECK'}; curve-noise allowance 2e-4)")
    v = greeks.fd_vega_cap(cfg, key, market, rate=args.rate,
                           tenor=args.tenor, freq=args.freq,
                           floor=args.floor)
    e = 1e-5
    va = (instruments.cap_closed_form(
              cfg, market, rate=args.rate, tenor=args.tenor,
              freq=args.freq, floor=args.floor, sigma=cfg.sigma + e)[0]
          - instruments.cap_closed_form(
              cfg, market, rate=args.rate, tenor=args.tenor,
              freq=args.freq, floor=args.floor, sigma=cfg.sigma - e)[0]
          ) / (2 * e)
    print(f"vega (CRN-FD): {v:.6f}   closed-form FD {va:.6f}")
    hwio.write_json(hwio.DATA_DIR / f"{kind}_results.json",
                    f"{kind} pricing", cfg,
                    results={"mc_price": float(res.price),
                             "mc_se": float(res.std_error),
                             "closed_form": tot, "z": z,
                             "vega_fd": v, "vega_closed_fd": va,
                             "caplets_mc": [float(x) for x in res.caplets],
                             "caplets_closed": per})
    return 0 if ok else 1


def cmd_rfr(args):
    """Backward-looking RFR caplet/floorlet (compounded + averaged
    overnight-rate styles, the post-LIBOR convention family) vs the
    exact tilted Black/Bachelier closed forms; HW and optional G2++
    twins (product family beyond the reference)."""
    from . import rfr

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 8282)
    market = hwio.load_market(cfg)
    style = "averaged" if args.averaged else "compounded"
    start = cfg.s1 if args.start is None else args.start
    span = dict(start=start, tenor=args.tenor, freq=args.freq) \
        if args.end is None else dict(start=start, end=args.end)
    mckw = dict(n_obs=args.n_obs, **span)
    if args.rqmc:
        # 8 digital-shift replicates at the same total path budget
        mckw.update(rqmc=True, n_blocks=8,
                    n_paths=max(cfg.n_paths // 8, 1024))
    label = (f"[{start}, {args.end}]y" if args.end is not None
             else f"{args.tenor}y strip @ {args.freq}/y from {start}y")
    print(f"--- RFR {style} cap/floor: {label} @ "
          f"{args.strike*100:.2f}%{' (RQMC)' if args.rqmc else ''} ---")
    out, ok = {}, True
    for floor in (False, True):
        kind = "floor" if floor else "cap"
        res = rfr.price_rfr_cap(cfg, key, market, strike=args.strike,
                                style=style, floor=floor, **mckw)
        orc, per = rfr.rfr_cap_closed_form(cfg, strike=args.strike,
                                           style=style, floor=floor,
                                           n_obs=args.n_obs, **span)
        z = (float(res.price) - orc) / max(float(res.std_error), 1e-12)
        ok &= abs(z) < 4
        print(f"{kind:5s} MC {float(res.price):.8f} +/- "
              f"{float(res.std_error):.2e}   closed form {orc:.8f}   "
              f"z = {z:+.2f}")
        out[kind] = {"mc": float(res.price), "se": float(res.std_error),
                     "closed_form": orc, "z": z,
                     "caplets_mc": [float(x) for x in res.caplets],
                     "caplets_closed": per}
    _, v = rfr.vega_rfr_cap(cfg, key, strike=args.strike, style=style,
                            **mckw)
    e = 1e-5
    va = (rfr.rfr_cap_closed_form(cfg, strike=args.strike, style=style,
                                  n_obs=args.n_obs, sigma=cfg.sigma + e,
                                  **span)[0]
          - rfr.rfr_cap_closed_form(cfg, strike=args.strike, style=style,
                                    n_obs=args.n_obs, sigma=cfg.sigma - e,
                                    **span)[0]) / (2 * e)
    print(f"cap vega (one jvp): {float(v):.6f}   closed-form FD {va:.6f}")
    out["vega_jvp"], out["vega_closed_fd"] = float(v), va
    if args.g2:
        from .models.g2pp import G2Params

        g = G2Params(a=args.g2a, b=args.g2b, sigma=args.g2sigma,
                     eta=args.g2eta, rho=args.g2rho)
        for floor in (False, True):
            kind = "floor" if floor else "cap"
            res = rfr.price_rfr_cap_g2(cfg, g, key, market,
                                       strike=args.strike, style=style,
                                       floor=floor, **mckw)
            orc, _ = rfr.rfr_cap_closed_form_g2(cfg, g, market,
                                                strike=args.strike,
                                                style=style,
                                                n_obs=args.n_obs,
                                                floor=floor, **span)
            z = (float(res.price) - orc) / max(float(res.std_error), 1e-12)
            ok &= abs(z) < 4
            print(f"G2++ {kind:5s} MC {float(res.price):.8f} +/- "
                  f"{float(res.std_error):.2e}   closed form {orc:.8f}   "
                  f"z = {z:+.2f}")
            out[f"g2_{kind}"] = {"mc": float(res.price),
                                 "se": float(res.std_error),
                                 "closed_form": orc, "z": z}
    hwio.write_json(hwio.DATA_DIR / "rfr_results.json",
                    f"RFR {style} caplet/floorlet", cfg, results=out)
    print(f"agreement: {'PASS' if ok else 'CHECK'}")
    return 0 if ok else 1


def cmd_cms(args):
    """CMS cap/floor leg: constant-maturity-swap caplets (convexity-
    bearing payoff) on the exact multi-date states vs the fp64 tilted-
    quadrature oracle (round 3; product family beyond the reference)."""
    from . import instruments

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 7171)
    market = hwio.load_market(cfg)
    kind = "CMS floor" if args.floor else "CMS cap"
    print(f"--- {kind}: start {cfg.s1}y, tenor {args.tenor}y @ "
          f"{args.rate*100:.2f}%, underlying {args.swap_tenor}y swap ---")
    res = instruments.price_cms(cfg, key, market, rate=args.rate,
                                tenor=args.tenor, freq=args.freq,
                                swap_tenor=args.swap_tenor,
                                floor=args.floor)
    orc, per = instruments.cms_quadrature(
        cfg, market, rate=args.rate, tenor=args.tenor, freq=args.freq,
        swap_tenor=args.swap_tenor, floor=args.floor)
    print(f"MC:         {float(res.price):.8f} "
          f"+/- {float(res.std_error):.2e} (SE)")
    print(f"quadrature: {orc:.8f}")
    print("per-period MC:", np.array2string(np.asarray(res.periods),
                                            precision=6))
    z = (float(res.price) - orc) / max(float(res.std_error), 1e-12)
    ok = abs(z) < 4 or abs(float(res.price) - orc) < 2e-4
    print(f"agreement: z = {z:.2f} ({'PASS' if ok else 'CHECK'})")
    results = {"mc_price": float(res.price),
               "mc_se": float(res.std_error),
               "quadrature": orc, "z": z,
               "periods_mc": [float(x) for x in res.periods],
               "periods_quadrature": per}
    if args.g2:
        from .models import g2pp

        g2 = g2pp.G2Params()
        r2 = g2pp.price_cms_g2(cfg, g2, key, market, rate=args.rate,
                               tenor=args.tenor, freq=args.freq,
                               swap_tenor=args.swap_tenor,
                               floor=args.floor)
        o2, _ = g2pp.cms_quadrature_g2(cfg, g2, market, rate=args.rate,
                                       tenor=args.tenor, freq=args.freq,
                                       swap_tenor=args.swap_tenor,
                                       floor=args.floor)
        z2 = (float(r2.price) - o2) / max(float(r2.std_error), 1e-12)
        ok2 = abs(z2) < 4 or abs(float(r2.price) - o2) < 2e-4
        print(f"G2++ twin:  MC {float(r2.price):.8f} "
              f"+/- {float(r2.std_error):.2e}  quadrature {o2:.8f}  "
              f"z = {z2:.2f} ({'PASS' if ok2 else 'CHECK'})")
        ok = ok and ok2
        results["g2"] = {"mc_price": float(r2.price),
                         "mc_se": float(r2.std_error),
                         "quadrature": o2, "z": z2}
    hwio.write_json(hwio.DATA_DIR / "cms_results.json", kind, cfg,
                    results=results)
    return 0 if ok else 1


def cmd_xva(args):
    """Counterparty exposure profile (EE / PFE) + CVA on a vanilla swap,
    MC vs the per-date closed-form oracle, plus the jvp/CRN-FD/oracle
    CVA vega triple (beyond-reference XVA layer on the sensitivity
    machinery of src/3_sensitivity_analysis.cu)."""
    from . import xva

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 9292)
    market = hwio.load_market(cfg)
    kw = dict(rate=args.rate, tenor=args.tenor, freq=args.freq,
              payer=args.payer, quantile=args.quantile,
              hazard=args.hazard, recovery=args.recovery)
    side = "payer" if args.payer else "receiver"
    print(f"--- XVA: {side} swap @ {args.rate*100:.2f}%, start {cfg.s1}y, "
          f"tenor {args.tenor}y; hazard {args.hazard*100:.1f}%, "
          f"recovery {args.recovery*100:.0f}%, PFE q={args.quantile} ---")
    o = xva.exposure_oracle(cfg, market, **kw)
    res = xva.price_exposure(cfg, key, market, n_blocks=args.n_blocks,
                             rqmc=bool(args.rqmc), **kw)
    prof = res.profile
    ee, se = np.asarray(prof.ee), np.asarray(prof.ee_std_error)
    exceed = np.asarray(prof.exceed)
    ok = True
    print("  date    EE (MC)        +/-SE      EE (oracle)     z   "
          "PFE        exceed")
    for j, t in enumerate(prof.dates):
        z = (ee[j] - o.ee[j]) / max(se[j], 1e-12)
        ok = ok and (abs(z) < 5 or abs(ee[j] - o.ee[j]) < 1e-5)
        print(f"  {t:5.2f}  {ee[j]:.8f}  {se[j]:.2e}  {o.ee[j]:.8f}  "
              f"{z:+5.2f}  {o.pfe[j]:.6f}  {exceed[j]:.4f}")
    zc = (float(res.cva) - o.cva) / max(float(res.std_error), 1e-12)
    ok = ok and abs(zc) < 5
    print(f"CVA:  MC {float(res.cva):.8f} +/- {float(res.std_error):.2e}"
          f"  oracle {o.cva:.8f}  z = {zc:+.2f}"
          f"  (raw SE {float(res.raw_std_error):.2e}, CV "
          f"{float(res.raw_std_error)/max(float(res.std_error),1e-30):.1f}x)")
    print(f"dCVA/dhazard:  MC {float(res.hazard_delta):.6f}  "
          f"oracle {o.hazard_delta:.6f}")
    v = xva.vega_cva(cfg, key, market, n_blocks=max(args.n_blocks, 2),
                     **kw)
    dv = abs(float(v.vega) - v.oracle_vega) / max(abs(v.oracle_vega),
                                                  1e-12)
    ok = ok and dv < 0.05
    print(f"CVA vega:  jvp {float(v.vega):.6f}  CRN-FD "
          f"{float(v.fd_vega):.6f}  oracle-FD {v.oracle_vega:.6f}  "
          f"(rel diff {dv:.1e})")
    net_res = {}
    if args.netting:
        legs = ((args.rate, args.tenor, args.payer),
                (args.rate * 0.6, max(args.tenor - 1.0, 1.0),
                 not args.payer),
                (args.rate * 1.5, max(args.tenor - 2.0, 1.0), args.payer))
        on = xva.netting_oracle(cfg, market, legs, freq=args.freq,
                                quantile=args.quantile,
                                hazard=args.hazard,
                                recovery=args.recovery)
        rn = xva.price_netting(cfg, key, market, legs, freq=args.freq,
                               quantile=args.quantile, hazard=args.hazard,
                               recovery=args.recovery,
                               n_blocks=args.n_blocks,
                               rqmc=bool(args.rqmc))
        stand = [xva.exposure_oracle(cfg, market, rate=rr, tenor=tt,
                                     payer=pp, freq=args.freq,
                                     hazard=args.hazard,
                                     recovery=args.recovery)
                 for (rr, tt, pp) in legs]
        zn = (float(rn.cva) - on.cva) / max(float(rn.std_error), 1e-12)
        ok = ok and abs(zn) < 5
        benefit = sum(o.cva for o in stand) - on.cva
        print(f"netting set ({len(legs)} swaps): CVA MC "
              f"{float(rn.cva):.8f} +/- {float(rn.std_error):.2e}  "
              f"oracle {on.cva:.8f}  z = {zn:+.2f}  netting benefit "
              f"{benefit:.6f} ({benefit/sum(o.cva for o in stand)*100:.1f}"
              f"% of standalone)")
        vn = xva.vega_cva_netting(cfg, key, market, legs, freq=args.freq,
                                  quantile=args.quantile,
                                  hazard=args.hazard,
                                  recovery=args.recovery,
                                  n_blocks=args.n_blocks,
                                  rqmc=bool(args.rqmc))
        dvn = abs(float(vn.vega) - vn.oracle_vega) / max(
            abs(vn.oracle_vega), 1e-12)
        ok = ok and dvn < 0.05
        print(f"netted CVA vega:  jvp {float(vn.vega):.6f}  CRN-FD "
              f"{float(vn.fd_vega):.6f}  oracle-FD {vn.oracle_vega:.6f} "
              f" (rel diff {dvn:.1e})")
        net_res = {"netting": {
            "legs": [list(l) for l in legs], "cva_mc": float(rn.cva),
            "cva_se": float(rn.std_error), "cva_oracle": on.cva,
            "cva_z": zn, "benefit": benefit,
            "vega_jvp": float(vn.vega), "vega_fd": float(vn.fd_vega),
            "vega_oracle": vn.oracle_vega,
            "ee_oracle": [float(x) for x in on.ee],
            "ee_mc": np.asarray(rn.profile.ee).tolist(),
            "pfe": [float(x) for x in on.pfe],
            "exceed": np.asarray(rn.profile.exceed).tolist()}}
    csa_res = {}
    if args.csa:
        legs1 = ((args.rate, args.tenor, args.payer),)
        oc = xva.collateral_oracle(cfg, market, legs1,
                                   threshold=args.threshold, lag=args.lag,
                                   freq=args.freq, quantile=args.quantile,
                                   hazard=args.hazard,
                                   recovery=args.recovery)
        rc = xva.price_collateral(cfg, key, market, legs1,
                                  threshold=args.threshold, lag=args.lag,
                                  freq=args.freq, quantile=args.quantile,
                                  hazard=args.hazard,
                                  recovery=args.recovery,
                                  n_blocks=args.n_blocks,
                                  rqmc=bool(args.rqmc))
        zcsa = (float(rc.cva) - oc.cva) / max(float(rc.std_error), 1e-12)
        ok = ok and abs(zcsa) < 5
        red = 1.0 - oc.cva / o.cva
        print(f"CSA (H={args.threshold}, MPoR {args.lag} periods): "
              f"CVA MC {float(rc.cva):.8f} +/- {float(rc.std_error):.2e}"
              f"  oracle {oc.cva:.8f}  z = {zcsa:+.2f}  "
              f"collateral cuts CVA {red*100:.1f}%")
        csa_res = {"csa": {
            "threshold": args.threshold, "lag": args.lag,
            "cva_mc": float(rc.cva), "cva_se": float(rc.std_error),
            "cva_oracle": oc.cva, "cva_z": zcsa,
            "cva_reduction": red,
            "ee_oracle": [float(x) for x in oc.ee],
            "ee_mc": np.asarray(rc.profile.ee).tolist(),
            "ee_se": np.asarray(rc.profile.ee_std_error).tolist(),
            "pfe": [float(x) for x in oc.pfe],
            "exceed": np.asarray(rc.profile.exceed).tolist()}}
    bil_res = {}
    if args.bilateral:
        legs1 = ((args.rate, args.tenor, args.payer),)
        bkw = dict(freq=args.freq, hazard=args.hazard,
                   recovery=args.recovery, hazard_own=args.hazard_own,
                   recovery_own=args.recovery_own,
                   spread_borrow=args.spread_borrow,
                   spread_lend=args.spread_lend)
        ob = xva.bilateral_oracle(cfg, market, legs1, **bkw)
        rb = xva.price_bilateral(cfg, key, market, legs1,
                                 quantile=args.quantile,
                                 n_blocks=args.n_blocks,
                                 rqmc=bool(args.rqmc), **bkw)
        zb = (float(rb.bcva) - ob.bcva) / max(float(rb.bcva_se), 1e-12)
        zf = (float(rb.fva) - ob.fva) / max(float(rb.fva_se), 1e-12)
        ok = ok and abs(zb) < 5 and abs(zf) < 5
        print(f"bilateral: BCVA MC {float(rb.bcva):.8f} +/- "
              f"{float(rb.bcva_se):.2e}  oracle {ob.bcva:.8f}  "
              f"z = {zb:+.2f}  (CVA {float(rb.cva):.6f} - DVA "
              f"{float(rb.dva):.6f})")
        print(f"           FVA  MC {float(rb.fva):.8f} +/- "
              f"{float(rb.fva_se):.2e}  oracle {ob.fva:.8f}  "
              f"z = {zf:+.2f}  (FCA {float(rb.fca):.6f} - FBA "
              f"{float(rb.fba):.6f})")
        bil_res = {"bilateral": {
            **{k: float(v) for k, v in bkw.items()},
            "bcva_mc": float(rb.bcva), "bcva_se": float(rb.bcva_se),
            "bcva_oracle": ob.bcva, "bcva_z": zb,
            "fva_mc": float(rb.fva), "fva_se": float(rb.fva_se),
            "fva_oracle": ob.fva, "fva_z": zf,
            "cva": float(rb.cva), "dva": float(rb.dva),
            "fca": float(rb.fca), "fba": float(rb.fba),
            "ene_mc": np.asarray(rb.ene).tolist(),
            "ene_oracle": [float(x) for x in ob.ene]}}
    wwr_res = {}
    if args.wwr:
        legsw = ((args.rate, args.tenor, args.payer),)
        wkw = dict(lambda0=args.hazard, gamma=args.gamma, freq=args.freq,
                   recovery=args.recovery)
        ow = xva.wwr_oracle(cfg, market, legsw, **wkw)
        rw = xva.price_wwr(cfg, key, market, legsw,
                           quantile=args.quantile,
                           n_blocks=args.n_blocks,
                           rqmc=bool(args.rqmc), **wkw)
        zw = (float(rw.cva) - ow.cva) / max(float(rw.std_error), 1e-12)
        zg = (float(rw.gamma_delta) - ow.gamma_delta) \
            / max(float(rw.gamma_delta_se), 1e-12)
        zl = (float(rw.lambda0_delta) - ow.lambda0_delta) \
            / max(float(rw.lambda0_delta_se), 1e-12)
        ok = ok and abs(zw) < 5 and abs(zg) < 5 and abs(zl) < 5
        print(f"WWR (lambda = {args.hazard} + {args.gamma} r): CVA MC "
              f"{float(rw.cva):.8f} +/- {float(rw.std_error):.2e}  "
              f"oracle {ow.cva:.8f}  z = {zw:+.2f}  WWR multiplier "
              f"{ow.wwr_ratio:.3f}x")
        print(f"     dCVA/dgamma MC {float(rw.gamma_delta):.6f} "
              f"(z {zg:+.2f})  dCVA/dlambda0 MC "
              f"{float(rw.lambda0_delta):.6f} (z {zl:+.2f}), both "
              f"pathwise vs oracle FD")
        wwr_res = {"wwr": {
            "gamma": args.gamma, "lambda0": args.hazard,
            "cva_mc": float(rw.cva), "cva_se": float(rw.std_error),
            "cva_oracle": ow.cva, "cva_z": zw,
            "cva_indep": ow.cva_indep, "wwr_ratio": ow.wwr_ratio,
            "gamma_delta_mc": float(rw.gamma_delta),
            "gamma_delta_oracle": ow.gamma_delta, "gamma_delta_z": zg,
            "lambda0_delta_mc": float(rw.lambda0_delta),
            "lambda0_delta_oracle": ow.lambda0_delta,
            "lambda0_delta_z": zl,
            "contrib_oracle": [float(x) for x in ow.contrib],
            "contrib_mc": np.asarray(rw.profile.ee).tolist()}}
    mva_res = {}
    if args.mva:
        legsm = ((args.rate, args.tenor, args.payer),
                 (args.rate, max(args.tenor - 2.0, 1.0), args.payer),
                 (args.rate * 0.0, args.tenor, not args.payer))
        mkw = dict(mpor=args.mpor, quantile_im=args.quantile_im,
                   spread_im=args.spread_im, freq=args.freq,
                   hazard=args.hazard, hazard_own=args.hazard_own)
        om = xva.mva_oracle(cfg, market, legsm, **mkw)
        rm = xva.price_mva(cfg, key, market, legsm,
                           n_blocks=args.n_blocks, rqmc=bool(args.rqmc),
                           **mkw)
        zm = (float(rm.mva) - om.mva) / max(float(rm.std_error), 1e-15)
        ok = ok and (abs(zm) < 5 or abs(float(rm.mva) - om.mva) < 1e-9)
        tag = (f"z = {zm:+.2f}" if float(rm.std_error) > 1e-12
               else "CV exact (one-signed gradient)")
        print(f"MVA (delta-normal IM, q={args.quantile_im}, MPoR "
              f"{om.delta:.2f}y, spread {args.spread_im*1e4:.0f}bp): "
              f"MC {float(rm.mva):.8f} +/- {float(rm.std_error):.2e}  "
              f"oracle {om.mva:.8f}  {tag}")
        mva_res = {"mva": {
            "mpor": om.delta, "quantile_im": args.quantile_im,
            "spread_im": args.spread_im, "legs": [list(l) for l in legsm],
            "mva_mc": float(rm.mva), "mva_se": float(rm.std_error),
            "mva_oracle": om.mva, "mva_z": zm,
            "im_oracle": [float(x) for x in om.im],
            "im_mc": np.asarray(rm.im).tolist()}}
    kva_res = {}
    if args.kva:
        legsk = ((args.rate, args.tenor, args.payer),
                 (args.rate * 0.6, max(args.tenor - 1.0, 1.0),
                  not args.payer),
                 (args.rate * 1.5, max(args.tenor - 2.0, 1.0),
                  args.payer))
        kkw = dict(freq=args.freq, cost_of_capital=args.cost_capital,
                   capital_ratio=args.capital_ratio, hazard=args.hazard,
                   hazard_own=args.hazard_own)
        okv = xva.kva_oracle(cfg, market, legsk, **kkw)
        rk = xva.price_kva(cfg, key, market, legsk,
                           n_blocks=args.n_blocks, rqmc=bool(args.rqmc),
                           **kkw)
        zk = (float(rk.kva) - okv.kva) / max(float(rk.std_error), 1e-15)
        ok = ok and (abs(zk) < 5 or abs(float(rk.kva) - okv.kva) < 1e-9)
        print(f"KVA (c_h={args.cost_capital}, kappa="
              f"{args.capital_ratio}): MC {float(rk.kva):.8f} +/- "
              f"{float(rk.std_error):.2e}  oracle {okv.kva:.8f}  "
              f"z = {zk:+.2f}")
        kva_res = {"kva": {
            "cost_of_capital": args.cost_capital,
            "capital_ratio": args.capital_ratio,
            "legs": [list(l) for l in legsk],
            "kva_mc": float(rk.kva), "kva_se": float(rk.std_error),
            "kva_oracle": okv.kva, "kva_z": zk,
            "capital_oracle": [float(x) for x in okv.capital],
            "capital_mc": np.asarray(rk.capital).tolist()}}
    cds_res = {}
    if args.cds:
        from . import credit

        quotes = tuple((float(q.split(":")[0]), float(q.split(":")[1]))
                       for q in args.cds.split(","))
        df = credit.market_df(cfg, market)
        curve = credit.bootstrap_cds(df, quotes,
                                     recovery=args.recovery)
        rt = max(abs(credit.par_spread(df, curve, m) - s)
                 for m, s in quotes)
        legsc = ((args.rate, args.tenor, args.payer),
                 (args.rate * 0.6, max(args.tenor - 1.0, 1.0),
                  not args.payer),
                 (args.rate * 1.5, max(args.tenor - 2.0, 1.0),
                  args.payer))
        oc = xva.netting_oracle(cfg, market, legsc, freq=args.freq,
                                hazard=curve, recovery=args.recovery)
        rc2 = xva.price_netting(cfg, key, market, legsc, freq=args.freq,
                                hazard=curve, recovery=args.recovery,
                                n_blocks=args.n_blocks,
                                rqmc=bool(args.rqmc))
        zc2 = (float(rc2.cva) - oc.cva) / max(float(rc2.std_error),
                                              1e-15)
        ok = ok and abs(zc2) < 5
        hz = " ".join(f"{k:g}y:{h*1e4:.1f}bp"
                      for k, h in zip(curve.knots, curve.hazards))
        print(f"CDS curve (roundtrip {rt:.1e}): hazards {hz}")
        print(f"netted CVA under the curve: MC {float(rc2.cva):.8f} "
              f"+/- {float(rc2.std_error):.2e}  oracle {oc.cva:.8f}  "
              f"z = {zc2:+.2f}")
        cs = xva.cva_cs01(cfg, key, market, legsc, quotes=quotes,
                          recovery=args.recovery, freq=args.freq,
                          n_blocks=args.n_blocks, rqmc=bool(args.rqmc))
        csok = all(abs(m - d) < 5 * b + 1e-12 for m, d, b in
                   zip(cs.deltas_mc, cs.deltas, cs.delta_bounds))
        ok = ok and csok
        print("bucketed CS01 (1bp, MC re-dot vs oracle): "
              + "  ".join(f"{m:g}y {dm:+.2e}/{d:+.2e}"
                          for (m, _), dm, d in
                          zip(quotes, cs.deltas_mc, cs.deltas))
              + ("  [agree]" if csok else "  [CHECK]"))
        cds_res = {"cds": {
            "quotes": [list(q) for q in quotes],
            "knots": list(curve.knots), "hazards": list(curve.hazards),
            "roundtrip": rt, "cva_mc": float(rc2.cva),
            "cva_se": float(rc2.std_error), "cva_oracle": oc.cva,
            "cva_z": zc2, "cs01_oracle": list(cs.deltas),
            "cs01_mc": list(cs.deltas_mc),
            "cs01_bounds": list(cs.delta_bounds)}}
    berm_res = {}
    if args.bermudan:
        from .instruments import swap_fixed_leg

        schedb = swap_fixed_leg(cfg, args.rate, args.tenor)
        exb = tuple(cfg.s1 + float(j) for j in range(int(args.tenor)))
        # artifact lane runs the fp64 oracle at 3001 grid points: the
        # MC's Chebyshev value function is near-exact, so the forward
        # trapezoid's O(h^2) is the binding error (-1.45e-6 at 1501 ->
        # -2.0e-7 at 3001 vs a 2.4e-7 SE at full paths, measured)
        rb, ob = xva.price_bermudan_xva(
            cfg, key, market, schedb, exb, payer=args.payer,
            quantile=args.quantile, hazard=args.hazard,
            recovery=args.recovery, n_blocks=args.n_blocks,
            rqmc=bool(args.rqmc), n_grid=3001)
        zb = (float(rb.cva) - ob.cva) / max(float(rb.std_error), 1e-15)
        ok = ok and (abs(zb) < 5 or abs(float(rb.cva) - ob.cva) < 1e-9)
        ystop = max(abs(y - ob.price) for y in ob.y_means)
        print(f"Bermudan exposure ({len(exb)} ex dates, DP price "
              f"{ob.price:.6f}, stopping identity {ystop:.1e}): CVA MC "
              f"{float(rb.cva):.8f} +/- {float(rb.std_error):.2e}  "
              f"oracle {ob.cva:.8f}  z = {zb:+.2f}")
        berm_res = {"bermudan": {
            "ex_dates": [float(t) for t in exb], "price": ob.price,
            "stopping_identity": ystop,
            "cva_mc": float(rb.cva), "cva_se": float(rb.std_error),
            "cva_oracle": ob.cva, "cva_z": zb,
            "ee_oracle": [float(x) for x in ob.ee],
            "ee_mc": np.asarray(rb.profile.ee).tolist(),
            "ee_se": np.asarray(rb.profile.ee_std_error).tolist(),
            "pfe": [float(x) for x in ob.pfe],
            "exceed": np.asarray(rb.profile.exceed).tolist()}}
    g2res = {}
    if args.g2:
        from .models import g2pp

        g2 = g2pp.G2Params()
        o2 = xva.exposure_oracle_g2(cfg, g2, market, **kw)
        r2 = xva.price_exposure_g2(cfg, g2, key, market,
                                   n_blocks=args.n_blocks,
                                   rqmc=bool(args.rqmc), **kw)
        ee2 = np.asarray(r2.profile.ee)
        se2 = np.asarray(r2.profile.ee_std_error)
        z2 = (float(r2.cva) - o2.cva) / max(float(r2.std_error), 1e-12)
        ok = ok and abs(z2) < 5
        print(f"G2++ twin: CVA MC {float(r2.cva):.8f} +/- "
              f"{float(r2.std_error):.2e}  oracle {o2.cva:.8f}  "
              f"z = {z2:+.2f}  max|EE z| = "
              f"{np.max(np.abs((ee2 - np.array(o2.ee)) / se2)):.2f}  "
              f"exceed {np.asarray(r2.profile.exceed).mean():.4f}")
        g2res = {"g2": {"cva_mc": float(r2.cva),
                        "cva_se": float(r2.std_error),
                        "cva_oracle": o2.cva, "cva_z": z2,
                        "ee_mc": ee2.tolist(), "ee_se": se2.tolist(),
                        "ee_oracle": [float(x) for x in o2.ee],
                        "pfe": [float(x) for x in o2.pfe],
                        "exceed": np.asarray(r2.profile.exceed).tolist()}}
        if args.netting:
            legs = ((args.rate, args.tenor, args.payer),
                    (args.rate * 0.6, max(args.tenor - 1.0, 1.0),
                     not args.payer),
                    (args.rate * 1.5, max(args.tenor - 2.0, 1.0),
                     args.payer))
            on2 = xva.netting_oracle_g2(cfg, g2, market, legs,
                                        freq=args.freq,
                                        quantile=args.quantile,
                                        hazard=args.hazard,
                                        recovery=args.recovery)
            rn2 = xva.price_netting_g2(cfg, g2, key, market, legs,
                                       freq=args.freq,
                                       quantile=args.quantile,
                                       hazard=args.hazard,
                                       recovery=args.recovery,
                                       n_blocks=args.n_blocks,
                                       rqmc=bool(args.rqmc))
            zn2 = (float(rn2.cva) - on2.cva) / max(float(rn2.std_error),
                                                   1e-12)
            ok = ok and abs(zn2) < 5
            print(f"G2++ netting set ({len(legs)} swaps): CVA MC "
                  f"{float(rn2.cva):.8f} +/- {float(rn2.std_error):.2e}"
                  f"  oracle {on2.cva:.8f}  z = {zn2:+.2f}")
            g2res["g2"]["netting"] = {
                "legs": [list(l) for l in legs],
                "cva_mc": float(rn2.cva), "cva_se": float(rn2.std_error),
                "cva_oracle": on2.cva, "cva_z": zn2,
                "ee_oracle": [float(x) for x in on2.ee],
                "ee_mc": np.asarray(rn2.profile.ee).tolist(),
                "pfe": [float(x) for x in on2.pfe],
                "exceed": np.asarray(rn2.profile.exceed).tolist()}
        if args.csa:
            legs1 = ((args.rate, args.tenor, args.payer),)
            oc2 = xva.collateral_oracle_g2(
                cfg, g2, market, legs1, threshold=args.threshold,
                lag=args.lag, freq=args.freq, quantile=args.quantile,
                hazard=args.hazard, recovery=args.recovery)
            rc2 = xva.price_collateral_g2(
                cfg, g2, key, market, legs1, threshold=args.threshold,
                lag=args.lag, freq=args.freq, quantile=args.quantile,
                hazard=args.hazard, recovery=args.recovery,
                n_blocks=args.n_blocks, rqmc=bool(args.rqmc))
            zc2 = (float(rc2.cva) - oc2.cva) / max(float(rc2.std_error),
                                                   1e-12)
            ok = ok and abs(zc2) < 5
            red2 = 1.0 - oc2.cva / o2.cva
            print(f"G2++ CSA (H={args.threshold}, MPoR {args.lag} "
                  f"periods): CVA MC {float(rc2.cva):.8f} +/- "
                  f"{float(rc2.std_error):.2e}  oracle {oc2.cva:.8f}  "
                  f"z = {zc2:+.2f}  collateral cuts CVA {red2*100:.1f}%")
            g2res["g2"]["csa"] = {
                "threshold": args.threshold, "lag": args.lag,
                "cva_mc": float(rc2.cva), "cva_se": float(rc2.std_error),
                "cva_oracle": oc2.cva, "cva_z": zc2,
                "cva_reduction": red2,
                "ee_oracle": [float(x) for x in oc2.ee],
                "ee_mc": np.asarray(rc2.profile.ee).tolist(),
                "pfe": [float(x) for x in oc2.pfe],
                "exceed": np.asarray(rc2.profile.exceed).tolist()}
        if args.bilateral:
            legs1 = ((args.rate, args.tenor, args.payer),)
            bkw = dict(freq=args.freq, hazard=args.hazard,
                       recovery=args.recovery,
                       hazard_own=args.hazard_own,
                       recovery_own=args.recovery_own,
                       spread_borrow=args.spread_borrow,
                       spread_lend=args.spread_lend)
            ob2 = xva.bilateral_oracle_g2(cfg, g2, market, legs1, **bkw)
            rb2 = xva.price_bilateral_g2(cfg, g2, key, market, legs1,
                                         quantile=args.quantile,
                                         n_blocks=args.n_blocks,
                                         rqmc=bool(args.rqmc), **bkw)
            zb2 = (float(rb2.bcva) - ob2.bcva) / max(float(rb2.bcva_se),
                                                     1e-12)
            zf2 = (float(rb2.fva) - ob2.fva) / max(float(rb2.fva_se),
                                                   1e-12)
            ok = ok and abs(zb2) < 5 and abs(zf2) < 5
            print(f"G2++ bilateral: BCVA MC {float(rb2.bcva):.8f} +/- "
                  f"{float(rb2.bcva_se):.2e}  oracle {ob2.bcva:.8f}  "
                  f"z = {zb2:+.2f}")
            print(f"                FVA  MC {float(rb2.fva):.8f} +/- "
                  f"{float(rb2.fva_se):.2e}  oracle {ob2.fva:.8f}  "
                  f"z = {zf2:+.2f}")
            g2res["g2"]["bilateral"] = {
                "bcva_mc": float(rb2.bcva), "bcva_se": float(rb2.bcva_se),
                "bcva_oracle": ob2.bcva, "bcva_z": zb2,
                "fva_mc": float(rb2.fva), "fva_se": float(rb2.fva_se),
                "fva_oracle": ob2.fva, "fva_z": zf2,
                "cva": float(rb2.cva), "dva": float(rb2.dva)}
        if args.wwr:
            legsw = ((args.rate, args.tenor, args.payer),)
            wkw = dict(lambda0=args.hazard, gamma=args.gamma,
                       freq=args.freq, recovery=args.recovery)
            ow2 = xva.wwr_oracle_g2(cfg, g2, market, legsw, **wkw)
            rw2 = xva.price_wwr_g2(cfg, g2, key, market, legsw,
                                   quantile=args.quantile,
                                   n_blocks=args.n_blocks,
                                   rqmc=bool(args.rqmc), **wkw)
            zw2 = (float(rw2.cva) - ow2.cva) / max(float(rw2.std_error),
                                                   1e-12)
            zg2 = (float(rw2.gamma_delta) - ow2.gamma_delta) \
                / max(float(rw2.gamma_delta_se), 1e-12)
            ok = ok and abs(zw2) < 5 and abs(zg2) < 5
            print(f"G2++ WWR: CVA MC {float(rw2.cva):.8f} +/- "
                  f"{float(rw2.std_error):.2e}  oracle {ow2.cva:.8f}  "
                  f"z = {zw2:+.2f}  multiplier {ow2.wwr_ratio:.3f}x  "
                  f"dCVA/dgamma z {zg2:+.2f}")
            g2res["g2"]["wwr"] = {
                "gamma": args.gamma, "lambda0": args.hazard,
                "cva_mc": float(rw2.cva), "cva_se": float(rw2.std_error),
                "cva_oracle": ow2.cva, "cva_z": zw2,
                "wwr_ratio": ow2.wwr_ratio,
                "gamma_delta_mc": float(rw2.gamma_delta),
                "gamma_delta_oracle": ow2.gamma_delta,
                "gamma_delta_z": zg2}
        if args.mva:
            legsm = ((args.rate, args.tenor, args.payer),
                     (args.rate, max(args.tenor - 2.0, 1.0), args.payer),
                     (args.rate * 0.0, args.tenor, not args.payer))
            mkw = dict(mpor=args.mpor, quantile_im=args.quantile_im,
                       spread_im=args.spread_im, freq=args.freq,
                       hazard=args.hazard, hazard_own=args.hazard_own)
            om2 = xva.mva_oracle_g2(cfg, g2, market, legsm, **mkw)
            rm2 = xva.price_mva_g2(cfg, g2, key, market, legsm,
                                   n_blocks=args.n_blocks,
                                   rqmc=bool(args.rqmc), **mkw)
            zm2 = (float(rm2.mva) - om2.mva) / max(float(rm2.std_error),
                                                   1e-15)
            ok = ok and (abs(zm2) < 5
                         or abs(float(rm2.mva) - om2.mva) < 1e-9)
            tag2 = (f"z = {zm2:+.2f}" if float(rm2.std_error) > 1e-12
                    else "CV exact")
            print(f"G2++ MVA: MC {float(rm2.mva):.8f} +/- "
                  f"{float(rm2.std_error):.2e}  oracle {om2.mva:.8f}  "
                  f"{tag2}")
            g2res["g2"]["mva"] = {
                "mva_mc": float(rm2.mva), "mva_se": float(rm2.std_error),
                "mva_oracle": om2.mva, "mva_z": zm2,
                "im_oracle": [float(x) for x in om2.im],
                "im_mc": np.asarray(rm2.im).tolist()}
        if args.kva:
            legsk = ((args.rate, args.tenor, args.payer),
                     (args.rate * 0.6, max(args.tenor - 1.0, 1.0),
                      not args.payer),
                     (args.rate * 1.5, max(args.tenor - 2.0, 1.0),
                      args.payer))
            kkw = dict(freq=args.freq,
                       cost_of_capital=args.cost_capital,
                       capital_ratio=args.capital_ratio,
                       hazard=args.hazard, hazard_own=args.hazard_own)
            ok2 = xva.kva_oracle_g2(cfg, g2, market, legsk, **kkw)
            rk2 = xva.price_kva_g2(cfg, g2, key, market, legsk,
                                   n_blocks=args.n_blocks,
                                   rqmc=bool(args.rqmc), **kkw)
            zk2 = (float(rk2.kva) - ok2.kva) / max(float(rk2.std_error),
                                                   1e-15)
            ok = ok and (abs(zk2) < 5
                         or abs(float(rk2.kva) - ok2.kva) < 1e-9)
            print(f"G2++ KVA: MC {float(rk2.kva):.8f} +/- "
                  f"{float(rk2.std_error):.2e}  oracle {ok2.kva:.8f}  "
                  f"z = {zk2:+.2f}")
            g2res["g2"]["kva"] = {
                "kva_mc": float(rk2.kva), "kva_se": float(rk2.std_error),
                "kva_oracle": ok2.kva, "kva_z": zk2,
                "capital_oracle": [float(x) for x in ok2.capital],
                "capital_mc": np.asarray(rk2.capital).tolist()}
        if args.bermudan:
            from .instruments import swap_fixed_leg

            schedb = swap_fixed_leg(cfg, args.rate, args.tenor)
            exb2 = tuple(cfg.s1 + float(j)
                         for j in range(min(int(args.tenor), 3)))
            rb2, ob2 = xva.price_bermudan_xva_g2(
                cfg, g2, key, market, schedb, exb2, payer=args.payer,
                quantile=args.quantile, hazard=args.hazard,
                recovery=args.recovery, n_blocks=args.n_blocks,
                rqmc=bool(args.rqmc))
            diff2 = float(rb2.cva) - ob2.cva
            zb2 = diff2 / max(float(rb2.std_error), 1e-15)
            # the 2-d bilinear DP grids carry a measured O(h^2) gap
            # (2.3e-6 at n_grid=81 -> 1.1e-6 at 121 -> 0.7e-6 at 161,
            # tests/test_xva.py): the gate and the printed line quote
            # the absolute gap against SE + that allowance (at full
            # paths the SE is tiny and a bare z only restates the bias)
            gate2 = 5 * float(rb2.std_error) + 3e-6
            ok = ok and abs(diff2) < gate2
            ystop2 = max(abs(y - ob2.price) for y in ob2.y_means)
            print(f"G2++ Bermudan exposure ({len(exb2)} ex dates, DP "
                  f"price {ob2.price:.6f}, stopping identity "
                  f"{ystop2:.1e}): CVA MC {float(rb2.cva):.8f} +/- "
                  f"{float(rb2.std_error):.2e}  oracle {ob2.cva:.8f}  "
                  f"diff {diff2:+.1e} vs 5SE+3e-6 O(h^2) allowance "
                  f"{gate2:.1e}: {'ok' if abs(diff2) < gate2 else 'FAIL'}")
            g2res["g2"]["bermudan"] = {
                "ex_dates": [float(t) for t in exb2],
                "price": ob2.price, "stopping_identity": ystop2,
                "cva_mc": float(rb2.cva),
                "cva_se": float(rb2.std_error),
                "cva_oracle": ob2.cva, "cva_z": zb2,
                "ee_oracle": [float(x) for x in ob2.ee],
                "ee_mc": np.asarray(rb2.profile.ee).tolist()}
    print("validation:", "PASS" if ok else "CHECK")
    hwio.write_json(
        hwio.DATA_DIR / "xva_results.json", "XVA exposure + CVA", cfg,
        results={**g2res, **net_res, **csa_res, **bil_res, **wwr_res,
                 **mva_res, **kva_res, **cds_res, **berm_res,
            "side": side, "dates": [float(t) for t in prof.dates],
            "ee_mc": ee.tolist(), "ee_se": se.tolist(),
            "ee_oracle": [float(x) for x in o.ee],
            "pfe": [float(x) for x in o.pfe],
            "exceed": exceed.tolist(), "epe": float(prof.epe),
            "cva_mc": float(res.cva), "cva_se": float(res.std_error),
            "cva_oracle": o.cva, "cva_z": zc,
            "hazard_delta_mc": float(res.hazard_delta),
            "hazard_delta_oracle": o.hazard_delta,
            "vega_jvp": float(v.vega), "vega_fd": float(v.fd_vega),
            "vega_oracle": v.oracle_vega,
            "quantile": args.quantile, "n_paths": prof.n_paths})
    return 0 if ok else 1


def cmd_exotics(args):
    """Exotic payoff layer on the exact multi-date states (round 3):
    CMS spread caplets (S_long - S_short - K)^+ vs the root-located
    piecewise-quadrature fp64 oracle, and a range-accrual leg vs its
    EXACT closed form (tilted Phi differences — no quadrature).
    Product family beyond the CUDA reference's single option
    (src/2_option_pricing.cu:14-35 is the product layer being widened)."""
    from . import instruments

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 9393)
    market = hwio.load_market(cfg)
    rc = 0
    results = {}

    print(f"--- CMS spread cap: start {cfg.s1}y, tenor {args.tenor}y, "
          f"(S_{args.long_tenor:g}y - S_{args.short_tenor:g}y - "
          f"{args.strike*100:.2f}%)^+ ---")
    res = instruments.price_cms_spread(
        cfg, key, market, strike=args.strike, tenor=args.tenor,
        freq=args.freq, long_tenor=args.long_tenor,
        short_tenor=args.short_tenor)
    orc, per = instruments.cms_spread_quadrature(
        cfg, market, strike=args.strike, tenor=args.tenor, freq=args.freq,
        long_tenor=args.long_tenor, short_tenor=args.short_tenor)
    z = (float(res.price) - orc) / max(float(res.std_error), 1e-12)
    ok = abs(z) < 4 or abs(float(res.price) - orc) < 2e-4
    print(f"MC:         {float(res.price):.8f} "
          f"+/- {float(res.std_error):.2e} (SE)")
    print(f"quadrature: {orc:.8f}")
    print(f"agreement: z = {z:.2f} ({'PASS' if ok else 'CHECK'})")
    rc |= 0 if ok else 1
    results["cms_spread"] = {
        "mc_price": float(res.price), "mc_se": float(res.std_error),
        "quadrature": orc, "z": z,
        "periods_mc": [float(x) for x in res.periods],
        "periods_quadrature": per}

    print(f"--- range accrual: coupon {args.coupon*100:.2f}%, band "
          f"[{args.lo*100:.2f}%, {args.hi*100:.2f}%], tenor {args.tenor}y, "
          f"{args.obs} obs/period ---")
    ra = instruments.price_range_accrual(
        cfg, key, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    orc_ra, per_ra = instruments.range_accrual_closed_form(
        cfg, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    z_ra = (float(ra.price) - orc_ra) / max(float(ra.std_error), 1e-12)
    ok_ra = abs(z_ra) < 4 or abs(float(ra.price) - orc_ra) < 2e-4
    print(f"MC:          {float(ra.price):.8f} "
          f"+/- {float(ra.std_error):.2e} (SE)")
    print(f"closed form: {orc_ra:.8f}")
    print("mean accrual fractions:",
          np.array2string(np.asarray(ra.mean_fraction), precision=4))
    print(f"agreement: z = {z_ra:.2f} ({'PASS' if ok_ra else 'CHECK'})")
    rc |= 0 if ok_ra else 1
    results["range_accrual"] = {
        "mc_price": float(ra.price), "mc_se": float(ra.std_error),
        "closed_form": orc_ra, "z": z_ra,
        "periods_mc": [float(x) for x in ra.periods],
        "periods_closed_form": per_ra,
        "mean_fractions": [float(x) for x in ra.mean_fraction]}

    from .models import g2pp

    print("--- G2++ range accrual (two-factor twin, same band) ---")
    g2 = g2pp.G2Params()
    ra2 = g2pp.price_range_accrual_g2(
        cfg, g2, key, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    orc_ra2, _ = g2pp.range_accrual_closed_form_g2(
        cfg, g2, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    z_ra2 = (float(ra2.price) - orc_ra2) / max(float(ra2.std_error), 1e-12)
    ok_ra2 = abs(z_ra2) < 4 or abs(float(ra2.price) - orc_ra2) < 2e-4
    print(f"MC:          {float(ra2.price):.8f} "
          f"+/- {float(ra2.std_error):.2e} (SE)")
    print(f"closed form: {orc_ra2:.8f}")
    print(f"agreement: z = {z_ra2:.2f} ({'PASS' if ok_ra2 else 'CHECK'})")
    rc |= 0 if ok_ra2 else 1
    results["range_accrual_g2"] = {
        "mc_price": float(ra2.price), "mc_se": float(ra2.std_error),
        "closed_form": orc_ra2, "z": z_ra2}

    print(f"--- puttable range-accrual note (Bermudan put at par, "
          f"T_1..T_{int(args.tenor*args.freq)-1}) ---")
    from . import range_note

    dp = range_note.dp_oracle_range_note(
        cfg, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    nt = range_note.price_range_note(
        cfg, key, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs,
        boundaries=dp.boundaries)
    z_nt = (float(nt.price) - dp.price) / max(float(nt.std_error), 1e-12)
    ok_nt = abs(z_nt) < 4 or abs(float(nt.price) - dp.price) < 2e-4
    print(f"DP oracle:   {dp.price:.8f} (plain {dp.plain_price:.8f}, "
          f"put premium {dp.put_premium:.6f})")
    print(f"MC (CV):     {float(nt.price):.8f} "
          f"+/- {float(nt.std_error):.2e} (SE; raw SE "
          f"{float(nt.raw_std_error):.2e})")
    print(f"put fraction {float(nt.put_fraction):.4f}, boundaries "
          + np.array2string(np.asarray(dp.boundaries), precision=5))
    print(f"agreement: z = {z_nt:.2f} ({'PASS' if ok_nt else 'CHECK'})")
    rc |= 0 if ok_nt else 1
    nv = range_note.vega_range_note(
        cfg, key, market, coupon=args.coupon, lo=args.lo, hi=args.hi,
        tenor=args.tenor, freq=args.freq, obs_per_period=args.obs,
        n_paths=min(cfg.n_paths, 1 << 16))
    print(f"note vega: CRN-FD {float(nv.vega):.6f} vs DP FD "
          f"{nv.dp_vega:.6f} (envelope check)")
    results["range_note_vega"] = {"mc_crn_fd": float(nv.vega),
                                  "dp_fd": nv.dp_vega}
    results["range_note"] = {
        "dp_price": dp.price, "dp_plain": dp.plain_price,
        "put_premium": dp.put_premium,
        "boundaries": [float(b) for b in dp.boundaries],
        "mc_price": float(nt.price), "mc_se": float(nt.std_error),
        "mc_raw_se": float(nt.raw_std_error),
        "put_fraction": float(nt.put_fraction), "z": z_nt,
        "profile_r": list(dp.profile_x[::4]),
        "profile_cont": list(dp.profile_cont[::4]),
        "coupon": args.coupon, "lo": args.lo, "hi": args.hi}

    print(f"--- range-accrual TARN: target {args.target*100:.2f}% "
          f"cumulative coupon (1 obs/period, exact lattice DP) ---")
    tkw = dict(coupon=args.coupon, lo=args.lo, hi=args.hi,
               target=args.target, tenor=args.tenor, freq=args.freq)
    tdp = range_note.dp_oracle_tarn(cfg, market, **tkw)
    tmc = range_note.price_tarn(cfg, key, market, **tkw)
    z_t = (float(tmc.price) - tdp.price) / max(float(tmc.std_error), 1e-12)
    ok_t = abs(z_t) < 4 or abs(float(tmc.price) - tdp.price) < 2e-4
    print(f"DP (lattice): {tdp.price:.8f}  knockout prob "
          f"{tdp.ko_prob:.4f}")
    print(f"MC:           {float(tmc.price):.8f} "
          f"+/- {float(tmc.std_error):.2e} (SE); knockout fraction "
          f"{float(tmc.ko_fraction):.4f}, mean coupon total "
          f"{float(tmc.mean_total):.5f}")
    print(f"agreement: z = {z_t:.2f} ({'PASS' if ok_t else 'CHECK'})")
    rc |= 0 if ok_t else 1
    results["tarn"] = {
        "dp_price": tdp.price, "dp_ko_prob": tdp.ko_prob,
        "mc_price": float(tmc.price), "mc_se": float(tmc.std_error),
        "mc_ko_fraction": float(tmc.ko_fraction),
        "mc_mean_total": float(tmc.mean_total), "z": z_t,
        "target": args.target}

    print("--- G2++ puttable range-accrual note (2-d (u, w) DP oracle, "
          "boundary-curve policy MC) ---")
    from . import g2_note

    nkw = dict(coupon=args.coupon, lo=args.lo, hi=args.hi,
               tenor=args.tenor, freq=args.freq, obs_per_period=args.obs)
    # --fine: the (u, w) DP's piecewise-bilinear surface carries an
    # O(h^2) convexity bias concentrated at the exercise kink (measured
    # +7e-5 at the 161/61/16 defaults, +1.3e-5 at 241/91/24 on the
    # headline note); artifact runs quote the fine oracle
    fine = (dict(n_u=241, n_w=91, n_quad=20) if getattr(args, "fine",
                                                        False) else {})
    dp2 = g2_note.dp_oracle_range_note_g2(cfg, g2, market, **nkw, **fine)
    nt2 = g2_note.price_range_note_g2(cfg, g2, key, market,
                                      boundaries=dp2.boundaries, **nkw)
    z_n2 = (float(nt2.price) - dp2.price) / max(float(nt2.std_error), 1e-12)
    ok_n2 = abs(z_n2) < 4 or abs(float(nt2.price) - dp2.price) < 2e-4
    print(f"DP oracle:   {dp2.price:.8f} (plain {dp2.plain_price:.8f}, "
          f"put premium {dp2.put_premium:.6f})")
    print(f"MC (CV):     {float(nt2.price):.8f} "
          f"+/- {float(nt2.std_error):.2e} (SE; raw SE "
          f"{float(nt2.raw_std_error):.2e})")
    print(f"put fraction {float(nt2.put_fraction):.4f}")
    print(f"agreement: z = {z_n2:.2f} ({'PASS' if ok_n2 else 'CHECK'})")
    rc |= 0 if ok_n2 else 1
    nv2 = g2_note.vega_range_note_g2(
        cfg, g2, key, market, n_paths=min(cfg.n_paths, 1 << 16),
        dp_kwargs=fine, **nkw)
    print(f"note vega: CRN-FD {float(nv2.vega):.6f} vs DP FD "
          f"{nv2.dp_vega:.6f} (2-d envelope check)")
    results["range_note_g2_vega"] = {"mc_crn_fd": float(nv2.vega),
                                     "dp_fd": nv2.dp_vega}
    results["range_note_g2"] = {
        "dp_price": dp2.price, "dp_plain": dp2.plain_price,
        "put_premium": dp2.put_premium,
        "mc_price": float(nt2.price), "mc_se": float(nt2.std_error),
        "mc_raw_se": float(nt2.raw_std_error),
        "put_fraction": float(nt2.put_fraction), "z": z_n2,
        "boundary_w": [list(b[0][::8]) for b in dp2.boundaries],
        "boundary_u": [list(b[1][::8]) for b in dp2.boundaries]}

    print("--- G2++ range-accrual TARN (lattice DP over (K, u, w)) ---")
    t2kw = dict(coupon=args.coupon, lo=args.lo, hi=args.hi,
                target=args.target, tenor=args.tenor, freq=args.freq)
    tdp2 = g2_note.dp_oracle_tarn_g2(cfg, g2, market, **t2kw, **fine)
    tmc2 = g2_note.price_tarn_g2(cfg, g2, key, market, **t2kw)
    z_t2 = (float(tmc2.price) - tdp2.price) / max(float(tmc2.std_error),
                                                  1e-12)
    ok_t2 = abs(z_t2) < 4 or abs(float(tmc2.price) - tdp2.price) < 2e-4
    print(f"DP (lattice): {tdp2.price:.8f}  knockout prob "
          f"{tdp2.ko_prob:.4f}")
    print(f"MC:           {float(tmc2.price):.8f} "
          f"+/- {float(tmc2.std_error):.2e} (SE); knockout fraction "
          f"{float(tmc2.ko_fraction):.4f}, mean coupon total "
          f"{float(tmc2.mean_total):.5f}")
    print(f"agreement: z = {z_t2:.2f} ({'PASS' if ok_t2 else 'CHECK'})")
    rc |= 0 if ok_t2 else 1
    results["tarn_g2"] = {
        "dp_price": tdp2.price, "dp_ko_prob": tdp2.ko_prob,
        "mc_price": float(tmc2.price), "mc_se": float(tmc2.std_error),
        "mc_ko_fraction": float(tmc2.ko_fraction),
        "mc_mean_total": float(tmc2.mean_total), "z": z_t2,
        "target": args.target}

    print(f"--- chooser (flexi) cap: k = {args.rights} of "
          f"{int(args.tenor * args.freq)} caplets at "
          f"{args.cap_rate*100:.2f}%, vs auto-cap ---")
    from . import chooser as flexi

    ckw = dict(rate=args.cap_rate, k=args.rights, tenor=args.tenor,
               freq=args.freq)
    cdp = flexi.dp_oracle_chooser_cap(cfg, market, **ckw)
    cmc = flexi.price_chooser_cap(cfg, key, market, **ckw)
    z_c = (float(cmc.price) - cdp.price) / max(float(cmc.std_error), 1e-12)
    ok_c = abs(z_c) < 4 or abs(float(cmc.price) - cdp.price) < 2e-4
    cap_cf, _ = instruments.cap_closed_form(cfg, market,
                                            rate=args.cap_rate,
                                            tenor=args.tenor,
                                            freq=args.freq)
    print(f"DP oracle:   {cdp.price:.8f}  (full cap {cdp.cap_price:.8f}, "
          f"closed form {cap_cf:.8f})")
    print(f"MC (CV):     {float(cmc.price):.8f} "
          f"+/- {float(cmc.std_error):.2e} (SE; raw SE "
          f"{float(cmc.raw_std_error):.2e}); mean rights used "
          f"{float(cmc.used_mean):.3f}")
    print(f"agreement: z = {z_c:.2f} ({'PASS' if ok_c else 'CHECK'})")
    rc |= 0 if ok_c else 1
    adp = flexi.dp_oracle_chooser_cap(cfg, market, auto=True, **ckw)
    amc = flexi.price_chooser_cap(cfg, key, market, auto=True, **ckw)
    z_a = (float(amc.price) - adp.price) / max(float(amc.std_error), 1e-12)
    ok_a = abs(z_a) < 4 or abs(float(amc.price) - adp.price) < 2e-4
    print(f"auto-cap DP: {adp.price:.8f}   MC {float(amc.price):.8f} "
          f"+/- {float(amc.std_error):.2e}  z = {z_a:.2f} "
          f"({'PASS' if ok_a else 'CHECK'}); choice premium "
          f"{cdp.price - adp.price:.6f}")
    rc |= 0 if ok_a else 1
    cv = flexi.vega_chooser_cap(cfg, key, market,
                                n_paths=min(cfg.n_paths, 1 << 16), **ckw)
    print(f"chooser vega: CRN-FD {float(cv.vega):.6f} vs DP FD "
          f"{cv.dp_vega:.6f} (frozen-policy envelope check)")
    results["chooser_cap"] = {
        "dp_price": cdp.price, "dp_cap": cdp.cap_price,
        "cap_closed_form": cap_cf, "mc_price": float(cmc.price),
        "mc_se": float(cmc.std_error),
        "mc_raw_se": float(cmc.raw_std_error),
        "used_mean": float(cmc.used_mean), "z": z_c,
        "auto_dp": adp.price, "auto_mc": float(amc.price),
        "auto_z": z_a, "choice_premium": cdp.price - adp.price,
        "vega_mc_crn_fd": float(cv.vega), "vega_dp_fd": cv.dp_vega,
        "k": args.rights, "rate": args.cap_rate}

    print(f"--- G2++ chooser cap (two-factor twin: boundary CURVES "
          f"u*(w) per (date, rights) on the (u, w) swing DP) ---")
    c2kw = dict(ckw, n_paths=min(cfg.n_paths, 1 << 17))
    cdp2 = flexi.dp_oracle_chooser_cap_g2(cfg, g2, market, **ckw)
    cmc2 = flexi.price_chooser_cap_g2(cfg, g2, key, market,
                                      boundaries=cdp2.boundaries, **c2kw)
    # the default-grid (u, w) DP carries the documented O(h^2) bias;
    # gate on the absolute gap like the note products
    ok_c2 = abs(float(cmc2.price) - cdp2.price) < 2.5e-4
    print(f"DP oracle:   {cdp2.price:.8f}  (full cap "
          f"{cdp2.cap_price:.8f})")
    print(f"MC (CV):     {float(cmc2.price):.8f} "
          f"+/- {float(cmc2.std_error):.2e} (SE; raw SE "
          f"{float(cmc2.raw_std_error):.2e}); mean rights used "
          f"{float(cmc2.used_mean):.3f}")
    print(f"agreement: |MC - DP| = "
          f"{abs(float(cmc2.price) - cdp2.price):.2e} "
          f"({'PASS' if ok_c2 else 'CHECK'})")
    rc |= 0 if ok_c2 else 1
    adp2 = flexi.dp_oracle_chooser_cap_g2(cfg, g2, market, auto=True,
                                          **ckw)
    amc2 = flexi.price_chooser_cap_g2(cfg, g2, key, market, auto=True,
                                      **c2kw)
    z_a2 = (float(amc2.price) - adp2.price) / max(float(amc2.std_error),
                                                  1e-12)
    ok_a2 = abs(z_a2) < 4 or abs(float(amc2.price) - adp2.price) < 2e-4
    print(f"auto-cap DP: {adp2.price:.8f}   MC {float(amc2.price):.8f} "
          f"+/- {float(amc2.std_error):.2e}  z = {z_a2:.2f} "
          f"({'PASS' if ok_a2 else 'CHECK'}); choice premium "
          f"{cdp2.price - adp2.price:.6f}")
    rc |= 0 if ok_a2 else 1
    results["chooser_cap_g2"] = {
        "dp_price": cdp2.price, "dp_cap": cdp2.cap_price,
        "mc_price": float(cmc2.price), "mc_se": float(cmc2.std_error),
        "mc_raw_se": float(cmc2.raw_std_error),
        "used_mean": float(cmc2.used_mean),
        "auto_dp": adp2.price, "auto_mc": float(amc2.price),
        "auto_z": z_a2, "choice_premium": cdp2.price - adp2.price,
        "k": args.rights, "rate": args.cap_rate}

    print(f"--- ratchet cap: strike resets to previous LIBOR + "
          f"{args.ratchet_spread*100:.2f}% (Rao-Blackwell MC vs "
          f"GH-outer/closed-inner fp64 quadrature) ---")
    from . import ratchet

    rkw = dict(spread=args.ratchet_spread, tenor=args.tenor,
               freq=args.freq)
    rq, rq_per = ratchet.ratchet_cap_quadrature(cfg, market, **rkw)
    rmc = ratchet.price_ratchet_cap(cfg, key, market, **rkw)
    z_rt = (float(rmc.price) - rq) / max(float(rmc.std_error), 1e-12)
    ok_rt = abs(z_rt) < 4 or abs(float(rmc.price) - rq) < 2e-4
    print(f"quadrature:  {rq:.8f}")
    print(f"MC (RB+CV):  {float(rmc.price):.8f} "
          f"+/- {float(rmc.std_error):.2e} (SE; raw kinked-payoff SE "
          f"{float(rmc.raw_std_error):.2e})")
    print(f"agreement: z = {z_rt:.2f} ({'PASS' if ok_rt else 'CHECK'})")
    rc |= 0 if ok_rt else 1
    rrq = ratchet.price_ratchet_cap(cfg, key, market, rqmc=True,
                                    n_paths=max(cfg.n_paths // 8,
                                                1 << 12),
                                    n_blocks=8, **rkw)
    print(f"RQMC (8 shifts): {float(rrq.price):.8f} "
          f"+/- {float(rrq.std_error):.2e} (smooth RB integrand: "
          f"~50x the MC SE at equal paths)")
    results_rqmc = {"price": float(rrq.price),
                    "se": float(rrq.std_error)}
    rv = ratchet.vega_ratchet_cap(cfg, key, market,
                                  n_paths=min(cfg.n_paths, 1 << 16), **rkw)
    print(f"ratchet vega: CRN-FD {float(rv.vega):.6f} vs quadrature FD "
          f"{rv.oracle_vega:.6f}")
    results["ratchet_cap"] = {
        "quadrature": rq, "periods_quadrature": rq_per,
        "mc_price": float(rmc.price), "mc_se": float(rmc.std_error),
        "mc_raw_se": float(rmc.raw_std_error),
        "periods_mc": [float(x) for x in rmc.periods], "z": z_rt,
        "rqmc": results_rqmc,
        "vega_mc_crn_fd": float(rv.vega),
        "vega_quadrature_fd": rv.oracle_vega,
        "spread": args.ratchet_spread}

    print("--- G2++ ratchet cap (two-factor twin on the strip "
          "projection) ---")
    rq2, _ = ratchet.ratchet_cap_quadrature_g2(cfg, g2, market, **rkw)
    rmc2 = ratchet.price_ratchet_cap_g2(cfg, g2, key, market, **rkw)
    z_rt2 = (float(rmc2.price) - rq2) / max(float(rmc2.std_error), 1e-12)
    ok_rt2 = abs(z_rt2) < 4 or abs(float(rmc2.price) - rq2) < 2e-4
    print(f"quadrature:  {rq2:.8f}")
    print(f"MC (RB+CV):  {float(rmc2.price):.8f} "
          f"+/- {float(rmc2.std_error):.2e} (SE; raw SE "
          f"{float(rmc2.raw_std_error):.2e})")
    print(f"agreement: z = {z_rt2:.2f} ({'PASS' if ok_rt2 else 'CHECK'})")
    rc |= 0 if ok_rt2 else 1
    rrq2 = ratchet.price_ratchet_cap_g2(cfg, g2, key, market, rqmc=True,
                                        n_paths=max(cfg.n_paths // 8,
                                                    1 << 12),
                                        n_blocks=8, **rkw)
    print(f"RQMC (8 shifts): {float(rrq2.price):.8f} "
          f"+/- {float(rrq2.std_error):.2e}")
    results["ratchet_cap_g2"] = {
        "quadrature": rq2, "mc_price": float(rmc2.price),
        "mc_se": float(rmc2.std_error),
        "mc_raw_se": float(rmc2.raw_std_error), "z": z_rt2,
        "rqmc": {"price": float(rrq2.price),
                 "se": float(rrq2.std_error)}}

    print(f"--- up-and-out cap: strike {args.cap_rate*100:.2f}%, "
          f"knock-out at L >= {args.ko_barrier*100:.2f}% (survival-"
          f"indicator MC vs 1-d double-node DP) ---")
    from . import barrier as ko

    kkw = dict(rate=args.cap_rate, barrier=args.ko_barrier,
               tenor=args.tenor, freq=args.freq)
    kdp = ko.dp_oracle_ko_cap(cfg, market, **kkw)
    kmc = ko.price_ko_cap(cfg, key, market, **kkw)
    z_ko = (float(kmc.price) - kdp.price) / max(float(kmc.std_error),
                                                1e-12)
    ok_ko = abs(z_ko) < 4 or abs(float(kmc.price) - kdp.price) < 2e-4
    print(f"DP oracle:   {kdp.price:.8f} (full cap {kdp.cap_price:.8f}, "
          f"survival {kdp.survival:.4f})")
    print(f"MC (CV):     {float(kmc.price):.8f} "
          f"+/- {float(kmc.std_error):.2e} (SE; raw SE "
          f"{float(kmc.raw_std_error):.2e}); knock-out fraction "
          f"{float(kmc.ko_fraction):.4f}")
    print(f"agreement: z = {z_ko:.2f} ({'PASS' if ok_ko else 'CHECK'})")
    rc |= 0 if ok_ko else 1
    kv = ko.vega_ko_cap(cfg, key, market,
                        n_paths=min(cfg.n_paths, 1 << 16), **kkw)
    print(f"KO-cap vega: CRN-FD {float(kv.vega):.6f} vs DP FD "
          f"{kv.dp_vega:.6f} (indicator-FD envelope check)")
    results["ko_cap"] = {
        "dp_price": kdp.price, "dp_cap": kdp.cap_price,
        "dp_survival": kdp.survival, "mc_price": float(kmc.price),
        "mc_se": float(kmc.std_error),
        "mc_raw_se": float(kmc.raw_std_error),
        "ko_fraction": float(kmc.ko_fraction), "z": z_ko,
        "vega_mc_crn_fd": float(kv.vega), "vega_dp_fd": kv.dp_vega,
        "barrier": args.ko_barrier, "rate": args.cap_rate}

    print(f"--- G2++ up-and-out cap (two-factor twin: barrier is a "
          f"vertical line in u, (u, w) double-node DP) ---")
    kdp2 = ko.dp_oracle_ko_cap_g2(cfg, g2, market, **kkw)
    kmc2 = ko.price_ko_cap_g2(cfg, g2, key, market, **kkw)
    z_ko2 = (float(kmc2.price) - kdp2.price) / max(float(kmc2.std_error),
                                                   1e-12)
    ok_ko2 = abs(z_ko2) < 4 or abs(float(kmc2.price) - kdp2.price) < 2e-4
    print(f"DP oracle:   {kdp2.price:.8f} (full cap {kdp2.cap_price:.8f},"
          f" survival {kdp2.survival:.4f})")
    print(f"MC (CV):     {float(kmc2.price):.8f} "
          f"+/- {float(kmc2.std_error):.2e} (SE; raw SE "
          f"{float(kmc2.raw_std_error):.2e}); knock-out fraction "
          f"{float(kmc2.ko_fraction):.4f}")
    print(f"agreement: z = {z_ko2:.2f} ({'PASS' if ok_ko2 else 'CHECK'})")
    rc |= 0 if ok_ko2 else 1
    results["ko_cap_g2"] = {
        "dp_price": kdp2.price, "dp_cap": kdp2.cap_price,
        "dp_survival": kdp2.survival, "mc_price": float(kmc2.price),
        "mc_se": float(kmc2.std_error),
        "mc_raw_se": float(kmc2.raw_std_error),
        "ko_fraction": float(kmc2.ko_fraction), "z": z_ko2,
        "barrier": args.ko_barrier, "rate": args.cap_rate}

    hwio.write_json(hwio.DATA_DIR / "exotics_results.json", "exotics", cfg,
                    results=results)
    return rc


def cmd_notes(args):
    """Structured-note layer: the snowball note (continuous-state
    path-dependent coupon, 2-d (r, coupon) DP oracle, unclipped-linear
    closed-form CV) and the issuer-callable capped floater (kinked
    deterministic coupon, closed-form plain leg, 1-d DP oracle,
    issuer-policy MC upper bound), both with frozen-policy CRN-FD vegas
    checked against the re-optimizing DP central difference (envelope
    theorem).  Widens the reference's product layer
    (src/2_option_pricing.cu:14-35)."""
    from . import floater, snowball

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 77121)
    market = hwio.load_market(cfg)
    rc = 0
    results = {}

    print(f"--- snowball note: c_j = clip(c_j-1 + spread - L, floor, cap), "
          f"c_0 {args.sb_initial*100:.2f}%, spread {args.sb_spread*100:.2f}%"
          f", cap {args.sb_cap*100:.2f}%, tenor {args.tenor}y ---")
    skw = dict(initial=args.sb_initial, spread=args.sb_spread,
               cap=args.sb_cap, floor=args.floor, tenor=args.tenor,
               freq=args.freq)
    sdp = snowball.dp_oracle_snowball(cfg, market, **skw)
    smc = snowball.price_snowball(cfg, key, market, **skw)
    z_s = (float(smc.price) - sdp.price) / max(float(smc.std_error), 1e-12)
    ok_s = abs(z_s) < 4 or abs(float(smc.price) - sdp.price) < 2e-4
    print(f"DP oracle:   {sdp.price:.8f} (unclipped linear CF "
          f"{sdp.linear_price:.8f})")
    print(f"MC (CV):     {float(smc.price):.8f} "
          f"+/- {float(smc.std_error):.2e} (SE; raw SE "
          f"{float(smc.raw_std_error):.2e})")
    print(f"mean final coupon: MC {float(smc.mean_final_coupon):.6f} "
          f"vs DP {sdp.mean_final_coupon:.6f}")
    print(f"agreement: z = {z_s:.2f} ({'PASS' if ok_s else 'CHECK'})")
    rc |= 0 if ok_s else 1
    sv = snowball.vega_snowball(cfg, key, market,
                                n_paths=min(cfg.n_paths, 1 << 16), **skw)
    print(f"snowball vega: CRN-FD {float(sv.vega):.6f} vs DP FD "
          f"{sv.dp_vega:.6f}")
    results["snowball"] = {
        "dp_price": sdp.price, "linear_closed_form": sdp.linear_price,
        "mc_price": float(smc.price), "mc_se": float(smc.std_error),
        "mc_raw_se": float(smc.raw_std_error), "z": z_s,
        "mean_final_coupon_mc": float(smc.mean_final_coupon),
        "mean_final_coupon_dp": sdp.mean_final_coupon,
        "vega_crn_fd": float(sv.vega), "vega_dp_fd": sv.dp_vega}

    print("--- callable snowball: issuer call at par, boundary-curve "
          "policy r*(c) over the (r, coupon) DP ---")
    csdp = snowball.dp_oracle_callable_snowball(cfg, market, **skw)
    csmc = snowball.price_callable_snowball(
        cfg, key, market, boundaries=csdp.boundaries, c_grid=csdp.c_grid,
        plain_mean=csdp.plain_price, **skw)
    z_cs = (float(csmc.price) - csdp.price) / max(float(csmc.std_error),
                                                  1e-12)
    ok_cs = abs(z_cs) < 4 or abs(float(csmc.price) - csdp.price) < 2e-4
    print(f"DP oracle:   {csdp.price:.8f} (plain {csdp.plain_price:.8f}, "
          f"call discount {csdp.call_premium:.6f})")
    print(f"MC (2-CV):   {float(csmc.price):.8f} "
          f"+/- {float(csmc.std_error):.2e} (SE; raw SE "
          f"{float(csmc.raw_std_error):.2e}); call fraction "
          f"{float(csmc.call_fraction):.4f}")
    print(f"agreement: z = {z_cs:.2f} ({'PASS' if ok_cs else 'CHECK'})")
    rc |= 0 if ok_cs else 1
    csv_ = snowball.vega_callable_snowball(
        cfg, key, market, n_paths=min(cfg.n_paths, 1 << 16), **skw)
    print(f"callable-snowball vega: CRN-FD {float(csv_.vega):.6f} vs DP "
          f"FD {csv_.dp_vega:.6f} (envelope check)")
    results["callable_snowball"] = {
        "dp_price": csdp.price, "dp_plain": csdp.plain_price,
        "call_premium": csdp.call_premium,
        "mc_price": float(csmc.price), "mc_se": float(csmc.std_error),
        "mc_raw_se": float(csmc.raw_std_error), "z": z_cs,
        "call_fraction": float(csmc.call_fraction),
        "vega_crn_fd": float(csv_.vega), "vega_dp_fd": csv_.dp_vega}

    print(f"--- callable capped floater: clip(L + "
          f"{args.fl_spread*100:.2f}%, {args.floor*100:.2f}%, "
          f"{args.fl_cap*100:.2f}%), tenor {args.fl_tenor}y, issuer call "
          f"at par ---")
    fkw = dict(cap=args.fl_cap, floor=args.floor, spread=args.fl_spread,
               tenor=args.fl_tenor, freq=args.freq)
    fdp = floater.dp_oracle_capped_floater(cfg, market, **fkw)
    fcf = floater.capped_floater_closed_form(cfg, market, **fkw)
    fmc = floater.price_capped_floater(cfg, key, market,
                                       boundaries=fdp.boundaries, **fkw)
    z_f = (float(fmc.price) - fdp.price) / max(float(fmc.std_error), 1e-12)
    ok_f = abs(z_f) < 4 or abs(float(fmc.price) - fdp.price) < 2e-4
    print(f"DP oracle:   {fdp.price:.8f} (plain {fdp.plain_price:.8f}, "
          f"CF coupon leg {fcf[0]:.8f}, call discount "
          f"{fdp.plain_price - fdp.price:.6f})")
    print(f"MC (CV):     {float(fmc.price):.8f} "
          f"+/- {float(fmc.std_error):.2e} (SE; raw SE "
          f"{float(fmc.raw_std_error):.2e}); call fraction "
          f"{float(fmc.call_fraction):.4f}")
    print(f"agreement: z = {z_f:.2f} ({'PASS' if ok_f else 'CHECK'})")
    rc |= 0 if ok_f else 1
    fv = floater.vega_capped_floater(cfg, key, market,
                                     n_paths=min(cfg.n_paths, 1 << 16),
                                     **fkw)
    print(f"floater vega: CRN-FD {float(fv.vega):.6f} vs DP FD "
          f"{fv.dp_vega:.6f} (envelope check)")
    results["capped_floater"] = {
        "dp_price": fdp.price, "dp_plain": fdp.plain_price,
        "closed_form_coupon_leg": fcf[0],
        "mc_price": float(fmc.price), "mc_se": float(fmc.std_error),
        "mc_raw_se": float(fmc.raw_std_error), "z": z_f,
        "call_fraction": float(fmc.call_fraction),
        "boundaries": [float(b) for b in fdp.boundaries],
        "vega_crn_fd": float(fv.vega), "vega_dp_fd": fv.dp_vega}

    from . import g2_note
    from .models import g2pp

    g2 = g2pp.G2Params()
    fine = (dict(n_u=241, n_w=91, n_quad=20) if getattr(args, "fine",
                                                        False) else {})
    print("--- G2++ snowball note ((u, w, c) DP oracle, surface-batched "
          "c-levels) ---")
    sdp2 = g2_note.dp_oracle_snowball_g2(cfg, g2, market, **skw, **fine)
    smc2 = g2_note.price_snowball_g2(cfg, g2, key, market, **skw)
    z_s2 = (float(smc2.price) - sdp2.price) / max(float(smc2.std_error),
                                                  1e-12)
    ok_s2 = abs(z_s2) < 4 or abs(float(smc2.price) - sdp2.price) < 2e-4
    print(f"DP oracle:   {sdp2.price:.8f} (unclipped linear CF "
          f"{sdp2.linear_price:.8f})")
    print(f"MC (CV):     {float(smc2.price):.8f} "
          f"+/- {float(smc2.std_error):.2e} (SE; raw SE "
          f"{float(smc2.raw_std_error):.2e})")
    print(f"mean final coupon: MC {float(smc2.mean_final_coupon):.6f} "
          f"vs DP {sdp2.mean_final_coupon:.6f}")
    print(f"agreement: z = {z_s2:.2f} ({'PASS' if ok_s2 else 'CHECK'})")
    rc |= 0 if ok_s2 else 1
    sv2 = g2_note.vega_snowball_g2(cfg, g2, key, market,
                                   n_paths=min(cfg.n_paths, 1 << 16),
                                   dp_kwargs=fine, **skw)
    print(f"snowball vega: CRN-FD {float(sv2.vega):.6f} vs DP FD "
          f"{sv2.dp_vega:.6f}")
    results["snowball_g2"] = {
        "dp_price": sdp2.price, "linear_closed_form": sdp2.linear_price,
        "mc_price": float(smc2.price), "mc_se": float(smc2.std_error),
        "mc_raw_se": float(smc2.raw_std_error), "z": z_s2,
        "mean_final_coupon_mc": float(smc2.mean_final_coupon),
        "mean_final_coupon_dp": sdp2.mean_final_coupon,
        "vega_crn_fd": float(sv2.vega), "vega_dp_fd": sv2.dp_vega}

    print("--- G2++ callable snowball (issuer call at par, boundary "
          "SURFACES u*(w, c) over the (u, w, c) DP) ---")
    # moderate grids by default: the callable DP runs the backward pass
    # twice (call on/off); --fine restores the snowball defaults
    csg = (dict(n_u=161, n_w=61, n_quad=16) if getattr(args, "fine",
                                                       False)
           else dict(n_u=121, n_w=41, n_quad=12))
    csdp2 = g2_note.dp_oracle_callable_snowball_g2(cfg, g2, market,
                                                   **skw, **csg)
    csmc2 = g2_note.price_callable_snowball_g2(
        cfg, g2, key, market, boundaries=csdp2.boundaries,
        c_grid=csdp2.c_grid, plain_mean=csdp2.plain_price, **skw)
    # the (u, w) bilinear DP carries the documented O(h^2) bias; gate
    # on the absolute gap like the other G2 note products
    ok_cs2 = abs(float(csmc2.price) - csdp2.price) < 5e-4
    print(f"DP oracle:   {csdp2.price:.8f} (plain "
          f"{csdp2.plain_price:.8f}, call discount "
          f"{csdp2.call_premium:.6f})")
    print(f"MC (2-CV):   {float(csmc2.price):.8f} "
          f"+/- {float(csmc2.std_error):.2e} (SE; raw SE "
          f"{float(csmc2.raw_std_error):.2e}); call fraction "
          f"{float(csmc2.call_fraction):.4f}")
    print(f"agreement: |MC - DP| = "
          f"{abs(float(csmc2.price) - csdp2.price):.2e} "
          f"({'PASS' if ok_cs2 else 'CHECK'})")
    rc |= 0 if ok_cs2 else 1
    csv2 = g2_note.vega_callable_snowball_g2(
        cfg, g2, key, market, n_paths=min(cfg.n_paths, 1 << 16),
        dp_kwargs=csg, **skw)
    print(f"callable-snowball vega: CRN-FD {float(csv2.vega):.6f} vs "
          f"DP FD {csv2.dp_vega:.6f} (frozen-surface envelope check)")
    results["callable_snowball_g2"] = {
        "dp_price": csdp2.price, "dp_plain": csdp2.plain_price,
        "call_premium": csdp2.call_premium,
        "mc_price": float(csmc2.price), "mc_se": float(csmc2.std_error),
        "mc_raw_se": float(csmc2.raw_std_error),
        "call_fraction": float(csmc2.call_fraction),
        "vega_crn_fd": float(csv2.vega), "vega_dp_fd": csv2.dp_vega}

    print("--- G2++ callable capped floater (2-d (u, w) DP oracle, "
          "boundary-curve issuer policy) ---")
    fdp2 = g2_note.dp_oracle_capped_floater_g2(cfg, g2, market, **fkw,
                                                **fine)
    fcf2 = g2_note.capped_floater_closed_form_g2(cfg, g2, market, **fkw)
    fmc2 = g2_note.price_capped_floater_g2(cfg, g2, key, market,
                                           boundaries=fdp2.boundaries,
                                           **fkw)
    z_f2 = (float(fmc2.price) - fdp2.price) / max(float(fmc2.std_error),
                                                  1e-12)
    ok_f2 = abs(z_f2) < 4 or abs(float(fmc2.price) - fdp2.price) < 2e-4
    print(f"DP oracle:   {fdp2.price:.8f} (plain {fdp2.plain_price:.8f}, "
          f"CF coupon leg {fcf2[0]:.8f}, call discount "
          f"{fdp2.call_premium:.6f})")
    print(f"MC (CV):     {float(fmc2.price):.8f} "
          f"+/- {float(fmc2.std_error):.2e} (SE; raw SE "
          f"{float(fmc2.raw_std_error):.2e}); call fraction "
          f"{float(fmc2.call_fraction):.4f}")
    print(f"agreement: z = {z_f2:.2f} ({'PASS' if ok_f2 else 'CHECK'})")
    rc |= 0 if ok_f2 else 1
    fv2 = g2_note.vega_capped_floater_g2(
        cfg, g2, key, market, n_paths=min(cfg.n_paths, 1 << 16),
        dp_kwargs=fine, **fkw)
    print(f"floater vega: CRN-FD {float(fv2.vega):.6f} vs DP FD "
          f"{fv2.dp_vega:.6f} (2-d envelope check)")
    results["capped_floater_g2"] = {
        "dp_price": fdp2.price, "dp_plain": fdp2.plain_price,
        "closed_form_coupon_leg": fcf2[0],
        "mc_price": float(fmc2.price), "mc_se": float(fmc2.std_error),
        "mc_raw_se": float(fmc2.raw_std_error), "z": z_f2,
        "call_fraction": float(fmc2.call_fraction),
        "vega_crn_fd": float(fv2.vega), "vega_dp_fd": fv2.dp_vega}

    hwio.write_json(hwio.DATA_DIR / "notes_results.json", "notes", cfg,
                    results=results)
    return rc


def cmd_g2pp(args):
    """Second model family at product parity: curve bootstrap, ZBC
    (MC + RQMC + closed form), swaption (MC + conditional-decomposition
    oracle), and CRN-FD vega — everything the Q1-Q3 pipeline does for
    Hull-White, under G2++."""
    from .instruments import swap_fixed_leg
    from .models import g2pp

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 9292)
    market = hwio.load_market(cfg)
    g = g2pp.G2Params(a=args.g2a, b=args.g2b, sigma=args.g2sigma,
                      eta=args.g2eta, rho=args.g2rho)
    print(f"--- G2++ two-factor model: {g} ---")

    # Q1 analogue: curve bootstrap must reproduce the calibration target
    mc = g2pp.bootstrap_curve_g2(cfg, g, key, market,
                                 n_paths=min(cfg.n_paths, 1 << 18))
    err = float(np.max(np.abs(np.asarray(mc.P) - np.asarray(market.P))))
    print(f"[curve] max |P_mc - P_target| = {err:.2e} "
          f"({'PASS' if err < 5e-4 else 'CHECK'})")

    # ZBC three ways
    est = g2pp.price_zbc_g2(cfg, g, key, market)
    true = g2pp.zbc_price_analytic(cfg, g, market)
    q, qse = g2pp.price_zbc_g2_qmc(cfg, g, key, market)
    print(f"[ZBC] MC (CV): {float(est.price):.8f} "
          f"(raw SE {float(est.std_error_raw):.2e}, beta {float(est.beta):.4f})")
    print(f"[ZBC] RQMC:    {float(q):.8f} +/- {float(qse):.2e} (SE)")
    print(f"[ZBC] closed:  {true:.8f}")

    # swaption / coupon-bond option vs the 1-d integral oracle
    sched = swap_fixed_leg(cfg, args.rate, args.tenor, args.freq)
    results = {"curve_max_err": err, "zbc_mc": float(est.price),
               "zbc_qmc": float(q), "zbc_qmc_se": float(qse),
               "zbc_closed": true}
    for payer in (False, True):
        kind = "payer" if payer else "receiver"
        orc = g2pp.swaption_g2_analytic(cfg, g, market, sched, payer=payer)
        sw = g2pp.price_swaption_g2(cfg, g, key, market, sched, payer=payer)
        swq, swq_se = g2pp.price_swaption_g2_qmc(cfg, g, key, market, sched,
                                                 payer=payer)
        print(f"[swaption {kind}] MC {float(sw.price):.8f} "
              f"(raw SE {float(sw.std_error_raw):.2e})  "
              f"RQMC {float(swq):.8f} +/- {float(swq_se):.1e}  "
              f"oracle {orc:.8f}")
        results[f"swaption_{kind}_mc"] = float(sw.price)
        results[f"swaption_{kind}_rqmc"] = float(swq)
        results[f"swaption_{kind}_rqmc_se"] = float(swq_se)
        results[f"swaption_{kind}_oracle"] = orc

    v = float(g2pp.vega_zbc_g2(cfg, g, key, market, eps=args.eps))
    v_an = g2pp.vega_zbc_g2_analytic(cfg, g, market)
    vq, vq_se = g2pp.vega_zbc_g2_rqmc(cfg, g, key, market, eps=args.eps)
    vs = float(g2pp.vega_swaption_g2(cfg, g, key, market, sched,
                                     eps=args.eps))
    vsq, vsq_se = g2pp.vega_swaption_g2_rqmc(cfg, g, key, market, sched,
                                             eps=args.eps)
    vs_an = g2pp.vega_swaption_g2_analytic(cfg, g, market, sched)
    print(f"[vega] ZBC d/dsigma: CRN-FD {v:.6f}  "
          f"RQMC {float(vq):.6f} +/- {float(vq_se):.1e}  "
          f"closed-form FD {v_an:.6f}")
    print(f"[vega] swaption d/dsigma: CRN-FD {vs:.6f}  "
          f"RQMC {float(vsq):.6f} +/- {float(vsq_se):.1e}  "
          f"oracle FD {vs_an:.6f}")
    results.update({"zbc_vega_fd": v, "zbc_vega_analytic": v_an,
                    "zbc_vega_rqmc": float(vq),
                    "zbc_vega_rqmc_se": float(vq_se),
                    "swaption_vega_fd": vs,
                    "swaption_vega_rqmc": float(vsq),
                    "swaption_vega_rqmc_se": float(vsq_se),
                    "swaption_vega_analytic": vs_an})

    # bond-exchange (Margrabe) option — a genuinely two-factor payoff
    from .instruments import curve_level

    Kx = curve_level(cfg, market, 8.0) / curve_level(cfg, market, 10.0)
    xo = g2pp.exchange_analytic_g2(cfg, g, market, 8.0, 10.0, K=Kx)
    xr = g2pp.price_exchange_g2(cfg, g, key, market, 8.0, 10.0, K=Kx)
    print(f"[exchange P(5,8) vs P(5,10), at-forward K={Kx:.5f}] "
          f"MC {float(xr.price):.8f} (raw SE {float(xr.std_error_raw):.1e})"
          f"  closed form {xo:.8f}")
    results.update({"exchange_mc": float(xr.price), "exchange_closed": xo,
                    "exchange_K": Kx})

    if args.validate:
        n = args.validate
        print(f"\n[G2 ZBC] statistical validation: {n} independent runs "
              "(single device call)...")
        runs = g2pp.validate_zbc_g2_runs(cfg, g, key, market, n_runs=n)
        s = hwstats.summarize([float(x) for x in runs[:, 0]])
        s_beta = hwstats.summarize([float(x) for x in runs[:, 2]])
        z = ((s.mean - true) / s.std_error if s.std_error > 0
             else float("nan"))   # single run: no SE, no z
        print(f"mean price (CV):   {s.mean:.8f}  +/- "
              f"{s.margin_of_error:.8f} (95% CI)")
        print(f"closed form:       {true:.8f}   z = {z:.2f}")
        print(f"CV%:               {s.cv_percent:.4f}%   "
              f"mean beta: {s_beta.mean:.6f} (sd {s_beta.std:.6f})")
        results.update({"validation_mean": s.mean,
                        "validation_se": s.std_error,
                        "validation_z_vs_closed": z})

    ex = [cfg.s1 + j for j in range(int(args.tenor))]
    bm = g2pp.price_bermudan_g2(cfg, g, key, market, sched, ex)
    orc_e = g2pp.swaption_g2_analytic(cfg, g, market, sched, payer=False)
    print(f"[Bermudan] ({len(ex)} annual exercises, 2-factor LSMC): "
          f"[{float(bm.price_cv):.8f}, {float(bm.upper):.8f}] "
          f"(SE {float(bm.cv_std_error):.2e}/"
          f"{float(bm.upper_std_error):.2e}; raw lower "
          f"{float(bm.price):.8f} +/- {float(bm.std_error):.2e}; "
          f"early-exercise premium {float(bm.price_cv) - orc_e:.6f})")
    results["bermudan_lower"] = float(bm.price)
    results["bermudan_lower_cv"] = float(bm.price_cv)
    results["bermudan_cv_se"] = float(bm.cv_std_error)
    results["bermudan_upper"] = float(bm.upper)
    results["bermudan_se"] = float(bm.std_error)
    hwio.write_json(hwio.DATA_DIR / "g2pp_results.json", "G2++ model", cfg,
                    results=results)
    # gates scale with the MC noise of the actual --paths (a fixed 5e-4
    # absolute tolerance flakes below ~2^15 paths where the raw SE alone
    # exceeds it); the RQMC vega gate is path-count independent
    curve_tol = 6.0 * 0.15 / np.sqrt(2.0 * min(cfg.n_paths, 1 << 18)) + 5e-5
    ok = (err < curve_tol
          and abs(float(est.price) - true)
          < 5 * float(est.std_error_raw) + 2e-4
          and abs(v - v_an) < 5.0 * 0.174 / np.sqrt(cfg.n_paths) + 1e-3
          and abs(float(vq) - v_an) < 0.02 * abs(v_an) + 1e-4)
    print("validation:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def cmd_sweep(args):
    """Pod-scale sweep (BASELINE configs[4]): 2^24 antithetic pairs
    sharded over a device mesh — curve bootstrap, ZBC CV pricing,
    pathwise vega, and the shared-path strike x maturity grid, one
    command.  On the 8-chip pod this is the production entry; with one
    real chip it runs a 1-device mesh; off-TPU it self-provisions an
    N-device virtual CPU mesh (the CI configuration), so the sharded
    code path is exercised everywhere."""
    from . import grid as grid_mod
    from .parallel import mesh as pmesh
    from .utils.timing import bench, fetch_rtt

    n_dev = args.mesh or len(jax.devices())
    if len(jax.devices()) < n_dev:
        # self-provision a virtual CPU mesh (same dance as
        # __graft_entry__.dryrun_multichip; the TPU backend is already
        # initialized, so env vars are too late)
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
        _xb.get_backend.cache_clear()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_dev)
    devices = jax.devices()[:n_dev]
    mesh = pmesh.path_mesh(devices)
    n_paths = args.paths or (1 << 24)
    cfg = HWConfig(n_paths=n_paths,
                   path_block=min(n_paths & -n_paths,
                                  1 << 15))
    if (cfg.n_paths // cfg.path_block) % n_dev:
        raise SystemExit(f"--paths must give a block count divisible by "
                         f"the {n_dev}-device mesh")
    key = _key(cfg, args)
    eng = args.engine or _default_engine(cfg)
    print(f"--- sweep: {cfg.n_paths} pairs over {n_dev} device(s) "
          f"[{devices[0].platform}; engine {eng}] ---")
    rtt = fetch_rtt()
    t = {}

    prep_c = pricing._curve_prep_fn(cfg, eng)(cfg.sigma, cfg.sigma)
    fc = pricing._curve_sums_run_fn(cfg, eng, mesh)
    dt, sums = bench(fc, key, prep_c, n=args.reps, rtt=rtt)
    t["curve_ms"] = dt * 1e3
    P = np.asarray(sums / (2.0 * cfg.n_paths))
    market = pricing.bootstrap_curve(cfg, key, engine=eng, mesh=mesh)
    print(f"[curve] P(0,10) = {P[-1]:.6f}   {dt*1e3:.1f} ms "
          f"({2*cfg.n_paths/dt/1e6:.0f} M paths/s)")

    prep_o = pricing._option_prep_fn(cfg, eng, "zbc")(
        cfg.sigma, cfg.sigma, market)
    fo = pricing._option_run_fn(cfg, eng, "zbc", mesh)
    dt, m = bench(fo, key, prep_o, market, n=args.reps, rtt=rtt)
    t["zbc_ms"] = dt * 1e3
    from .ops.payoffs import cv_estimate

    est = cv_estimate(jnp.asarray(m), market.P[-1])
    print(f"[zbc]   price = {float(est.price):.8f}   {dt*1e3:.1f} ms "
          f"({2*cfg.n_paths/dt/1e6:.0f} M paths/s)")

    prep_v = pricing._option_prep_fn(cfg, eng, "vega")(
        cfg.sigma, cfg.sigma, market)
    fv = pricing._option_run_fn(cfg, eng, "vega", mesh)
    dt, v = bench(fv, key, prep_v, market, n=args.reps, rtt=rtt)
    t["vega_ms"] = dt * 1e3
    print(f"[vega]  {float(v[0]/v[1]):.6f}   {dt*1e3:.1f} ms "
          f"({cfg.n_paths/dt/1e6:.0f} M paths/s)")

    Ks = [cfg.strike * (1 + s) for s in (-0.03, -0.015, 0.0, 0.015, 0.03)]
    S2s = [6.0, 7.0, 8.0, 9.0, 10.0]
    g = grid_mod.price_zbc_grid(cfg, key, market, Ks, S2s, mesh=mesh)
    print(f"[grid]  {len(Ks)}x{len(S2s)} shared-path surface: "
          f"price[mid] = {float(g.price[2, -1]):.8f}")
    hwio.write_json(hwio.DATA_DIR / "sweep_results.json",
                    f"sweep over {n_dev} devices", cfg,
                    results={**t, "n_devices": n_dev,
                             "P10": float(P[-1]),
                             "zbc": float(est.price),
                             "vega": float(v[0] / v[1]),
                             "grid_mid": float(g.price[2, -1])})
    print("saved data/sweep_results.json")
    return 0


def cmd_grid(args):
    from . import grid as grid_mod

    cfg = _cfg(args)
    key = jax.random.fold_in(_key(cfg, args), 3333)
    market = hwio.load_market(cfg)
    Ks = [cfg.strike * (1 + s) for s in (-0.03, -0.015, 0.0, 0.015, 0.03)]
    S2s = [6.0, 7.0, 8.0, 9.0, 10.0]
    print(f"--- ZBC option surface: {len(Ks)} strikes x {len(S2s)} "
          f"maturities, shared paths ---")
    g = grid_mod.price_zbc_grid(cfg, key, market, Ks, S2s)
    _, vegas = grid_mod.vega_zbc_grid(cfg, key, market, Ks, S2s)
    print("prices (rows = strikes, cols = S2):")
    print(np.array2string(np.asarray(g.price), precision=6))
    print("vegas:")
    print(np.array2string(np.asarray(vegas), precision=5))
    from .models import g2pp

    g2 = g2pp.G2Params()
    gres = g2pp.price_zbc_grid_g2(cfg, g2, key, market, Ks, S2s)
    orc = g2pp.zbc_grid_analytic_g2(cfg, g2, market, Ks, S2s)
    gerr = float(np.abs(np.asarray(gres.price) - orc).max())
    print(f"G2++ surface (same grid, shared 3-normal states): "
          f"max |MC - closed| = {gerr:.2e}")
    gv, gv_se = g2pp.vega_zbc_grid_g2(cfg, g2, key, market, Ks, S2s)
    gv_orc = g2pp.vega_zbc_grid_analytic_g2(cfg, g2, market, Ks, S2s)
    gv_err = float(np.abs(np.asarray(gv) - gv_orc).max())
    print(f"G2++ vega surface (paired-shift RQMC): "
          f"max |MC - closed FD| = {gv_err:.2e} "
          f"(max SE {float(np.max(np.asarray(gv_se))):.1e})")
    hwio.write_json(
        hwio.DATA_DIR / "grid_results.json", "Option surface", cfg,
        results={"strikes": [float(x) for x in Ks],
                 "maturities": S2s, "g2_max_err": gerr,
                 "g2_vega_max_err": gv_err},
        arrays={"price": np.asarray(g.price),
                "beta": np.asarray(g.beta),
                "vega": np.asarray(vegas),
                "g2_price": np.asarray(gres.price),
                "g2_vega": np.asarray(gv)})
    return 0


# ---------------------------------------------------------------------------
# benchmark — engine-tier comparison (reference benchmark_reductions.cu)
# ---------------------------------------------------------------------------

def cmd_benchmark(args):
    from .benchmarks import run_ab, run_benchmark, run_roofline

    if args.ab:
        return run_ab(_cfg(args), _key(_cfg(args), args), args.ab,
                      n_runs=args.ab_runs)
    if args.roofline:
        return run_roofline(_cfg(args), _key(_cfg(args), args),
                            reps=args.reps)
    return run_benchmark(_cfg(args), _key(_cfg(args), args),
                         reps=args.reps, sweep=args.sweep)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hullwhite_tpu",
                                 description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--paths", type=int, default=None,
                        help="antithetic path pairs (default 2^20)")
    common.add_argument("--engine", choices=pricing.ENGINES, default=None)
    common.add_argument("--seed", type=int, default=None)
    common.add_argument("--reps", type=int, default=10,
                        help="timing repetitions")
    common.add_argument("--precision", default=None,
                        choices=["default", "high", "highest"],
                        help="MXU matmul precision override (see "
                             "HWConfig.matmul_precision)")
    sub.add_parser("q1", parents=[common])
    p2 = sub.add_parser("q2", parents=[common])
    p2.add_argument("--validate", type=int, default=0, metavar="N",
                    help="run N-run statistical validation")
    p2.add_argument("--qmc", type=int, default=0, metavar="NPTS",
                    help="also price with randomized QMC on NPTS points")
    p3 = sub.add_parser("q3", parents=[common])
    p3.add_argument("--validate", type=int, default=0, metavar="N")
    p3.add_argument("--eps", type=float, default=1e-3)
    p3.add_argument("--qmc", type=int, default=0, metavar="NPTS")
    p3.add_argument("--profile", action="store_true",
                    help="print the XLA compile report before the hot launch")
    p3.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of one hot vega "
                         "launch into DIR (view with perfetto/tensorboard)")
    pb = sub.add_parser("benchmark", parents=[common])
    pb.add_argument("--sweep", action="store_true",
                    help="also sweep path_block sizes (reference C39)")
    pb.add_argument("--ab", choices=["rng", "precision", "fullstep"],
                    default=None,
                    help="20-run paired A/B (RNG design / MXU precision / "
                         "fullstep mixed generator) -> data/ab_results_{mode}.json")
    pb.add_argument("--ab-runs", type=int, default=20)
    pb.add_argument("--roofline", action="store_true",
                    help="full-step tier speed-of-light accounting "
                         "(TPU) -> data/fullstep_roofline.json")
    ps = sub.add_parser("swaption", parents=[common])
    ps.add_argument("--rate", type=float, default=0.025)
    ps.add_argument("--tenor", type=float, default=5.0)
    ps.add_argument("--freq", type=float, default=1.0)
    ps.add_argument("--payer", action="store_true")
    ps.add_argument("--bermudan", action="store_true",
                    help="also price the Bermudan with annual exercises")
    ps.add_argument("--delta", action="store_true",
                    help="with --bermudan: CRN curve-delta of the "
                         "bracket vs the DP oracle")
    ps.add_argument("--bermudan-sweep", action="store_true",
                    help="bracket + DP oracle for k = 1..5 exercise "
                         "rights -> data/bermudan_sweep.json")
    sub.add_parser("grid", parents=[common])
    psw = sub.add_parser("sweep", parents=[common])
    psw.add_argument("--mesh", type=int, default=None, metavar="N",
                     help="device-mesh size (default: all devices; "
                          "self-provisions a virtual CPU mesh off-TPU)")
    pg2 = sub.add_parser("g2pp", parents=[common])
    pg2.add_argument("--g2a", type=float, default=1.0)
    pg2.add_argument("--g2b", type=float, default=0.1)
    pg2.add_argument("--g2sigma", type=float, default=0.08)
    pg2.add_argument("--g2eta", type=float, default=0.02)
    pg2.add_argument("--g2rho", type=float, default=-0.6)
    pg2.add_argument("--rate", type=float, default=0.025)
    pg2.add_argument("--tenor", type=float, default=5.0)
    pg2.add_argument("--freq", type=float, default=1.0)
    pg2.add_argument("--eps", type=float, default=1e-2)
    pg2.add_argument("--validate", type=int, default=0, metavar="N")
    pc = sub.add_parser("cap", parents=[common])
    pc.add_argument("--rate", type=float, default=0.02)
    pc.add_argument("--tenor", type=float, default=4.0)
    pc.add_argument("--freq", type=float, default=1.0)
    pc.add_argument("--floor", action="store_true")
    prf = sub.add_parser("rfr", parents=[common])
    prf.add_argument("--strike", type=float, default=0.02)
    prf.add_argument("--start", type=float, default=None)
    prf.add_argument("--end", type=float, default=None)
    prf.add_argument("--tenor", type=float, default=3.0,
                     help="strip tenor in years (ignored when --end set)")
    prf.add_argument("--freq", type=float, default=1.0)
    prf.add_argument("--rqmc", action="store_true",
                     help="digitally-shifted Sobol draws")
    prf.add_argument("--averaged", action="store_true",
                     help="arithmetic-average style (default: compounded)")
    prf.add_argument("--n-obs", type=int, default=None,
                     help="averaged-style observation count "
                          "(default: one per step)")
    prf.add_argument("--g2", action="store_true",
                     help="also price the G2++ twins vs their oracles")
    for flag, dv in (("--g2a", 1.0), ("--g2b", 0.1), ("--g2sigma", 0.08),
                     ("--g2eta", 0.02), ("--g2rho", -0.6)):
        prf.add_argument(flag, type=float, default=dv)
    pcm = sub.add_parser("cms", parents=[common])
    pcm.add_argument("--rate", type=float, default=0.02)
    pcm.add_argument("--tenor", type=float, default=4.0)
    pcm.add_argument("--freq", type=float, default=1.0)
    pcm.add_argument("--swap-tenor", type=float, default=5.0)
    pcm.add_argument("--floor", action="store_true")
    pcm.add_argument("--g2", action="store_true",
                     help="also price the G2++ twin vs its oracle")
    pex = sub.add_parser("exotics", parents=[common])
    pex.add_argument("--strike", type=float, default=0.002,
                     help="CMS spread strike")
    pex.add_argument("--tenor", type=float, default=3.0)
    pex.add_argument("--freq", type=float, default=1.0)
    pex.add_argument("--long-tenor", type=float, default=4.0)
    pex.add_argument("--short-tenor", type=float, default=1.0)
    pex.add_argument("--coupon", type=float, default=0.03,
                     help="range-accrual coupon")
    pex.add_argument("--lo", type=float, default=0.010)
    pex.add_argument("--hi", type=float, default=0.022)
    pex.add_argument("--obs", type=int, default=5,
                     help="range observations per period")
    pex.add_argument("--target", type=float, default=0.055,
                     help="TARN cumulative-coupon knockout target")
    pex.add_argument("--cap-rate", type=float, default=0.013,
                     help="chooser/auto cap strike rate")
    pex.add_argument("--rights", type=int, default=2,
                     help="chooser cap exercise budget k")
    pex.add_argument("--ratchet-spread", type=float, default=0.0,
                     help="ratchet cap reset spread over the previous "
                          "fixing")
    pex.add_argument("--ko-barrier", type=float, default=0.05,
                     help="up-and-out cap knock-out LIBOR level")
    pex.add_argument("--fine", action="store_true",
                     help="fine G2 DP oracle grids (241, 91, 20) — "
                          "artifact runs; shrinks the exercise-kink "
                          "bilinear bias ~5x")
    pxv = sub.add_parser("xva", parents=[common])
    pxv.add_argument("--rate", type=float, default=0.02)
    pxv.add_argument("--tenor", type=float, default=4.0)
    pxv.add_argument("--freq", type=float, default=1.0)
    pxv.add_argument("--payer", action="store_true",
                     help="payer swap (default receiver)")
    pxv.add_argument("--quantile", type=float, default=0.95,
                     help="PFE quantile")
    pxv.add_argument("--hazard", type=float, default=0.02,
                     help="flat default intensity")
    pxv.add_argument("--recovery", type=float, default=0.4)
    pxv.add_argument("--n-blocks", type=int, default=4, dest="n_blocks")
    pxv.add_argument("--rqmc", action="store_true",
                     help="digitally-shifted Sobol blocks")
    pxv.add_argument("--g2", action="store_true",
                     help="also run the G2++ twin vs its oracle")
    pxv.add_argument("--netting", action="store_true",
                     help="also run a 3-swap netting set vs its "
                          "segment-decomposed oracle")
    pxv.add_argument("--csa", action="store_true",
                     help="also run the collateralized (threshold CSA, "
                          "lagged MPoR) profile vs its oracle")
    pxv.add_argument("--threshold", type=float, default=0.005,
                     help="CSA threshold H (posts (V-H)^+)")
    pxv.add_argument("--lag", type=int, default=1,
                     help="margin period of risk in reset periods "
                          "(0 = continuous margining)")
    pxv.add_argument("--bilateral", action="store_true",
                     help="also quote BCVA = CVA - DVA and asymmetric "
                          "FVA vs the bilateral oracle")
    pxv.add_argument("--wwr", action="store_true",
                     help="also quote the wrong-way-risk CVA under "
                          "lambda_t = hazard + gamma r_t vs its "
                          "two-tilt closed-form oracle")
    pxv.add_argument("--gamma", type=float, default=0.5,
                     help="intensity-rate slope (wrong-way for a payer, "
                          "right-way for a receiver)")
    pxv.add_argument("--mva", action="store_true",
                     help="also quote the MVA of delta-normal dynamic "
                          "initial margin vs its closed-form oracle")
    pxv.add_argument("--cds", metavar="QUOTES", default=None,
                     help="bootstrap a piecewise-constant hazard curve "
                          "from par CDS quotes 'mat:spread,...' (e.g. "
                          "'1:0.006,3:0.009,5:0.013') and price the "
                          "netted CVA under the term structure")
    pxv.add_argument("--bermudan", action="store_true",
                     help="also quote the Bermudan-swaption exposure "
                          "profile + CVA (American-MC XVA) vs the "
                          "forward-DP oracle")
    pxv.add_argument("--kva", action="store_true",
                     help="also quote the KVA (capital cost of the "
                          "netted 3-swap book, K = kappa EE) vs its "
                          "closed-form oracle")
    pxv.add_argument("--cost-capital", type=float, default=0.10,
                     help="capital hurdle rate c_h")
    pxv.add_argument("--capital-ratio", type=float, default=0.08,
                     help="capital per unit exposure kappa "
                          "(capital ratio x risk weight)")
    pxv.add_argument("--mpor", type=float, default=0.1,
                     help="margin period of risk in years (snapped to "
                          "the step grid)")
    pxv.add_argument("--spread-im", type=float, default=0.005,
                     help="IM funding spread")
    pxv.add_argument("--quantile-im", type=float, default=0.99,
                     help="IM quantile (z_q scale)")
    pxv.add_argument("--hazard-own", type=float, default=0.01,
                     help="own default intensity (DVA leg)")
    pxv.add_argument("--recovery-own", type=float, default=0.4)
    pxv.add_argument("--spread-borrow", type=float, default=0.005,
                     help="funding borrow spread (FCA)")
    pxv.add_argument("--spread-lend", type=float, default=0.002,
                     help="funding lend spread (FBA)")
    pnt = sub.add_parser("notes", parents=[common])
    pnt.add_argument("--sb-initial", type=float, default=0.02,
                     help="snowball initial coupon c_0")
    pnt.add_argument("--sb-spread", type=float, default=0.013)
    pnt.add_argument("--sb-cap", type=float, default=0.06)
    pnt.add_argument("--fl-cap", type=float, default=0.016,
                     help="capped-floater coupon cap")
    pnt.add_argument("--fl-spread", type=float, default=0.004)
    pnt.add_argument("--fl-tenor", type=float, default=3.0)
    pnt.add_argument("--floor", type=float, default=0.0)
    pnt.add_argument("--tenor", type=float, default=4.0)
    pnt.add_argument("--freq", type=float, default=1.0)
    pnt.add_argument("--fine", action="store_true",
                     help="fine G2 DP oracle grids (241, 91, 20)")
    pcal = sub.add_parser("calibrate", parents=[common])
    for flag, dv in [("--g2a", 1.0), ("--g2b", 0.1), ("--g2sigma", 0.08),
                     ("--g2eta", 0.02), ("--g2rho", -0.6)]:
        pcal.add_argument(flag, type=float, default=dv)
    pall = sub.add_parser("all", parents=[common])
    pall.add_argument("--validate", type=int, default=0)
    pall.add_argument("--eps", type=float, default=1e-3)
    pall.add_argument("--qmc", type=int, default=0)
    pall.add_argument("--profile", action="store_true")

    args = ap.parse_args(argv)
    if args.cmd == "q1":
        return cmd_q1(args)
    if args.cmd == "q2":
        return cmd_q2(args)
    if args.cmd == "q3":
        return cmd_q3(args)
    if args.cmd == "benchmark":
        return cmd_benchmark(args)
    if args.cmd == "swaption":
        return cmd_swaption(args)
    if args.cmd == "grid":
        return cmd_grid(args)
    if args.cmd == "sweep":
        return cmd_sweep(args)
    if args.cmd == "g2pp":
        return cmd_g2pp(args)
    if args.cmd == "cap":
        return cmd_cap(args)
    if args.cmd == "cms":
        return cmd_cms(args)
    if args.cmd == "rfr":
        return cmd_rfr(args)
    if args.cmd == "exotics":
        return cmd_exotics(args)
    if args.cmd == "notes":
        return cmd_notes(args)
    if args.cmd == "xva":
        return cmd_xva(args)
    if args.cmd == "calibrate":
        return cmd_calibrate(args)
    if args.cmd == "all":
        rc = cmd_q1(args)
        rc |= cmd_q2(args)
        rc |= cmd_q3(args)
        args.sweep = False
        rc |= cmd_benchmark(args)
        return rc
    return 2


if __name__ == "__main__":
    sys.exit(main())
