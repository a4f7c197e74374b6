"""Vega three ways: pathwise dual process, AD (jvp) tangents, and CRN
finite differences with/without market recalibration.

Replaces reference ``src/3_sensitivity_analysis.cu``:

* ``pricing.pathwise_vega`` — hand-derived dual process (C28);
* ``jvp_vega`` — ``jax.jvp`` of the whole pricing pipeline w.r.t. sigma,
  which must agree with the hand-derived dual process (a cross-check the
  reference cannot perform);
* ``fd_vega_crn`` — central difference under sigma +/- eps with Common
  Random Numbers.  The reference implements CRN by backing up/restoring the
  2^20-entry cuRAND state array around each pricing call
  (3_sensitivity_analysis.cu:407-435); with counter-based keys, passing the
  same key *is* CRN.  The sigma bump is calibration-consistent: the drift
  table is rebuilt under the shifted theta (C6/C35) via
  ``step_tables(cfg, sigma, sigma0=cfg.sigma)``.
* ``fd_vega_recalibrated`` — re-bootstraps the full P/f market curves at
  sigma +/- eps before pricing (C36, 3_sensitivity_analysis.cu:449-525),
  reproducing the reference's finding that recalibration *degrades* the
  estimate by injecting curve-level Monte Carlo noise (README.md:51).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HWConfig
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .ops import engine_linear
from .ops.rng import block_normals
from .parallel import mesh as pmesh
from . import pricing


class FDVega(NamedTuple):
    vega: jax.Array
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def fd_vega_crn(cfg: HWConfig, key, market: MarketCurve, *, eps: float = 1e-3,
                engine: str = "linear", mesh=None) -> FDVega:
    """Central-difference vega of the CV-adjusted ZBC price, CRN by key reuse."""
    p_m = pricing.price_zbc(cfg, key, market, sigma=cfg.sigma - eps,
                            engine=engine, mesh=mesh).price
    p_p = pricing.price_zbc(cfg, key, market, sigma=cfg.sigma + eps,
                            engine=engine, mesh=mesh).price
    return FDVega((p_p - p_m) / (2.0 * eps), p_m, p_p, eps)


def fd_vega_recalibrated(cfg: HWConfig, key, curve_key, *, eps: float = 1e-3,
                         engine: str = "linear", mesh=None) -> FDVega:
    """FD vega with full market recalibration at each sigma bump.

    At sigma' the model is re-specified with the ground-truth theta (no
    calibration shift: sigma0 = sigma'), the P/f curves are re-simulated
    with the *same* curve key (CRN at the curve level, mirroring the
    reference's RNG-state copy into recompute_market_data), and the option
    is priced against the fresh curves.
    """
    legs = []
    for sgn in (-1.0, 1.0):
        sig = cfg.sigma + sgn * eps
        mkt = pricing.bootstrap_curve(cfg, curve_key, sigma=sig, sigma0=sig,
                                      engine=engine, mesh=mesh)
        est = pricing.price_zbc(cfg, key, mkt, sigma=sig, sigma0=sig,
                                engine=engine, mesh=mesh)
        legs.append(est.price)
    p_m, p_p = legs
    return FDVega((p_p - p_m) / (2.0 * eps), p_m, p_p, eps)


# ---------------------------------------------------------------------------
# AD vega: jax.jvp through the full pricing pipeline
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _jvp_vega_fn(cfg: HWConfig, mesh, antithetic: bool):
    dtype = jnp.dtype(cfg.dtype)
    n1 = cfg.n_steps_s1

    def raw_price_mean(sigma, key, market):
        """Mean discounted payoff (no control variate) as a function of
        sigma; everything downstream of sigma (drift tables, shock scale,
        bond-reconstruction A/B, payoff kink) is differentiated by AD."""
        tables = hw.step_tables(cfg, sigma, cfg.sigma, dtype)
        zw = engine_linear.zbc_weights(cfg, tables)

        def block_fn(key, i):
            G = block_normals(key, i, (cfg.path_block, n1), dtype)
            st = engine_linear.antithetic_state(cfg, zw, G)

            def leg(r, integral):
                P = hw.p_bond(cfg, sigma, market, cfg.s1, cfg.s2, r)
                return jnp.exp(-integral) * jnp.maximum(P - cfg.strike, 0.0)

            x = jnp.sum(leg(st.r_p, st.i_p), dtype=jnp.float32)
            if antithetic:
                x = x + jnp.sum(leg(st.r_m, st.i_m), dtype=jnp.float32)
            return x[None]

        runner = pmesh.shard_blocks(pricing._block_loop(block_fn, 1), mesh)
        total = runner(key, cfg.n_blocks)[0]
        denom = (2.0 if antithetic else 1.0) * cfg.n_paths
        return total / denom

    def compute(sigma, key, market):
        price, vega = jax.jvp(
            lambda s: raw_price_mean(s, key, market), (sigma,), (jnp.ones_like(sigma),)
        )
        return price, vega

    return jax.jit(compute)


def jvp_vega(cfg: HWConfig, key, market: MarketCurve, *, mesh=None,
             antithetic: bool = False):
    """(raw price, vega) by forward-mode AD through the simulation."""
    sigma = jnp.asarray(cfg.sigma, jnp.dtype(cfg.dtype))
    return _jvp_vega_fn(cfg, mesh, antithetic)(sigma, key, market)


def gamma_zbc(cfg: HWConfig, key, market: MarketCurve, *, eps: float = 1e-4,
              engine: str = "exact", mesh=None):
    """Gamma (d^2 price / d r0^2) by a CRN central difference of the
    pathwise delta.  The payoff kink makes a pure second-order pathwise
    estimator ill-defined (Dirac term); differencing the pathwise delta
    under common random numbers sidesteps it with O(eps^2) bias."""
    d = {}
    for sgn in (-1.0, 1.0):
        cfg_b = cfg.replace(r0=cfg.r0 + sgn * eps)
        d[sgn] = pricing.pathwise_delta(cfg_b, key, market, engine=engine,
                                        mesh=mesh)
    return (d[1.0] - d[-1.0]) / (2.0 * eps)


@lru_cache(maxsize=None)
def _swaption_vega_fn(cfg: HWConfig, sched, strike: float, payer: bool,
                      engine: str, mesh):
    from .instruments import _cbo_moments_fn
    from .ops.payoffs import cv_estimate

    moments_fn = _cbo_moments_fn(cfg, engine, mesh, sched, strike, payer)

    def compute(sigma, key, market):
        def price_of(s):
            moments, ey = moments_fn(key, s, market)
            return cv_estimate(moments, ey).price

        return jax.jvp(price_of, (sigma,), (jnp.ones_like(sigma),))

    return jax.jit(compute)


def vega_swaption(cfg: HWConfig, key, market: MarketCurve, sched,
                  strike: float = 1.0, *, payer: bool = False,
                  engine: str = "exact", mesh=None):
    """(price, vega) of a coupon-bond option / swaption by forward-mode AD
    through the CV-adjusted pricer (calibration-consistent sigma bump, same
    convention as the ZBC vega)."""
    sigma = jnp.asarray(cfg.sigma, jnp.float32)
    return _swaption_vega_fn(cfg, sched, float(strike), bool(payer),
                             engine, mesh)(sigma, key, market)


def bermudan_vega(cfg: HWConfig, key, market: MarketCurve, sched,
                  exercise_dates, *, strike: float = 1.0,
                  payer: bool = False, n_paths: int | None = None,
                  n_blocks: int = 1, rqmc: bool = False,
                  eps: float = 1e-3, mode: str = "jvp", mesh=None):
    """(price, vega, upper, upper_vega): d/dsigma of the Bermudan bracket.

    mode="jvp": forward-mode AD through the full two-pass estimator in
    one evaluation.  The exact multi-date states are smooth in sigma (it
    enters only through the Cholesky scale and the drift shift, the
    library-wide invariant), the refit-policy derivative through the WLS
    solve is exact, and the exercise indicator's discontinuity
    contributes zero a.s. — so the LOWER bound's tangent is the exact
    pathwise vega (same justification as the reference's pathwise dP/dsig,
    3_sensitivity_analysis.cu:22-96, lifted to the optimal-stopping
    payoff).  The UPPER bound's tangent additionally differentiates
    through the bisection-located proxy boundary, whose tangent is only
    approximate; because the AB bound is MINIMIZED over proxies at the
    true value function, dU/d(boundary) ~ 0 near the optimum and the
    error is second order.

    mode="fd": central differences under common random numbers (two
    evaluations, both bounds exact up to O(eps^2) truncation).
    """
    from . import bermudan as bermudan_mod

    if n_paths is None:
        n_paths = cfg.n_paths
    if rqmc and n_blocks < 2:
        # mirror price_bermudan's guard (this entry calls _bermudan_fn
        # directly): with one block the shift-replicate SEs are NaN
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent SE replicates)")
    ex = tuple(sorted(float(t) for t in exercise_dates))
    fn = bermudan_mod._bermudan_fn(cfg, ex, sched, float(strike),
                                   bool(payer), int(n_paths),
                                   int(n_blocks), bool(rqmc), mesh)
    sigma = jnp.asarray(cfg.sigma, jnp.float32)
    if mode == "jvp":
        def lo_up(s):
            p, _, _, u, *_ = fn(key, s, market)
            return p, u

        (p, u), (dp, du) = jax.jvp(lo_up, (sigma,),
                                   (jnp.ones_like(sigma),))
        return p, dp, u, du
    if mode != "fd":
        raise ValueError("mode must be 'jvp' or 'fd'")
    pp = fn(key, sigma + eps, market)
    pm = fn(key, sigma - eps, market)
    return (0.5 * (pp[0] + pm[0]), (pp[0] - pm[0]) / (2.0 * eps),
            0.5 * (pp[3] + pm[3]), (pp[3] - pm[3]) / (2.0 * eps))


def shift_curve(cfg: HWConfig, market: MarketCurve, h) -> MarketCurve:
    """Parallel forward-curve bump: f(0,T) -> f(0,T) + h, and consistently
    P(0,T) -> P(0,T) e^{-h T}.  The standard hedging scenario the CUDA
    reference never prices (its only greek is vega); both arrays move so
    every consumer (A(t,T) uses f, discounting uses P) stays coherent."""
    Ts = jnp.linspace(0.0, cfg.t_final, cfg.n_mat).astype(market.P.dtype)
    return MarketCurve(P=market.P * jnp.exp(-jnp.asarray(h, market.P.dtype)
                                            * Ts),
                       f=market.f + jnp.asarray(h, market.f.dtype))


def bermudan_delta(cfg: HWConfig, key, market: MarketCurve, sched,
                   exercise_dates, *, strike: float = 1.0,
                   payer: bool = False, n_paths: int | None = None,
                   n_blocks: int = 1, rqmc: bool = False,
                   h: float = 1e-3, mesh=None):
    """(delta_lower, delta_upper): d/dh of the Bermudan bracket under a
    parallel forward-curve shift, by central differences with common
    random numbers (same key => the exact multi-date states are IDENTICAL
    on both legs — the curve enters only the payoff coefficients and
    discount levels — so the FD noise is far below each bound's own SE).
    Oracle-testable: the fp64 DP oracle evaluated on the shifted curves
    gives the exact value (tests/test_greeks.py)."""
    from . import bermudan as bermudan_mod

    rp = bermudan_mod.price_bermudan(
        cfg, key, shift_curve(cfg, market, +h), sched, exercise_dates,
        strike=strike, payer=payer, n_paths=n_paths, n_blocks=n_blocks,
        rqmc=rqmc, mesh=mesh)
    rm = bermudan_mod.price_bermudan(
        cfg, key, shift_curve(cfg, market, -h), sched, exercise_dates,
        strike=strike, payer=payer, n_paths=n_paths, n_blocks=n_blocks,
        rqmc=rqmc, mesh=mesh)
    return ((float(rp.price) - float(rm.price)) / (2.0 * h),
            (float(rp.upper) - float(rm.upper)) / (2.0 * h))


def fd_vega_cap(cfg: HWConfig, key, market: MarketCurve, *, rate: float,
                tenor: float, start: float | None = None,
                freq: float = 1.0, floor: bool = False, eps: float = 1e-3,
                n_paths: int | None = None, n_blocks: int = 1, mesh=None):
    """Cap/floor vega by central differences under common random numbers
    (sigma enters the multi-date exact sampler only through the
    tables.sig_st scale, so the same key gives identical normals on both
    legs — the library-wide CRN invariant).  Oracle: the fp64 FD of
    instruments.cap_closed_form(sigma=...)."""
    from .instruments import price_cap

    pp = price_cap(cfg, key, market, rate=rate, start=start, tenor=tenor,
                   freq=freq, floor=floor, sigma=cfg.sigma + eps,
                   n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    pm = price_cap(cfg, key, market, rate=rate, start=start, tenor=tenor,
                   freq=freq, floor=floor, sigma=cfg.sigma - eps,
                   n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    return (float(pp.price) - float(pm.price)) / (2.0 * eps)


class CalibrationResult(NamedTuple):
    a: float
    sigma: float
    rmse: float
    n_iter: int
    residuals: tuple


def zbc_quote(market: MarketCurve):
    """Closed-form ZBC pricer cfg -> price (uses cfg.s1/s2/strike)."""
    from .models import oracles

    def pricer(c: HWConfig) -> float:
        Ts = np.linspace(0.0, c.t_final, c.n_mat)
        P = np.asarray(market.P, np.float64)
        return oracles.zbc_price(c, P0_s1=float(np.interp(c.s1, Ts, P)),
                                 P0_s2=float(np.interp(c.s2, Ts, P)))

    return pricer


def cap_quote(market: MarketCurve, *, rate: float, tenor: float,
              start: float | None = None, freq: float = 1.0,
              floor: bool = False):
    """Closed-form cap/floor pricer cfg -> price."""
    from .instruments import cap_closed_form

    def pricer(c: HWConfig) -> float:
        return cap_closed_form(c, market, rate=rate, start=start,
                               tenor=tenor, freq=freq, floor=floor)[0]

    return pricer


def swaption_quote(market: MarketCurve, sched, *, strike: float = 1.0,
                   payer: bool = False):
    """Jamshidian swaption pricer cfg -> price."""
    from .instruments import jamshidian_price

    def pricer(c: HWConfig) -> float:
        return jamshidian_price(c, market, sched, strike, payer=payer)

    return pricer


def calibrate_hw(cfg: HWConfig, quotes, *, a0: float | None = None,
                 sigma0: float | None = None, tol: float = 1e-12,
                 max_iter: int = 60) -> CalibrationResult:
    """Jointly fit (a, sigma) to a set of closed-form instrument quotes —
    the multi-instrument generalization of ``implied_sigma``, completing
    the calibrate -> price -> hedge loop the reference never closes (its
    sigma is a hard-coded constant, common.cuh:33).

    ``quotes``: sequence of ``(pricer, target_price)`` with
    ``pricer(cfg) -> float64 model price`` under ``cfg.a``/``cfg.sigma``
    (build with ``zbc_quote``/``cap_quote``/``swaption_quote``).  The
    market curve is observed data, independent of (a, sigma): theta(t)
    absorbs the fit to the curve for ANY parameters, so the closed forms
    price off the curve directly and the 2-parameter problem is
    well-posed with >= 2 structurally distinct quotes.

    Damped Gauss-Newton in log-parameters (positivity built in), fp64
    host: J^T J step with Levenberg lambda, halved on rejection.
    """
    import math

    th = np.log([cfg.a if a0 is None else a0,
                 cfg.sigma if sigma0 is None else sigma0])

    def resid(t):
        c = cfg.replace(a=float(math.exp(t[0])),
                        sigma=float(math.exp(t[1])))
        return np.array([p(c) - tgt for p, tgt in quotes], np.float64)

    r = resid(th)
    lam = 1e-10
    it = 0
    for it in range(1, max_iter + 1):
        eps = 1e-6
        J = np.empty((len(r), 2))
        for j in range(2):
            tp = th.copy()
            tp[j] += eps
            J[:, j] = (resid(tp) - r) / eps
        A = J.T @ J
        g = J.T @ r
        step = np.linalg.solve(A + lam * np.diag(np.diag(A) + 1e-30),
                               g)
        th_new = th - step
        r_new = resid(th_new)
        if np.sum(r_new ** 2) <= np.sum(r ** 2):
            th, r = th_new, r_new
            lam = max(lam * 0.25, 1e-12)
        else:
            lam *= 10.0
        if np.max(np.abs(step)) < tol or np.sum(r ** 2) < tol:
            break
    return CalibrationResult(a=float(math.exp(th[0])),
                             sigma=float(math.exp(th[1])),
                             rmse=float(np.sqrt(np.mean(r ** 2))),
                             n_iter=it, residuals=tuple(map(float, r)))


def implied_sigma(cfg: HWConfig, market: MarketCurve, target_price: float,
                  *, sigma0: float | None = None, tol: float = 1e-12,
                  max_iter: int = 60) -> float:
    """Calibrate sigma to a target ZBC price (float64 Newton on the
    closed form — the inverse problem the reference never solves, closing
    the calibrate -> price -> hedge loop).

    The closed-form ZBC is monotone increasing in sigma (its vega is
    positive), so Newton from any sigma0 > 0 with a bisection fallback
    converges globally.
    """
    import math

    from .models.oracles import _pdf, _phi

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P = np.asarray(market.P, np.float64)
    P1 = float(np.interp(cfg.s1, Ts, P))
    P2 = float(np.interp(cfg.s2, Ts, P))
    K = cfg.strike
    a = cfg.a
    B = (1.0 - math.exp(-a * (cfg.s2 - cfg.s1))) / a
    c = B * math.sqrt((1.0 - math.exp(-2.0 * a * cfg.s1)) / (2.0 * a))

    def price_and_vega(sig):
        sp = sig * c
        h = math.log(P2 / (K * P1)) / sp + 0.5 * sp
        price = P2 * _phi(h) - K * P1 * _phi(h - sp)
        vega = P2 * _pdf(h) * c  # Black-style: dP/dsigma = P2 phi(h) c
        return price, vega

    lo, hi = 1e-8, 5.0
    sig = float(sigma0 if sigma0 is not None else cfg.sigma)
    for _ in range(max_iter):
        price, vega = price_and_vega(sig)
        err = price - target_price
        if abs(err) < tol:
            return sig
        if err > 0:
            hi = min(hi, sig)
        else:
            lo = max(lo, sig)
        step = err / max(vega, 1e-16)
        nxt = sig - step
        if not (lo < nxt < hi):
            nxt = 0.5 * (lo + hi)  # bisection fallback
        sig = nxt
    return sig
