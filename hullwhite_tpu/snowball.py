"""Snowball note (beyond-reference exotic).

An inverse-floater note whose coupon RATE accumulates path-dependently:

    c_0 = initial,   c_j = clip(c_{j-1} + spread - L(T_j; delta),
                               floor, cap)   for j = 1..n-1,

paying tau * c_j at T_{j+1} and redeeming 1 at T_n.  The coupon grows
when rates fall and melts when they rise — the classic "snowball".  This
widens the reference's single European option (the product layer,
src/2_option_pricing.cu:14-35) to a CONTINUOUS-state path-dependent
coupon, one structural step past the TARN's lattice state: the running
coupon c is real-valued, so the fp64 oracle is a 2-d value iteration
over (r-grid x c-grid):

* conditioning on r(T_j) uses the same Gaussian projection of the exact
  discrete law as the note/TARN oracles (``bermudan._interval_params``
  construction), with the continuation integrated r-wise by the exact
  piecewise-linear x Gaussian cell kernel (``range_note._kernel_avg``)
  ONCE PER c-LEVEL (the kernel is linear in the value vector), then
  interpolated linearly in c at the deterministic update
  c' = clip(c + spread - L(r), floor, cap) — the only approximation
  beyond the grids (the value is near-linear in c: each unit of coupon
  rate is worth a deterministic annuity to first order);
* the MC applies the exact recursion to exactly-sampled multi-date
  (r, I) states, antithetic, with the UNCLIPPED linear snowball as a
  control variate: its mean is CLOSED FORM (each term is a tilted
  lognormal partial moment, ``snowball_linear_closed_form``), and the
  clips bind rarely enough that the CV absorbs most of the variance.

Engine invariants kept: blocks key on the GLOBAL block index, sigma
enters only through ``tables.sig_st``, every product takes
n_blocks/mesh.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import HWConfig
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .ops.interp import uinterp
from .parallel import mesh as pmesh
from .range_note import _kernel_avg, _note_dates, _note_shapes
from .floater import _libor_terms, _p0_discrete


class SnowballDP(NamedTuple):
    price: float               # fp64 DP value of the snowball note
    linear_price: float        # unclipped linear snowball (closed form)
    mean_final_coupon: float   # E[c_{n-1}] under the real measure (DP)
    c_grid: tuple              # the coupon grid used


def snowball_linear_closed_form(cfg: HWConfig, market: MarketCurve, *,
                                initial: float, spread: float,
                                start: float | None = None,
                                tenor: float = 4.0, freq: float = 1.0,
                                libor_tenor: float | None = None,
                                sigma: float | None = None):
    """float64 UNCLIPPED snowball value in CLOSED FORM under the model's
    discrete trapezoid law: with c_j = c_0 + j spread - sum_{i<=j} L_i,

      V = sum_j tau [ (c_0 + j spread) E[e^{-I_{j+1}}]
                      - sum_{i<=j} E[e^{-I_{j+1}} L(r_{T_i})] ]
          + E[e^{-I_n}],

    and each E[e^{-I_p} L(r_t)] = w0 (e^{-lnA + B mu~ + B^2 s^2/2} - 1)
    / delta a tilted lognormal moment (mu~ = r_det(t) - Cov(r_t, I_p),
    the same tilting as the range-accrual closed form).  Returns
    (value, per-period coupon values)."""
    from .bermudan import _det_states, _step_index
    from .ops.engine_linear import _shock_shapes
    from .models.hull_white import step_tables

    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    obs = tuple(start + j * tau for j in range(n))
    pays = tuple(start + (j + 1) * tau for j in range(n))
    dates = tuple(sorted(set(obs) | set(pays)))
    idx = {t: q for q, t in enumerate(dates)}
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    r_det, i_det = (np.asarray(a, np.float64)
                    for a in _det_states(cfg, tables, dates))
    sig = float(tables.sig_st)

    def tilted_L(t: float, T_p: float):
        """E[e^{-I(T_p)} L(r_t)] / E[e^{-I(T_p)}] (fp64)."""
        npay = _step_index(cfg, T_p)
        _, wp = (np.asarray(a, np.float64)
                 for a in _shock_shapes(cfg, npay))
        ni = _step_index(cfg, t)
        u, _ = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, ni))
        s_r = sig * math.sqrt(float(u @ u))
        mu = r_det[idx[t]] - sig * sig * float(u @ wp[:ni])
        lnA, B = (float(np.asarray(v, np.float64))
                  for v in _libor_terms(cfg, jnp.float32(sigma), market,
                                        t, delta))
        return (math.exp(-lnA + B * mu + 0.5 * B * B * s_r * s_r)
                - 1.0) / delta

    total, per = 0.0, []
    for j in range(n):
        T_p = pays[j]
        npay = _step_index(cfg, T_p)
        _, wp = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, npay))
        w0 = math.exp(-i_det[idx[T_p]]
                      + 0.5 * sig * sig * float(wp @ wp))
        c_mean = initial + j * spread - sum(tilted_L(obs[i], T_p)
                                            for i in range(1, j + 1))
        v = tau * w0 * c_mean
        per.append(v)
        total += v
    total += _p0_discrete(cfg, sigma, start + n * tau)
    return total, per


def _snowball_dp(cfg: HWConfig, market: MarketCurve, *, initial: float,
                 spread: float, cap: float, floor: float, start: float,
                 n: int, tau: float, delta: float, sigma: float,
                 n_grid: int, n_cgrid: int, width: float,
                 callable_: bool = False):
    """Shared fp64 (r-grid x c-grid) value iteration for the snowball
    family.  With ``callable_`` the ISSUER may call at par at every
    interior period boundary T_1..T_{n-1} (decision state: r(T_j) and
    the coupon c_{j-1} just paid): the value gets min(1, .) per c-level
    and the call boundary CURVE r*(c_l) is read off by linear crossing
    (call when r < r*; the snowball is worth most when rates are low,
    so the issuer calls there).  Never/always-call levels are clamped
    one grid-span outside the r-band so the MC's linear c-interpolation
    of the boundary stays finite.  Returns (price, mean_final_coupon,
    boundaries, cs) with boundaries = () unless ``callable_``."""
    from .bermudan import _det_states
    from .models.hull_white import step_tables

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), 1)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    terms = {t: tuple(float(np.asarray(v, np.float64))
                      for v in _libor_terms(cfg, jnp.float32(sigma),
                                            market, t, delta))
             for o in obs for t in o}
    cs = np.linspace(floor, cap, n_cgrid)

    def grid(t):
        s = sig * math.sqrt(float(U[t] @ U[t]))
        return np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                           n_grid)

    def c_interp(M, c_new):
        """Blend columns of M (n_r, n_c) linearly in c at c_new (n_r,)."""
        k = np.clip(np.searchsorted(cs, c_new) - 1, 0, n_cgrid - 2)
        dc = cs[k + 1] - cs[k]
        # floor == cap collapses the grid to one point: lam is irrelevant
        lam = np.clip((c_new - cs[k]) / np.where(dc > 0, dc, 1.0), 0.0, 1.0)
        rows = np.arange(len(c_new))
        return (1.0 - lam) * M[rows, k] + lam * M[rows, k + 1]

    # value W (n_r, n_c) at T_j BEFORE the coupon update; terminal = par.
    # E-coupon iteration: Cm (n_r, n_c) = E[c_{n-1} | state], untilted.
    xs_next = grid(bounds[n])
    W_next = np.ones((len(xs_next), n_cgrid))
    C_next = np.tile(cs, (len(xs_next), 1))
    bnds = []
    for j in range(n - 1, -1, -1):
        Tj, Tp = bounds[j], bounds[j + 1]
        xs = grid(Tj)
        uj, dj = U[Tj], W[Tp] - W[Tj]
        vjj = float(uj @ uj)
        e = (xs - r_det[Tj]) / vjj
        b_I = float(dj @ uj)
        v_I = sig * sig * (float(dj @ dj) - b_I * b_I / vjj)
        m_I = (i_det[Tp] - i_det[Tj]) + b_I * e
        w0 = np.exp(-m_I + 0.5 * v_I)
        up = U[Tp]
        b_p = float(up @ uj)
        v_p = sig * sig * (float(up @ up) - b_p * b_p / vjj)
        c_pI = sig * sig * (float(up @ dj) - b_p * b_I / vjj)
        mu_p = r_det[Tp] + b_p * e - c_pI          # tilted (value)
        mu_p_real = r_det[Tp] + b_p * e            # untilted (E-coupon)
        s_p = math.sqrt(max(v_p, 0.0))
        # kernel continuation for all c-levels in one batched call (the
        # kernel is linear in the values: one dPhi assembly serves all)
        K = _kernel_avg(mu_p, s_p, xs_next, W_next,
                        order="cubic")                    # (n_r, n_c)
        Kc = _kernel_avg(mu_p_real, s_p, xs_next, C_next,
                         order="cubic")
        lnA, B = terms[Tj]
        L = (np.exp(B * xs - lnA) - 1.0) / delta
        W_new = np.empty((len(xs), n_cgrid))
        C_new = np.empty((len(xs), n_cgrid))
        for l, c_prev in enumerate(cs):
            c_new = (np.full(len(xs), initial) if j == 0
                     else np.clip(c_prev + spread - L, floor, cap))
            W_new[:, l] = w0 * (tau * c_new + c_interp(K, c_new))
            C_new[:, l] = c_interp(Kc, c_new) if j < n - 1 else c_new
        if callable_ and 1 <= j:
            # issuer calls at par after the T_j coupon: the value is
            # decreasing in r per c-level (the coupon melts and the
            # discounting deepens as rates rise), so min(1, W) flips on
            # at most one crossing r*(c_l) per column.
            span = xs[-1] - xs[0]
            row = []
            for l in range(n_cgrid):
                col = W_new[:, l]
                if col[0] > 1.0 > col[-1]:
                    rb = float(np.interp(-1.0, -col, xs))
                elif col[0] <= 1.0:
                    rb = xs[0] - span          # never call at this level
                else:
                    rb = xs[-1] + span         # always call
                row.append(rb)
            bnds.append(tuple(row))
            W_new = np.minimum(1.0, W_new)
        W_next, C_next, xs_next = W_new, C_new, xs
    T0 = bounds[0]
    u0, w0v = U[T0], W[T0]
    v00 = sig * sig * float(u0 @ u0)
    vI0 = sig * sig * float(w0v @ w0v)
    c0v = sig * sig * float(u0 @ w0v)
    disc0 = math.exp(-i_det[T0] + 0.5 * vI0)
    price = disc0 * float(_kernel_avg(r_det[T0] - c0v, math.sqrt(v00),
                                      xs_next, W_next[:, 0],
                                      order="cubic")[0])
    mean_c = float(_kernel_avg(r_det[T0], math.sqrt(v00), xs_next,
                               C_next[:, 0], order="cubic")[0])
    return price, mean_c, tuple(reversed(bnds)), tuple(cs)


def dp_oracle_snowball(cfg: HWConfig, market: MarketCurve, *,
                       initial: float, spread: float, cap: float,
                       floor: float = 0.0, start: float | None = None,
                       tenor: float = 4.0, freq: float = 1.0,
                       libor_tenor: float | None = None,
                       sigma: float | None = None, n_grid: int = 801,
                       n_cgrid: int = 81, width: float = 8.0) -> SnowballDP:
    """fp64 value iteration for the snowball note over (r-grid, c-grid).
    The c-grid spans [floor, cap] (the clip makes the reachable coupon
    set exactly that interval); the r-conditioning and exact cell-kernel
    continuation are the ``dp_oracle_range_note`` machinery, applied
    once per c-level and blended linearly at the deterministic coupon
    update.  Also iterates E[c_{n-1}] under the untilted measure as a
    cross-check observable for the MC."""
    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    price, mean_c, _, cs = _snowball_dp(
        cfg, market, initial=initial, spread=spread, cap=cap, floor=floor,
        start=float(start), n=n, tau=tau, delta=float(libor_tenor),
        sigma=float(sigma), n_grid=n_grid, n_cgrid=n_cgrid, width=width)
    lin, _ = snowball_linear_closed_form(
        cfg, market, initial=initial, spread=spread, start=start,
        tenor=tenor, freq=freq, libor_tenor=libor_tenor, sigma=sigma)
    return SnowballDP(price=price, linear_price=lin,
                      mean_final_coupon=mean_c, c_grid=cs)


class CallableSnowballDP(NamedTuple):
    price: float               # fp64 DP value of the callable snowball
    plain_price: float         # call-disabled (clipped) snowball DP value
    boundaries: tuple          # (n-1, n_cgrid) r*(c_l) at T_1..T_{n-1}
    call_premium: float        # plain_price - price  (>= 0)
    c_grid: tuple              # the coupon grid the curves are indexed by


def dp_oracle_callable_snowball(cfg: HWConfig, market: MarketCurve, *,
                                initial: float, spread: float, cap: float,
                                floor: float = 0.0,
                                start: float | None = None,
                                tenor: float = 4.0, freq: float = 1.0,
                                libor_tenor: float | None = None,
                                sigma: float | None = None,
                                n_grid: int = 801, n_cgrid: int = 81,
                                width: float = 8.0) -> CallableSnowballDP:
    """fp64 value iteration for the ISSUER-CALLABLE snowball note: the
    snowball (r, c) DP with W_j = min(1, W_j) per c-level at every
    interior period boundary (the issuer minimizes, calling at par after
    the T_j coupon), and the per-date call boundary CURVE r*(c) read off
    the crossing — the two-state analogue of the capped floater's scalar
    threshold (``floater.dp_oracle_capped_floater``).  The min kinks the
    value in c, so the linear c-blend carries the same O(h^2) class of
    grid bias as the clip already does.  Combines the reference's single
    European product layer (src/2_option_pricing.cu:14-35) with a
    path-dependent state AND an exercise right."""
    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=float(start), n=n, tau=tau, delta=float(libor_tenor),
              sigma=float(sigma), n_grid=n_grid, n_cgrid=n_cgrid,
              width=width)
    price, _, bnds, cs = _snowball_dp(cfg, market, callable_=True, **kw)
    plain, _, _, _ = _snowball_dp(cfg, market, callable_=False, **kw)
    return CallableSnowballDP(price=price, plain_price=plain,
                              boundaries=bnds, call_premium=plain - price,
                              c_grid=cs)


class SnowballResult(NamedTuple):
    price: jax.Array           # CV estimate
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    mean_final_coupon: jax.Array
    n_paths: int


@lru_cache(maxsize=None)
def _snowball_fn(cfg: HWConfig, initial: float, spread: float, cap: float,
                 floor: float, start: float, n: int, tau: float,
                 delta: float, linear_mean: float, n_paths: int,
                 n_blocks: int, rqmc: bool, mesh):
    from .bermudan import _functional_chol, _functional_det

    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    specs = tuple([("r", o[0]) for o in obs]
                  + [("I", t) for t in bounds[1:]])
    LT = jnp.asarray(_functional_chol(cfg, specs))

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det = det[:n]
        i_det = det[n:]
        lnA, B = (jnp.stack(v) for v in zip(
            *[_libor_terms(cfg, sigma, market, o[0], delta) for o in obs]))

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]
                integral = i_det[None, :] + sgn * z[:, n:]
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                discs = jnp.exp(-integral)
                c = jnp.full(ro.shape[0], initial, jnp.float32)
                cl = jnp.full(ro.shape[0], initial, jnp.float32)
                V = tau * c * discs[:, 0]
                Y = V                          # CV: unclipped recursion
                for j in range(1, n):
                    c = jnp.clip(c + spread - L[:, j], floor, cap)
                    cl = cl + spread - L[:, j]
                    V = V + tau * c * discs[:, j]
                    Y = Y + tau * cl * discs[:, j]
                fin = discs[:, n - 1]
                return V + fin, Y + fin, c

            Vp, Yp, Cp = leg(1.0)
            Vm, Ym, Cm = leg(-1.0)
            V, Y, C = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Cp + Cm)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y), jnp.sum(C)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - linear_mean)
        if rqmc:
            # the digital shifts are the independent replicates
            cv_b = (per_block[:, 0] - beta * per_block[:, 2]) / n_paths
            se = jnp.std(cv_b, ddof=1) / jnp.sqrt(1.0 * n_blocks)
            raw_se = jnp.std(per_block[:, 0] / n_paths, ddof=1) \
                / jnp.sqrt(1.0 * n_blocks)
        else:
            var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
            bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            se = jnp.sqrt(bessel * var_cv / n_tot)
            raw_se = jnp.sqrt(bessel * var_v / n_tot)
        return price, se, mv, raw_se, beta, s[5] / n_tot

    return jax.jit(compute)


def price_snowball(cfg: HWConfig, key, market: MarketCurve, *,
                   initial: float, spread: float, cap: float,
                   floor: float = 0.0, start: float | None = None,
                   tenor: float = 4.0, freq: float = 1.0,
                   libor_tenor: float | None = None, sigma=None,
                   n_paths: int | None = None, n_blocks: int = 1,
                   rqmc: bool = False, mesh=None) -> SnowballResult:
    """Monte Carlo snowball note from exactly-sampled multi-date (r, I)
    states (antithetic), with the UNCLIPPED linear snowball as control
    variate (exact closed-form mean: ``snowball_linear_closed_form``).
    Unbiased — no policy is involved; the fp64 2-d DP
    ``dp_oracle_snowball`` pins the price.  Blocks key on their global
    index; optionally sharded over ``mesh``."""
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    linear_mean, _ = snowball_linear_closed_form(
        cfg, market, initial=initial, spread=spread, start=start,
        tenor=tenor, freq=freq, libor_tenor=libor_tenor,
        sigma=float(sigma))
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _snowball_fn(cfg, float(initial), float(spread), float(cap),
                       float(floor), float(start), n, float(tau),
                       float(libor_tenor), float(linear_mean),
                       int(n_paths), int(n_blocks), bool(rqmc), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return SnowballResult(price=out[0], std_error=out[1], raw_price=out[2],
                          raw_std_error=out[3], beta=out[4],
                          mean_final_coupon=out[5],
                          n_paths=int(n_paths) * int(n_blocks))


class SnowballVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_snowball(cfg: HWConfig, key, market: MarketCurve, *,
                  initial: float, spread: float, cap: float,
                  floor: float = 0.0, start: float | None = None,
                  tenor: float = 4.0, freq: float = 1.0,
                  libor_tenor: float | None = None, eps: float = 1e-3,
                  n_paths: int | None = None, n_blocks: int = 1,
                  mesh=None) -> SnowballVega:
    """CRN central-difference vega (key reuse; the CV's exact mean is
    recomputed per bump).  Oracle: the central difference of the fp64
    2-d DP value.  No policy freezing is needed — the snowball has no
    exercise right."""
    if start is None:
        start = cfg.s1
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=start, tenor=tenor, freq=freq,
              libor_tenor=libor_tenor)
    dp_m = dp_oracle_snowball(cfg, market, sigma=cfg.sigma - eps, **kw)
    dp_p = dp_oracle_snowball(cfg, market, sigma=cfg.sigma + eps, **kw)
    mc = dict(kw, n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    p_m = price_snowball(cfg, key, market, sigma=cfg.sigma - eps,
                         **mc).price
    p_p = price_snowball(cfg, key, market, sigma=cfg.sigma + eps,
                         **mc).price
    return SnowballVega(vega=(p_p - p_m) / (2.0 * eps),
                        dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                        price_minus=p_m, price_plus=p_p, epsilon=eps)


class CallableSnowballResult(NamedTuple):
    price: jax.Array           # CV upper-bound estimate (issuer policy)
    std_error: jax.Array
    raw_price: jax.Array       # plain policy MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    call_fraction: jax.Array   # fraction of paths called early
    n_paths: int


@lru_cache(maxsize=None)
def _callable_snowball_fn(cfg: HWConfig, initial: float, spread: float,
                          cap: float, floor: float, start: float, n: int,
                          tau: float, delta: float, boundaries: tuple,
                          cs: tuple, plain_mean: float, z_mean: float,
                          n_paths: int, n_blocks: int, mesh):
    from .bermudan import _functional_chol, _functional_det

    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    specs = tuple([("r", o[0]) for o in obs]
                  + [("I", t) for t in bounds[1:]])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    BND = jnp.asarray(boundaries, jnp.float32)        # (n-1, n_cgrid)
    CS = jnp.asarray(cs, jnp.float32)

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det = det[:n]
        i_det = det[n:]
        lnA, B = (jnp.stack(v) for v in zip(
            *[_libor_terms(cfg, sigma, market, o[0], delta) for o in obs]))

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, 2 * n), jnp.float32)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]
                integral = i_det[None, :] + sgn * z[:, n:]
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                discs = jnp.exp(-integral)
                c = jnp.full(ro.shape[0], initial, jnp.float32)
                alive = jnp.ones(ro.shape[0], jnp.float32)
                V = tau * c * discs[:, 0]
                Y = V                      # CV: the non-callable note
                for j in range(1, n):
                    # issuer decision at T_j: state (r(T_j), c_{j-1});
                    # boundary curve linearly interpolated in the coupon
                    rb = uinterp(CS, BND[j - 1], c)
                    call_now = alive * (ro[:, j] < rb).astype(jnp.float32)
                    V = V + call_now * discs[:, j - 1]   # par at T_j
                    alive = alive - call_now
                    c = jnp.clip(c + spread - L[:, j], floor, cap)
                    V = V + alive * tau * c * discs[:, j]
                    Y = Y + tau * c * discs[:, j]
                V = V + alive * discs[:, n - 1]
                Y = Y + discs[:, n - 1]
                # second CV: the deterministic-policy "call at T_1" leg
                # (coupon c_0 + par at T_1) — correlates with V on the
                # early-called mass the plain note cannot explain
                Z = (1.0 + tau * initial) * discs[:, 0]
                return V, Y, Z, 1.0 - alive

            Vp, Yp, Zp, Fp = leg(1.0)
            Vm, Ym, Zm, Fm = leg(-1.0)
            V, Y = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym)
            Z, F = 0.5 * (Zp + Zm), 0.5 * (Fp + Fm)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(Z), jnp.sum(Z * Z),
                              jnp.sum(V * Y), jnp.sum(V * Z),
                              jnp.sum(Y * Z), jnp.sum(F)])

        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my, mz = s[0] / n_tot, s[2] / n_tot, s[4] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        var_z = jnp.maximum(s[5] / n_tot - mz * mz, 1e-30)
        c_vy = s[6] / n_tot - mv * my
        c_vz = s[7] / n_tot - mv * mz
        c_yz = s[8] / n_tot - my * mz
        # 2x2 CV solve: beta = Cov(Y,Z)^-1 cov(V, (Y,Z))
        det = jnp.maximum(var_y * var_z - c_yz * c_yz, 1e-30)
        b_y = (var_z * c_vy - c_yz * c_vz) / det
        b_z = (var_y * c_vz - c_yz * c_vy) / det
        price = mv - b_y * (my - plain_mean) - b_z * (mz - z_mean)
        var_cv = jnp.maximum(var_v - b_y * c_vy - b_z * c_vz, 0.0)
        bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (price, jnp.sqrt(bessel * var_cv / n_tot), mv,
                jnp.sqrt(bessel * var_v / n_tot), b_y, s[9] / n_tot)

    return jax.jit(compute)


def price_callable_snowball(cfg: HWConfig, key, market: MarketCurve, *,
                            initial: float, spread: float, cap: float,
                            floor: float = 0.0, start: float | None = None,
                            tenor: float = 4.0, freq: float = 1.0,
                            libor_tenor: float | None = None, sigma=None,
                            boundaries: tuple | None = None,
                            c_grid: tuple | None = None,
                            plain_mean: float | None = None,
                            n_paths: int | None = None, n_blocks: int = 1,
                            mesh=None,
                            dp_kwargs: dict | None = None
                            ) -> CallableSnowballResult:
    """Monte Carlo upper bound for the issuer-callable snowball under
    the fixed boundary-CURVE policy r*(c) per call date (default: read
    off the fp64 2-d DP; any fixed issuer policy is an unbiased upper
    bound on the issuer-optimal value).  The issuer calls at T_j when
    r(T_j) < r*_j(c_{j-1}), the boundary linearly interpolated in the
    running coupon.  The NON-CALLABLE snowball on the same paths is the
    control variate, anchored at its own DP mean (the chooser's full-cap
    CV pattern).  Blocks key on their global index; optionally sharded
    over ``mesh``."""
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    if boundaries is None or c_grid is None or plain_mean is None:
        dp = dp_oracle_callable_snowball(
            cfg, market, initial=initial, spread=spread, cap=cap,
            floor=floor, start=start, tenor=tenor, freq=freq,
            libor_tenor=libor_tenor, sigma=float(sigma),
            **(dp_kwargs or {}))
        if boundaries is None or c_grid is None:
            boundaries, c_grid = dp.boundaries, dp.c_grid
        if plain_mean is None:
            plain_mean = dp.plain_price
    z_mean = (1.0 + tau * initial) * _p0_discrete(cfg, float(sigma),
                                                  float(start) + tau)
    out = _callable_snowball_fn(
        cfg, float(initial), float(spread), float(cap), float(floor),
        float(start), n, float(tau), float(libor_tenor),
        tuple(tuple(float(v) for v in row) for row in boundaries),
        tuple(float(v) for v in c_grid), float(plain_mean),
        float(z_mean), int(n_paths), int(n_blocks), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return CallableSnowballResult(
        price=out[0], std_error=out[1], raw_price=out[2],
        raw_std_error=out[3], beta=out[4], call_fraction=out[5],
        n_paths=int(n_paths) * int(n_blocks))


class CallableSnowballVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_callable_snowball(cfg: HWConfig, key, market: MarketCurve, *,
                           initial: float, spread: float, cap: float,
                           floor: float = 0.0, start: float | None = None,
                           tenor: float = 4.0, freq: float = 1.0,
                           libor_tenor: float | None = None,
                           eps: float = 1e-3, n_paths: int | None = None,
                           n_blocks: int = 1, mesh=None,
                           dp_kwargs: dict | None = None
                           ) -> CallableSnowballVega:
    """CRN central-difference vega with the call boundary CURVES frozen
    at the base-sigma DP policy (envelope theorem at the issuer-optimal
    boundary).  Oracle: the central difference of the fp64 DP value,
    which re-optimizes per bump — agreement also checks the envelope
    argument numerically.  The CV's DP mean is recomputed per bump so
    each side stays anchored at its own sigma."""
    if start is None:
        start = cfg.s1
    dpk = dp_kwargs or {}
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=start, tenor=tenor, freq=freq,
              libor_tenor=libor_tenor)
    base = dp_oracle_callable_snowball(cfg, market, sigma=cfg.sigma,
                                       **kw, **dpk)
    dp_m = dp_oracle_callable_snowball(cfg, market, sigma=cfg.sigma - eps,
                                       **kw, **dpk)
    dp_p = dp_oracle_callable_snowball(cfg, market, sigma=cfg.sigma + eps,
                                       **kw, **dpk)
    mc = dict(kw, boundaries=base.boundaries, c_grid=base.c_grid,
              n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    p_m = price_callable_snowball(cfg, key, market, sigma=cfg.sigma - eps,
                                  plain_mean=dp_m.plain_price, **mc).price
    p_p = price_callable_snowball(cfg, key, market, sigma=cfg.sigma + eps,
                                  plain_mean=dp_p.plain_price, **mc).price
    return CallableSnowballVega(
        vega=(p_p - p_m) / (2.0 * eps),
        dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
        price_minus=p_m, price_plus=p_p, epsilon=eps)
