"""Callable capped floater (beyond-reference exotic).

A floating-rate note paying per period the clipped coupon

    c_j = clip(L(T_j; delta) + spread, floor, cap) * tau   at T_{j+1},

redeeming 1 at T_n, and CALLABLE by the ISSUER at par at every interior
period boundary T_1..T_{n-1} (calling at T_k pays the period-(k-1)
coupon plus 1 at T_k and cancels the rest).  This widens the reference's
single European option (the product layer, src/2_option_pricing.cu:14-35)
to a kinked-coupon Bermudan on the note machinery of ``range_note``.

Why this product shape: an UNCAPPED spread floater sits above par
whenever spread > 0, so the issuer always calls at T_1 and the product
degenerates; the cap pushes the note below par in high-rate states (the
coupon is capped while discounting is not), making the call boundary a
genuine interior threshold r*_j — the issuer calls when r(T_j) < r*_j
(low rates: the spread is expensive to keep paying).

Under one-factor Hull-White the coupon is a DETERMINISTIC kinked
function of the decision state r(T_j) (L is increasing in r), so

* the plain (non-callable) leg is CLOSED FORM: each period is a tilted
  Gaussian expectation of clip(L(r)+spread, floor, cap), i.e. Phi terms
  for the binding branches plus a lognormal partial moment
  E[e^{Br} 1{a<r<b}] = e^{B mu + B^2 s^2/2}(Phi(.-Bs) - Phi(.-Bs)) for
  the floating branch (``capped_floater_closed_form``);
* the fp64 oracle is a 1-d value iteration with the coupon evaluated
  pointwise on the r-grid (kink nodes inserted at the floor/cap edges)
  and the continuation integrated by the exact piecewise-linear x
  Gaussian cell kernel (``range_note._kernel_avg``);
* the MC estimator applies the FIXED issuer threshold policy (call when
  r < r*_j) to exactly-sampled multi-date (r, I) states: any fixed
  policy yields an unbiased UPPER bound on the note value (the issuer
  is the minimizer); with the DP threshold it reproduces the DP value
  to MC noise.  The non-callable note is the control variate with its
  exact closed-form mean.

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
from .parallel import mesh as pmesh
from .range_note import _kernel_avg, _note_dates, _note_shapes, _r_band, \
    _nphi


def _libor_terms(cfg: HWConfig, sigma, market, t: float, delta: float):
    """(lnA, B) so that L(t, t+delta; r) = (e^{B r - lnA} - 1)/delta."""
    A = hw.a_hw(cfg, sigma, market, t, jnp.float32(t + delta))
    B = hw.b_func(t, t + delta, cfg.a)
    return jnp.log(A), B


def _coupon_rate_np(r, lnA: float, B: float, delta: float, spread: float,
                    floor: float, cap: float):
    """clip(L(r) + spread, floor, cap) on a float64 grid."""
    L = (np.exp(B * np.asarray(r, np.float64) - lnA) - 1.0) / delta
    return np.clip(L + spread, floor, cap)


class FloaterDP(NamedTuple):
    price: float               # fp64 DP value of the callable note
    plain_price: float         # non-callable note (coupons + redemption)
    boundaries: tuple          # r*_j at T_1..T_{n-1} (call when r < r*)
    call_premium: float        # plain_price - price  (>= 0)
    profile_x: tuple = ()      # r-grid at the first call date T_1
    profile_cont: tuple = ()   # continuation C_1(r) there (vs par = 1)


def capped_floater_closed_form(cfg: HWConfig, market: MarketCurve, *,
                               cap: float, floor: float = 0.0,
                               spread: float = 0.0,
                               start: float | None = None,
                               tenor: float = 4.0, freq: float = 1.0,
                               libor_tenor: float | None = None,
                               sigma: float | None = None):
    """float64 non-callable capped-floater LEG in CLOSED FORM under the
    model's discrete trapezoid law.  Per period (obs t = T_j, pay T_p):

      tau E[e^{-I(T_p)} clip(L(r_t) + spread, floor, cap)]
        = tau w0 [ floor Phi(zf) + cap (1 - Phi(zc)) + spread dPhi
                   + (1/delta)(e^{-lnA + B mu~ + B^2 s^2/2}
                               (Phi(zc - Bs) - Phi(zf - Bs)) - dPhi) ]

    with mu~ the exponentially tilted mean (same tilting as
    range_accrual_closed_form), zf/zc the standardized floor/cap kink
    locations r(floor - spread), r(cap - spread), and
    dPhi = Phi(zc) - Phi(zf).  Returns (leg value, per-period list);
    note value = leg + discrete-law P(0, T_n)."""
    from .bermudan import _det_states, _step_index
    from .models.hull_white import step_tables
    from .ops.engine_linear import _shock_shapes

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
    total, per = 0.0, []
    for j in range(n):
        t, T_p = obs[j], pays[j]
        npay = _step_index(cfg, T_p)
        _, wp = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, npay))
        var_I = sig * sig * float(wp @ wp)
        w0 = math.exp(-i_det[idx[T_p]] + 0.5 * var_I)
        ni = _step_index(cfg, t)
        u, _ = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, ni))
        s_r = sig * math.sqrt(float(u @ u))
        mu = r_det[idx[t]] - sig * sig * float(u @ wp[:ni])
        r_f, r_c = _r_band(cfg, sigma, market, t, delta,
                           floor - spread, cap - spread)
        lnA, B = (float(np.asarray(v, np.float64))
                  for v in _libor_terms(cfg, jnp.float32(sigma), market,
                                        t, delta))
        zf, zc = (r_f - mu) / s_r, (r_c - mu) / s_r
        Pf, Pc = float(_nphi(zf)), float(_nphi(zc))
        dPhi = Pc - Pf
        emom = math.exp(-lnA + B * mu + 0.5 * B * B * s_r * s_r) \
            * float(_nphi(zc - B * s_r) - _nphi(zf - B * s_r))
        v = tau * w0 * (floor * Pf + cap * (1.0 - Pc) + spread * dPhi
                        + (emom - dPhi) / delta)
        per.append(v)
        total += v
    return total, per


def dp_oracle_capped_floater(cfg: HWConfig, market: MarketCurve, *,
                             cap: float, floor: float = 0.0,
                             spread: float = 0.0,
                             start: float | None = None,
                             tenor: float = 4.0, freq: float = 1.0,
                             libor_tenor: float | None = None,
                             sigma: float | None = None, n_grid: int = 801,
                             width: float = 8.0) -> FloaterDP:
    """fp64 value iteration for the issuer-callable capped floater on a
    1-d r-grid (same Gaussian-projection conditioning and exact
    piecewise-linear cell-kernel continuation as
    ``range_note.dp_oracle_range_note``; the coupon is deterministic at
    the decision state so no inner conditional quadrature is needed).
    The call makes W_j = min(1, cont): the ISSUER minimizes.  Returns
    the DP price, the call-disabled plain price (an internal consistency
    anchor for ``capped_floater_closed_form``), and the call boundary
    r*_j per call date (call when r < r*)."""
    from .bermudan import _det_states
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

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), 1)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    kinks = {t: _r_band(cfg, sigma, market, t, delta, floor - spread,
                        cap - spread) for o in obs for t in o}
    terms = {t: tuple(float(np.asarray(v, np.float64))
                      for v in _libor_terms(cfg, jnp.float32(sigma),
                                            market, t, delta))
             for o in obs for t in o}

    def grid(t):
        """r-grid at date t with the coupon's floor/cap kink nodes
        inserted as +-eps DOUBLE nodes (round 4): the value is
        continuous there, and the zero-width cell marks a slope-segment
        break so the cubic cell kernel keeps its Hermite slopes
        one-sided at the crease (docs/MATH.md §38)."""
        s = sig * math.sqrt(float(U[t] @ U[t]))
        xs = np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                         n_grid)
        if t in kinks:
            extra = [v + e for v in kinks[t] for e in (-1e-9, 1e-9)
                     if xs[0] < v < xs[-1] and math.isfinite(v)]
            if extra:
                xs = np.unique(np.concatenate([xs, np.asarray(extra)]))
        return xs

    profile = []

    def backward(callable_: bool):
        xs_next = grid(bounds[n])
        W_next = np.ones(len(xs_next))    # value at T_n = redemption
        boundaries = []
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
            lnA, B = terms[Tj]
            cpn = tau * _coupon_rate_np(xs, lnA, B, delta, spread,
                                        floor, cap)
            up = U[Tp]
            b_p = float(up @ uj)
            v_p = sig * sig * (float(up @ up) - b_p * b_p / vjj)
            c_pI = sig * sig * (float(up @ dj) - b_p * b_I / vjj)
            mu_p = r_det[Tp] + b_p * e - c_pI
            s_p = math.sqrt(max(v_p, 0.0))
            cont = w0 * (cpn + _kernel_avg(mu_p, s_p, xs_next, W_next,
                                           order="cubic"))

            if callable_ and j == 1:
                profile.append((tuple(float(v) for v in xs),
                                tuple(float(v) for v in cont)))
            if callable_ and 1 <= j:
                # issuer calls at par: W_j = min(1, cont).  cont is
                # decreasing in r (capped coupon, full discounting), so
                # it crosses 1 at most once: call when r < r*.
                if cont[0] > 1.0 > cont[-1]:
                    rb = float(np.interp(-1.0, -cont, xs))
                elif cont[0] <= 1.0:
                    rb = -math.inf                 # never call
                else:
                    rb = math.inf                  # always call
                boundaries.append(rb)
                W_next = np.minimum(1.0, cont)
            else:
                W_next = cont
            xs_next = xs
        T0 = bounds[0]
        u0, w0v = U[T0], W[T0]
        v00 = sig * sig * float(u0 @ u0)
        vI0 = sig * sig * float(w0v @ w0v)
        c0 = sig * sig * float(u0 @ w0v)
        disc0 = math.exp(-i_det[T0] + 0.5 * vI0)
        mu0 = r_det[T0] - c0
        val = disc0 * float(_kernel_avg(mu0, math.sqrt(v00), xs_next,
                                        W_next, order="cubic")[0])
        return val, tuple(reversed(boundaries))

    price, boundaries = backward(True)
    plain, _ = backward(False)
    px, pc = profile[0] if profile else ((), ())
    return FloaterDP(price=price, plain_price=plain, boundaries=boundaries,
                     call_premium=plain - price, profile_x=px,
                     profile_cont=pc)


class FloaterResult(NamedTuple):
    price: jax.Array           # CV upper-bound estimate (issuer policy)
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    call_fraction: jax.Array   # fraction of paths called early
    n_paths: int


@lru_cache(maxsize=None)
def _floater_fn(cfg: HWConfig, cap: float, floor: float, spread: float,
                start: float, n: int, tau: float, delta: float,
                boundaries: tuple, plain_mean: float, n_paths: int,
                n_blocks: int, mesh):
    from .bermudan import _functional_chol, _functional_det

    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    # sample exactly the functionals the payoff touches: r at the n
    # period starts (call dates T_1..T_{n-1} are observations 1..n-1),
    # then I at T_1..T_n (call cash, coupons and redemption)
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
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, 2 * n), jnp.float32)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]        # (paths, n)
                integral = i_det[None, :] + sgn * z[:, n:]  # (paths, n)
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                crate = jnp.clip(L + spread, floor, cap)
                discs = jnp.exp(-integral)
                cpn = [tau * crate[:, j] * discs[:, j] for j in range(n)]
                alive = jnp.ones(ro.shape[0], jnp.float32)
                V = cpn[0]                  # period-0 coupon always accrues
                Y = cpn[0]                  # CV: non-callable note
                for j in range(1, n):
                    call = (ro[:, j] < boundaries[j - 1]).astype(
                        jnp.float32)
                    V = V + alive * call * discs[:, j - 1]
                    alive = alive * (1.0 - call)
                    V = V + alive * cpn[j]
                    Y = Y + cpn[j]
                fin = discs[:, n - 1]
                V = V + alive * fin
                Y = Y + fin
                return V, Y, 1.0 - alive

            Vp, Yp, Pp = leg(1.0)
            Vm, Ym, Pm = leg(-1.0)
            V, Y, P = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Pp + Pm)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y), jnp.sum(P)])

        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - plain_mean)
        var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
        bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (price, jnp.sqrt(bessel * var_cv / n_tot), mv,
                jnp.sqrt(bessel * var_v / n_tot), beta, s[5] / n_tot)

    return jax.jit(compute)


def _p0_discrete(cfg: HWConfig, sigma, T: float) -> float:
    """Discrete-law P(0, T) = E[e^{-I(T)}] from the model tables."""
    from .bermudan import _det_states, _step_index
    from .models.hull_white import step_tables
    from .ops.engine_linear import _shock_shapes

    tables = step_tables(cfg, float(sigma), cfg.sigma, jnp.float32)
    _, i_det = _det_states(cfg, tables, (T,))
    _, wn = (np.asarray(a, np.float64)
             for a in _shock_shapes(cfg, _step_index(cfg, T)))
    sig = float(tables.sig_st)
    return math.exp(-float(np.asarray(i_det, np.float64)[0])
                    + 0.5 * sig * sig * float(wn @ wn))


def price_capped_floater(cfg: HWConfig, key, market: MarketCurve, *,
                         cap: float, floor: float = 0.0,
                         spread: float = 0.0, start: float | None = None,
                         tenor: float = 4.0, freq: float = 1.0,
                         libor_tenor: float | None = None, sigma=None,
                         boundaries: tuple | None = None,
                         n_paths: int | None = None, n_blocks: int = 1,
                         mesh=None) -> FloaterResult:
    """Monte Carlo upper bound for the callable capped floater under the
    fixed issuer threshold policy ``boundaries`` (default: read off the
    fp64 DP oracle; any fixed policy is an unbiased upper bound on the
    issuer-optimal value — with the DP boundary the estimate reproduces
    ``dp_oracle_capped_floater`` to MC noise).  The non-callable note is
    the control variate with its EXACT closed-form mean.  Blocks key on
    their global index; optionally sharded over ``mesh``."""
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
    if boundaries is None:
        boundaries = dp_oracle_capped_floater(
            cfg, market, cap=cap, floor=floor, spread=spread, start=start,
            tenor=tenor, freq=freq, libor_tenor=libor_tenor,
            sigma=float(sigma)).boundaries
    leg, _ = capped_floater_closed_form(
        cfg, market, cap=cap, floor=floor, spread=spread, start=start,
        tenor=tenor, freq=freq, libor_tenor=libor_tenor, sigma=float(sigma))
    plain_mean = leg + _p0_discrete(cfg, sigma, start + n * tau)
    out = _floater_fn(cfg, float(cap), float(floor), float(spread),
                      float(start), n, float(tau), float(libor_tenor),
                      tuple(float(b) for b in boundaries),
                      float(plain_mean), int(n_paths), int(n_blocks),
                      mesh)(key, jnp.asarray(sigma, jnp.float32), market)
    return FloaterResult(price=out[0], std_error=out[1], raw_price=out[2],
                         raw_std_error=out[3], beta=out[4],
                         call_fraction=out[5],
                         n_paths=int(n_paths) * int(n_blocks))


class FloaterVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_capped_floater(cfg: HWConfig, key, market: MarketCurve, *,
                        cap: float, floor: float = 0.0,
                        spread: float = 0.0, start: float | None = None,
                        tenor: float = 4.0, freq: float = 1.0,
                        libor_tenor: float | None = None, eps: float = 1e-3,
                        n_paths: int | None = None, n_blocks: int = 1,
                        mesh=None) -> FloaterVega:
    """CRN central-difference vega with the call boundary FROZEN at the
    base-sigma DP policy (envelope theorem at the issuer-optimal
    threshold: the policy derivative contributes zero first order).
    Oracle: the central difference of the fp64 DP value, which
    re-optimizes the boundary at each bump — agreement also checks the
    envelope argument numerically.  CRN by key reuse; the CV's exact
    mean is recomputed per bump so each side stays unbiased."""
    if start is None:
        start = cfg.s1
    kw = dict(cap=cap, floor=floor, spread=spread, start=start,
              tenor=tenor, freq=freq, libor_tenor=libor_tenor)
    base = dp_oracle_capped_floater(cfg, market, sigma=cfg.sigma, **kw)
    dp_m = dp_oracle_capped_floater(cfg, market, sigma=cfg.sigma - eps,
                                    **kw)
    dp_p = dp_oracle_capped_floater(cfg, market, sigma=cfg.sigma + eps,
                                    **kw)
    mc = dict(kw, boundaries=base.boundaries, n_paths=n_paths,
              n_blocks=n_blocks, mesh=mesh)
    p_m = price_capped_floater(cfg, key, market, sigma=cfg.sigma - eps,
                               **mc).price
    p_p = price_capped_floater(cfg, key, market, sigma=cfg.sigma + eps,
                               **mc).price
    return FloaterVega(vega=(p_p - p_m) / (2.0 * eps),
                       dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                       price_minus=p_m, price_plus=p_p, epsilon=eps)
