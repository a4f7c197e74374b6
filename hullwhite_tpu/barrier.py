"""Up-and-out (knock-out) cap under Hull-White.

A cap at strike ``rate`` that DIES the first time a fixing breaches the
barrier: at each fixing T_j, if L(T_j) >= H the caplet j and every later
caplet are cancelled; otherwise caplet j pays tau (L(T_j) - rate)^+ at
T_{j+1}.  The canonical barrier structure on rates — path-dependent
through the survival indicator only, so it rides the exotic-layer
machinery unchanged: exact multi-date functional sampling
(bermudan._functional_chol) for the MC, and the 1-d r-grid value
iteration with exact piecewise-linear cell-kernel continuation
(range_note._kernel_avg) for the fp64 oracle.  Product-family extension
of the reference's single-option layer (src/2_option_pricing.cu:14-35).

The DP inserts a DOUBLE NODE at the barrier level r_H (the value
function JUMPS to zero there — the pair of nodes makes the
piecewise-linear representation exact at the cliff, the same trick the
(u, w) two-factor notes use on observation lines) and a kink node at
the strike.  A side column with the indicator disabled prices the FULL
cap through the same iteration; it must land on
``instruments.cap_closed_form`` up to the discrete-trapezoid-law vs
continuous-law gap (~1e-6 at the reference step count) and is the MC
control variate's exact mean under the SAME discrete law the sampler
integrates (computed in closed form inside the jit, as a function of
sigma, so CRN-FD vega differentiates through it).

Engine invariants kept: blocks key on the GLOBAL block index, sigma
enters only through ``tables.sig_st``, every product takes
n_blocks/mesh, antithetic pairs throughout.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import HWConfig
from .floater import _libor_terms
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .parallel import mesh as pmesh
from .range_note import _kernel_avg, _note_shapes


class KoCapDP(NamedTuple):
    price: float               # fp64 DP value of the knock-out cap
    cap_price: float           # full cap from the same iteration
    barrier_premium: float     # cap_price - price (>= 0)
    r_barriers: tuple          # r_H per fixing (knocked out when r >= r_H)
    survival: float = 0.0      # P(never knocked out) under the DP law


def _r_level(cfg: HWConfig, sigma, market, t: float, delta: float,
             level: float) -> float:
    """r such that L(t, t+delta; r) = level (L increasing in r)."""
    from .instruments import _libor_r_bounds

    _, r_hi = _libor_r_bounds(cfg, jnp.float32(sigma), market, t, delta,
                              -math.inf, level)
    return float(np.asarray(r_hi, np.float64))


def dp_oracle_ko_cap(cfg: HWConfig, market: MarketCurve, *, rate: float,
                     barrier: float, start: float | None = None,
                     tenor: float = 4.0, freq: float = 1.0,
                     libor_tenor: float | None = None,
                     sigma: float | None = None, n_grid: int = 801,
                     width: float = 8.0) -> KoCapDP:
    """fp64 value iteration for the up-and-out cap on a 1-d r-grid with
    a double node at the barrier (jump) and a single node at the strike
    (kink).  A second value column (indicator off) prices the full cap
    and a third carries the survival probability, all through one
    (G, 3)-batched cell-kernel pass per date."""
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
    if barrier <= rate:
        raise ValueError("barrier must sit above the strike rate")

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), 1)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    fixes = [o[0] for o in obs]
    r_K = {t: _r_level(cfg, sigma, market, t, delta, rate) for t in fixes}
    r_H = {t: _r_level(cfg, sigma, market, t, delta, barrier)
           for t in fixes}
    terms = {t: tuple(float(np.asarray(v, np.float64))
                      for v in _libor_terms(cfg, jnp.float32(sigma),
                                            market, t, delta))
             for t in fixes}

    def grid(t):
        s = sig * math.sqrt(float(U[t] @ U[t]))
        xs = np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                         n_grid)
        extra = []
        if xs[0] < r_K[t] < xs[-1]:
            # kink: +-eps double node (slope-segment break for the
            # round-4 cubic cell kernel; see docs/MATH.md §38)
            extra += [r_K[t] - 1e-9, r_K[t] + 1e-9]
        if xs[0] < r_H[t] < xs[-1]:
            extra += [r_H[t] - 1e-9, r_H[t]]        # jump (double node)
        if extra:
            xs = np.unique(np.concatenate([xs, np.asarray(extra)]))
        return xs

    # value columns: [0] knock-out cap, [1] full cap, [2] survival prob;
    # at T_n there is nothing left to observe: value 0, survival 1
    s_n = sig * math.sqrt(float(U[bounds[n]] @ U[bounds[n]]))
    xs_next = np.linspace(r_det[bounds[n]] - width * s_n,
                          r_det[bounds[n]] + width * s_n, n_grid)
    W_next = np.zeros((len(xs_next), 3))
    W_next[:, 2] = 1.0

    for j in range(n - 1, -1, -1):
        Tj, Tp = fixes[j], bounds[j + 1]
        xs = grid(Tj)
        uj, dj = U[Tj], W[Tp] - W[Tj]
        vjj = float(uj @ uj)
        e = (xs - r_det[Tj]) / vjj
        b_I = float(dj @ uj)
        v_I = sig * sig * (float(dj @ dj) - b_I * b_I / vjj)
        m_I = (i_det[Tp] - i_det[Tj]) + b_I * e
        w0 = np.exp(-m_I + 0.5 * v_I)
        lnA, B = terms[Tj]
        L = (np.exp(B * xs - lnA) - 1.0) / delta
        cpn = tau * np.maximum(L - rate, 0.0)
        up = U[Tp]
        b_p = float(up @ uj)
        v_p = sig * sig * (float(up @ up) - b_p * b_p / vjj)
        c_pI = sig * sig * (float(up @ dj) - b_p * b_I / vjj)
        mu_p = r_det[Tp] + b_p * e - c_pI
        s_p = math.sqrt(max(v_p, 0.0))
        cont = _kernel_avg(mu_p, s_p, xs_next, W_next[:, :2],
                           order="cubic")                     # (M, 2)
        # survival propagates under the UNtilted kernel (no discounting)
        mu_s = r_det[Tp] + b_p * e
        surv = _kernel_avg(mu_s, s_p, xs_next, W_next[:, 2],
                           order="cubic")
        V = np.empty((len(xs), 3))
        alive = xs < r_H[Tj]
        V[:, 0] = np.where(alive, w0 * (cpn + cont[:, 0]), 0.0)
        V[:, 1] = w0 * (cpn + cont[:, 1])
        V[:, 2] = np.where(alive, surv, 0.0)
        xs_next, W_next = xs, V

    T0 = fixes[0]
    u0, w0v = U[T0], W[T0]
    v00 = sig * sig * float(u0 @ u0)
    vI0 = sig * sig * float(w0v @ w0v)
    c0 = sig * sig * float(u0 @ w0v)
    disc0 = math.exp(-i_det[T0] + 0.5 * vI0)
    mu0 = r_det[T0] - c0
    vals = disc0 * _kernel_avg(np.array([mu0]), math.sqrt(v00), xs_next,
                               W_next[:, :2], order="cubic")[0]
    surv0 = float(_kernel_avg(np.array([r_det[T0]]), math.sqrt(v00),
                              xs_next, W_next[:, 2], order="cubic")[0])
    return KoCapDP(price=float(vals[0]), cap_price=float(vals[1]),
                   barrier_premium=float(vals[1] - vals[0]),
                   r_barriers=tuple(r_H[t] for t in fixes),
                   survival=surv0)


class KoCapResult(NamedTuple):
    price: jax.Array           # CV estimate of the knock-out cap
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    ko_fraction: jax.Array     # fraction of paths knocked out
    n_paths: int


@lru_cache(maxsize=None)
def _ko_cap_fn(cfg: HWConfig, rate: float, barrier: float, start: float,
               n: int, tau: float, delta: float, n_paths: int,
               n_blocks: int, rqmc: bool, mesh):
    from .bermudan import _functional_chol, _functional_det
    from .ratchet import _ratchet_stats

    fixes = tuple(start + j * tau for j in range(n))
    pays = tuple(start + (j + 1) * tau for j in range(n))
    specs = tuple([("r", t) for t in fixes] + [("I", t) for t in pays])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    stats = tuple(jnp.asarray(v, jnp.float32)
                  for v in _ratchet_stats(cfg, start, n, tau))

    def compute(key, sigma, market):
        from jax.scipy.stats import norm

        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det, i_det = det[:n], det[n:]
        lnA, B = (jnp.stack(v) for v in zip(
            *[_libor_terms(cfg, sigma, market, t, delta) for t in fixes]))
        # CV: the SINGLE-DATE truncated caplets sum_j tau (L_j - rate)^+
        # 1{L_j < H} e^{-I_{j+1}} — the knock-out payoff with only the
        # PAST-survival coupling removed, so it tracks the target far
        # better than the full cap (which a deep barrier decorrelates).
        # Its mean is a doubly-truncated tilted lognormal, exact under
        # the discrete law and differentiable in sigma.
        sig2 = tables.sig_st * tables.sig_st
        var_r, var_I, cov_rI = (sig2 * stats[q] for q in range(3))
        sd_r = jnp.sqrt(var_r)
        w0 = jnp.exp(-i_det + 0.5 * var_I)
        m_t = r_det - cov_rI
        Q = 1.0 + delta * rate
        QH = 1.0 + delta * barrier
        rstar = (lnA + math.log(Q)) / B
        rbar = (lnA + math.log(QH)) / B
        d2 = (m_t - rstar) / sd_r
        d2H = (m_t - rbar) / sd_r
        M = jnp.exp(B * m_t - lnA + 0.5 * B * B * var_r)
        cv_mean = tau / delta * jnp.sum(w0 * (
            M * (norm.cdf(d2 + B * sd_r) - norm.cdf(d2H + B * sd_r))
            - Q * (norm.cdf(d2) - norm.cdf(d2H))))

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]
                disc = jnp.exp(-(i_det[None, :] + sgn * z[:, n:]))
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                cash = tau * jnp.maximum(L - rate, 0.0) * disc
                below = (L < barrier).astype(jnp.float32)
                alive = jnp.cumprod(below, axis=1)     # survives fix j
                V = jnp.sum(alive * cash, axis=1)
                Y = jnp.sum(below * cash, axis=1)
                return V, Y, 1.0 - alive[:, -1]

            Vp, Yp, Kp = leg(1.0)
            Vm, Ym, Km = leg(-1.0)
            V, Y, KO = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Kp + Km)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y),
                              jnp.sum(KO)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cv_mean)
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


def price_ko_cap(cfg: HWConfig, key, market: MarketCurve, *, rate: float,
                 barrier: float, start: float | None = None,
                 tenor: float = 4.0, freq: float = 1.0,
                 libor_tenor: float | None = None, sigma=None,
                 n_paths: int | None = None, n_blocks: int = 1,
                 rqmc: bool = False, mesh=None) -> KoCapResult:
    """Monte Carlo up-and-out cap on exactly-sampled multi-date (r, I)
    functionals (survival via a cumulative product over fixings), with
    the FULL cap as control variate at its exact discrete-law
    closed-form mean.  Blocks key on their global index; optionally
    sharded over ``mesh``.  fp64 oracle: dp_oracle_ko_cap."""
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
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _ko_cap_fn(cfg, float(rate), float(barrier), float(start), n,
                     float(tau), float(libor_tenor), int(n_paths),
                     int(n_blocks), bool(rqmc), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return KoCapResult(price=out[0], std_error=out[1], raw_price=out[2],
                       raw_std_error=out[3], beta=out[4],
                       ko_fraction=out[5],
                       n_paths=int(n_paths) * int(n_blocks))


class KoCapVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_ko_cap(cfg: HWConfig, key, market: MarketCurve, *, rate: float,
                barrier: float, start: float | None = None,
                tenor: float = 4.0, freq: float = 1.0,
                libor_tenor: float | None = None,
                sigma: float | None = None, eps: float = 1e-3,
                n_paths: int | None = None, n_blocks: int = 1,
                mesh=None) -> KoCapVega:
    """CRN central-difference vega vs the fp64 DP's own FD."""
    if sigma is None:
        sigma = cfg.sigma
    kw = dict(rate=rate, barrier=barrier, start=start, tenor=tenor,
              freq=freq, libor_tenor=libor_tenor)
    pm = price_ko_cap(cfg, key, market, sigma=sigma - eps,
                      n_paths=n_paths, n_blocks=n_blocks, mesh=mesh, **kw)
    pp = price_ko_cap(cfg, key, market, sigma=sigma + eps,
                      n_paths=n_paths, n_blocks=n_blocks, mesh=mesh, **kw)
    om = dp_oracle_ko_cap(cfg, market, sigma=float(sigma) - eps, **kw)
    op = dp_oracle_ko_cap(cfg, market, sigma=float(sigma) + eps, **kw)
    return KoCapVega(vega=(pp.price - pm.price) / (2.0 * eps),
                     dp_vega=(op.price - om.price) / (2.0 * eps),
                     price_minus=pm.price, price_plus=pp.price,
                     epsilon=float(eps))


# ---------------------------------------------------------------------------
# G2++ twin: the barrier indicator L(T_j) >= H is a VERTICAL line in the
# rotated coordinate u = Ba x + Bb y (the LIBOR strip projection — a
# date-independent direction since the libor tenor is fixed), so the
# two-factor up-and-out cap rides the (u, w) DP machinery of g2_note
# unchanged: double node at u_H (the value cliff), kink node at u_K (the
# caplet kink), coupon DETERMINISTIC on the u-grid, continuation exact
# in u / Gauss-Hermite in w, survival propagated under the untilted
# kernel.  Every conditional law projects off g2pp._g2_functional_cov —
# the sampler's own matrix — so oracle and MC integrate the same law.
# ---------------------------------------------------------------------------


class KoCapDPG2(NamedTuple):
    price: float               # fp64 DP value of the knock-out cap
    cap_price: float           # full cap from the same iteration
    barrier_premium: float     # cap_price - price (>= 0)
    survival: float            # P(never knocked out) under the DP law


def cap_closed_form_g2(cfg: HWConfig, g, market: MarketCurve, *,
                       rate: float, start: float | None = None,
                       tenor: float = 4.0, freq: float = 1.0,
                       libor_tenor: float | None = None):
    """float64 G2++ cap leg in closed form under the exact functional
    law: per caplet, with u Gaussian and tilted mean m = -Cov(u, I_p),

      tau/delta P(0,T_p) [ e^{m + s^2/2 - lnA} Phi(d2 + s) - Q Phi(d2) ],

    d2 = (m - u_K)/s, u_K = lnA + log(1 + delta rate).  Returns
    (leg value, per-period list).  Two-factor twin of
    instruments.cap_closed_form; the DP full-cap column and the MC's
    truncated-caplet CV mean both reduce to this when the barrier is
    pushed to infinity."""
    from .g2_note import _kink_edge, _strip_lnA_f64
    from .models.g2pp import _B, _g2_functional_cov
    from .range_note import _nphi

    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    Q = 1.0 + delta * rate
    total, per = 0.0, []
    for j in range(n):
        t = float(start) + j * tau
        Tp = t + tau
        Sig = _g2_functional_cov(g, (("u", t, Ba, Bb), ("I", Tp)))
        s = math.sqrt(Sig[0, 0])
        m = -Sig[0, 1]
        lnA = _strip_lnA_f64(cfg, g, market, t, delta)
        uK = _kink_edge(lnA, delta, rate)
        d2 = (m - uK) / s
        M = math.exp(m - lnA + 0.5 * s * s)
        v = tau / delta * float(np.interp(Tp, Ts, P0)) * (
            M * float(_nphi(d2 + s)) - Q * float(_nphi(d2)))
        per.append(v)
        total += v
    return total, per


def dp_oracle_ko_cap_g2(cfg: HWConfig, g, market: MarketCurve, *,
                        rate: float, barrier: float,
                        start: float | None = None, tenor: float = 4.0,
                        freq: float = 1.0,
                        libor_tenor: float | None = None,
                        n_u: int = 161, n_w: int = 61,
                        width: float = 7.0,
                        n_quad: int = 16) -> KoCapDPG2:
    """fp64 2-d value iteration for the G2++ up-and-out cap on rotated
    (u, w) grids: per fixing the u-grid carries a kink node at u_K and a
    DOUBLE node at u_H (the knock-out cliff), value columns
    [knock-out cap, full cap, survival] batch through one
    _expect_bilinear_multi call per date (survival separately, under the
    untilted kernel).  The full-cap column is pinned against
    cap_closed_form_g2 by the tests."""
    from .g2_note import (_expect_bilinear, _expect_bilinear_multi,
                          _kink_edge, _period_machine, _strip_lnA_f64)
    from .models.g2pp import _B, _g2_functional_cov, _v_integral
    from .range_note import _note_dates

    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    if barrier <= rate:
        raise ValueError("barrier must sit above the strike rate")
    obs, bounds, dates = _note_dates(float(start), n, float(tau), 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    dd = {t: float(np.interp(t, Ts, P0))
          * math.exp(-0.5 * _v_integral(g, t)) for t in bounds}
    lnAs = {t: _strip_lnA_f64(cfg, g, market, t, delta)
            for o in obs for t in o}
    uK = {t: _kink_edge(lnAs[t], delta, rate) for t in lnAs}
    uH = {t: _kink_edge(lnAs[t], delta, barrier) for t in lnAs}

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        ug = np.linspace(-width * s_u, width * s_u, n_u)
        extra = []
        if ug[0] < uK[t] < ug[-1]:
            # kink: +-eps double node since round 4's cubic surfaces
            # (zero-width cell = slope-segment break; see chooser.grids)
            extra += [uK[t] - 1e-9, uK[t] + 1e-9]
        if ug[0] < uH[t] < ug[-1]:
            extra += [uH[t] - 1e-9, uH[t]]          # jump (double node)
        if extra:
            ug = np.unique(np.concatenate([ug, np.asarray(extra)]))
        return ug, np.linspace(-width * s_w, width * s_w, n_w)

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds[:n]}

    # at T_n nothing is left to observe: value 0, survival 1
    s_un = math.sqrt(_g2_functional_cov(
        g, (("u", bounds[n], Ba, Bb),))[0, 0])
    s_wn = math.sqrt(_g2_functional_cov(
        g, (("u", bounds[n], ca, cb),))[0, 0])
    ug_next = np.linspace(-width * s_un, width * s_un, n_u)
    wg_next = np.linspace(-width * s_wn, width * s_wn, n_w)
    Vko = np.zeros((len(ug_next), len(wg_next)))
    Vfull = np.zeros_like(Vko)
    Vsur = np.ones_like(Vko)

    for j in range(n - 1, -1, -1):
        Tj, Tp = bounds[j], bounds[j + 1]
        ug, wg = gr[Tj]
        U, Wm = np.meshgrid(ug, wg, indexing="ij")
        uf, wf = U.ravel(), Wm.ravel()
        interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                             Ba, Bb, ca, cb)
        assert not interior              # the only obs is at T_j itself
        iu, iw = 1, 2
        m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
        w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
        L = (np.exp(uf - lnAs[Tj]) - 1.0) / delta
        cpn = tau * np.maximum(L - rate, 0.0)
        mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf
        mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf
        Ev = _expect_bilinear_multi(
            mu_u - C[iu, 0], mu_w - C[iw, 0], C[iu, iu], C[iu, iw],
            C[iw, iw], ug_next, wg_next, [Vko, Vfull], nodes, wq)
        # survival propagates under the UNtilted kernel (no discounting)
        Es = _expect_bilinear(mu_u, mu_w, C[iu, iu], C[iu, iw],
                              C[iw, iw], ug_next, wg_next, Vsur,
                              nodes, wq)
        alive = uf < uH[Tj]
        sh = (len(ug), len(wg))
        Vko = np.where(alive, w0 * (cpn + Ev[:, 0]), 0.0).reshape(sh)
        Vfull = (w0 * (cpn + Ev[:, 1])).reshape(sh)
        Vsur = np.where(alive, Es, 0.0).reshape(sh)
        ug_next, wg_next = ug, wg

    T0 = bounds[0]
    S0 = _g2_functional_cov(
        g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
    P00 = float(np.interp(T0, Ts, P0))
    vals = P00 * _expect_bilinear_multi(
        np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1],
        S0[1, 2], S0[2, 2], ug_next, wg_next, [Vko, Vfull],
        nodes, wq)[0]
    surv = float(_expect_bilinear(
        np.array([0.0]), np.array([0.0]), S0[1, 1], S0[1, 2], S0[2, 2],
        ug_next, wg_next, Vsur, nodes, wq)[0])
    return KoCapDPG2(price=float(vals[0]), cap_price=float(vals[1]),
                     barrier_premium=float(vals[1] - vals[0]),
                     survival=surv)


@lru_cache(maxsize=None)
def _ko_cap_g2_stats(g, start: float, n: int, tau: float, delta: float):
    """Per-period fp64 (var_u, cov_uI) of the fixing projection u(T_j)
    and the payment integral I(T_{j+1}), off the sampler's own
    covariance — drives the truncated-caplet CV's exact tilted mean."""
    from .models.g2pp import _B, _g2_functional_cov

    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    var_u = np.zeros(n)
    cov_uI = np.zeros(n)
    for j in range(n):
        t = start + j * tau
        C = _g2_functional_cov(g, (("u", t, Ba, Bb), ("I", t + tau)))
        var_u[j], cov_uI[j] = C[0, 0], C[0, 1]
    return var_u, cov_uI


@lru_cache(maxsize=None)
def _ko_cap_g2_fn(cfg: HWConfig, g, rate: float, barrier: float,
                  start: float, n: int, tau: float, delta: float,
                  n_paths: int, n_blocks: int,
                  rqmc: bool, mesh):
    from .g2_note import _strip_lnA_traced
    from .models.g2pp import _B, _g2_functional_chol, _v_integral

    fixes = tuple(start + j * tau for j in range(n))
    pays = tuple(start + (j + 1) * tau for j in range(n))
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    specs = tuple([("u", t, Ba, Bb) for t in fixes]
                  + [("I", p) for p in pays])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    var_u, cov_uI = (jnp.asarray(v, jnp.float32)
                     for v in _ko_cap_g2_stats(g, start, n, tau, delta))
    v_half = jnp.asarray([0.5 * _v_integral(g, p) for p in pays],
                         jnp.float32)
    lQ = math.log1p(delta * rate)
    lH = math.log1p(delta * barrier)
    Q = 1.0 + delta * rate

    def compute(key, market):
        from jax.scipy.stats import norm

        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, t, delta)
                         for t in fixes])
        P0p = jnp.stack([hw.interp_curve(market.P, jnp.float32(p), cfg)
                         for p in pays])
        disc0 = P0p * jnp.exp(-v_half)
        # CV: single-date truncated caplets (the knock-out payoff with
        # only the PAST-survival coupling removed) at their exact
        # doubly-truncated tilted-lognormal mean under the sampled law
        sd = jnp.sqrt(var_u)
        m_t = -cov_uI
        d2 = (m_t - (lnA + lQ)) / sd
        d2H = (m_t - (lnA + lH)) / sd
        M = jnp.exp(m_t - lnA + 0.5 * var_u)
        cv_mean = tau / delta * jnp.sum(P0p * (
            M * (norm.cdf(d2 + sd) - norm.cdf(d2H + sd))
            - Q * (norm.cdf(d2) - norm.cdf(d2H))))

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                          # centered
                disc = disc0[None, :] * jnp.exp(-sgn * z[:, n:])
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                cash = tau * jnp.maximum(L - rate, 0.0) * disc
                below = (L < barrier).astype(jnp.float32)
                alive = jnp.cumprod(below, axis=1)
                V = jnp.sum(alive * cash, axis=1)
                Y = jnp.sum(below * cash, axis=1)
                return V, Y, 1.0 - alive[:, -1]

            Vp, Yp, Kp = leg(1.0)
            Vm, Ym, Km = leg(-1.0)
            V, Y, KO = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Kp + Km)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y),
                              jnp.sum(KO)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cv_mean)
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


def price_ko_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                    rate: float, barrier: float,
                    start: float | None = None, tenor: float = 4.0,
                    freq: float = 1.0, libor_tenor: float | None = None,
                    n_paths: int | None = None, n_blocks: int = 1,
                    rqmc: bool = False, mesh=None) -> KoCapResult:
    """Monte Carlo G2++ up-and-out cap on exactly-sampled (u, I)
    functionals (survival via a cumulative product over fixings), with
    the single-date truncated caplets as control variate at their exact
    closed-form mean.  fp64 oracle: dp_oracle_ko_cap_g2."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _ko_cap_g2_fn(cfg, g, float(rate), float(barrier), float(start),
                        n, float(tau), float(libor_tenor), int(n_paths),
                        int(n_blocks), bool(rqmc), mesh)(key, market)
    return KoCapResult(price=out[0], std_error=out[1], raw_price=out[2],
                       raw_std_error=out[3], beta=out[4],
                       ko_fraction=out[5],
                       n_paths=int(n_paths) * int(n_blocks))


def vega_ko_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                   rate: float, barrier: float,
                   start: float | None = None, tenor: float = 4.0,
                   freq: float = 1.0, libor_tenor: float | None = None,
                   eps: float = 1e-3, n_paths: int | None = None,
                   n_blocks: int = 1, mesh=None) -> KoCapVega:
    """CRN central-difference d price / d sigma (the x-factor vol) vs
    the fp64 DP oracle's own FD."""
    from .models.g2pp import G2Params

    kw = dict(rate=rate, barrier=barrier, start=start, tenor=tenor,
              freq=freq, libor_tenor=libor_tenor)
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    mc = dict(n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    pm = price_ko_cap_g2(cfg, gm, key, market, **kw, **mc)
    pp = price_ko_cap_g2(cfg, gp, key, market, **kw, **mc)
    om = dp_oracle_ko_cap_g2(cfg, gm, market, **kw)
    op = dp_oracle_ko_cap_g2(cfg, gp, market, **kw)
    return KoCapVega(vega=(pp.price - pm.price) / (2.0 * eps),
                     dp_vega=(op.price - om.price) / (2.0 * eps),
                     price_minus=pm.price, price_plus=pp.price,
                     epsilon=float(eps))
