"""Ratchet (resettable-strike) cap under Hull-White.

Each caplet's strike RESETS to the previous fixing: period j >= 1 pays

    tau (L(T_j) - L(T_{j-1}) - spread)^+        at T_{j+1},

with period 0 a plain caplet at a fixed ``strike0`` (default: the
market forward LIBOR over the first period plus the spread, i.e. the
leg ratchets from an at-the-money start).  A payoff on CONSECUTIVE
LIBOR PAIRS — the canonical forward-start / cliquet structure on
rates — extending the reference's product layer
(src/2_option_pricing.cu:14-35) one axis the single-date instruments
don't cover: two observation dates enter one kink.

fp64 oracle (``ratchet_cap_quadrature``): under the model's DISCRETE
trapezoid law, (r(T_{j-1}), r(T_j), I(T_{j+1})) is jointly Gaussian
with covariances read off the engine's own shock shapes
(ops.engine_linear._shock_shapes).  Tilting by e^{-I_p} (Gaussian
change of measure, same device as instruments.cms_quadrature) shifts
both short-rate means by -Cov(r, I_p) and multiplies by
E[e^{-I_p}].  Conditional on r(T_{j-1}) = x the inner expectation is a
call on e^{B_b r_b} at the x-dependent strike Q(x) = 1 + delta
(L_a(x) + spread) — a truncated-lognormal mean, CLOSED FORM.  The
outer integral over x is Gauss-Hermite: the inner value is SMOOTH in x
(the kink is integrated out), so GH converges spectrally here — unlike
the indicator features where it provably fails (docs/MATH.md §19);
n_quad 48 vs 96 agree to ~1e-13 (pinned in tests).

MC estimator: exactly-sampled functionals — r at the n fixings, I at
the n payments, nothing else (bermudan._functional_chol) — with the
FLOATING LEG sum tau L_j e^{-I_{j+1}} as control variate; its mean is
closed form under the same discrete law and is computed INSIDE the jit
as a function of sigma (exact, so CRN-FD vega differentiates through
the CV mean too).  Engine invariants kept: blocks key on the GLOBAL
block index, sigma enters only through ``tables.sig_st``, every
product takes n_blocks/mesh, antithetic pairs throughout.
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


def forward_libor(cfg: HWConfig, market: MarketCurve, t: float,
                  delta: float) -> float:
    """Market forward LIBOR over [t, t+delta] off the input curve."""
    P1 = float(np.asarray(hw.interp_curve(market.P, jnp.float32(t), cfg),
                          np.float64))
    P2 = float(np.asarray(hw.interp_curve(market.P, jnp.float32(t + delta),
                                          cfg), np.float64))
    return (P1 / P2 - 1.0) / delta


def _ratchet_dates(start: float, n: int, tau: float):
    fixes = tuple(start + j * tau for j in range(n))
    pays = tuple(start + (j + 1) * tau for j in range(n))
    return fixes, pays


@lru_cache(maxsize=None)
def _ratchet_stats(cfg: HWConfig, start: float, n: int, tau: float):
    """Host fp64 unit-variance dot products (per sig_st^2) between every
    functional the leg touches: for each period j, Var r_j, Var I_{j+1},
    Cov(r_j, I_{j+1}), and for j >= 1 the cross-date Cov(r_{j-1}, r_j)
    and Cov(r_{j-1}, I_{j+1})."""
    from .bermudan import _step_index
    from .ops.engine_linear import _shock_shapes

    fixes, pays = _ratchet_dates(start, n, tau)
    u, w = {}, {}
    for t in set(fixes) | set(pays):
        nt = _step_index(cfg, t)
        ut, wt = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, nt))
        u[t], w[t] = ut, wt
    var_r = np.array([u[t] @ u[t] for t in fixes])
    var_I = np.array([w[p] @ w[p] for p in pays])
    cov_rI = np.array([u[t] @ w[p][:len(u[t])]
                       for t, p in zip(fixes, pays)])
    cov_ab = np.array([0.0] + [u[fixes[j - 1]] @ u[fixes[j]][:len(
        u[fixes[j - 1]])] for j in range(1, n)])
    cov_aI = np.array([0.0] + [u[fixes[j - 1]] @ w[pays[j]][:len(
        u[fixes[j - 1]])] for j in range(1, n)])
    return var_r, var_I, cov_rI, cov_ab, cov_aI


@lru_cache(maxsize=None)
def _rb_coeffs(cfg: HWConfig, start: float, n: int, tau: float):
    """Per-period Rao-Blackwell conditioning coefficients for
    r(T_j) | (r(T_{j-1}), I(T_{j+1})): regression betas (RATIOS of
    covariances, so sigma-INDEPENDENT — sig_st^2 cancels) and the
    conditional std per unit sig_st.  Period 0 conditions on I(T_1)
    only (beta1[0] = 0)."""
    var_r, var_I, cov_rI, cov_ab, cov_aI = _ratchet_stats(
        cfg, start, n, tau)
    b1 = np.zeros(n)
    b2 = np.zeros(n)
    scu = np.zeros(n)
    b2[0] = cov_rI[0] / var_I[0]
    scu[0] = math.sqrt(max(var_r[0] - cov_rI[0] ** 2 / var_I[0], 1e-30))
    for j in range(1, n):
        S = np.array([[var_r[j - 1], cov_aI[j]],
                      [cov_aI[j], var_I[j]]])
        c = np.array([cov_ab[j], cov_rI[j]])
        beta = np.linalg.solve(S, c)
        b1[j], b2[j] = beta
        scu[j] = math.sqrt(max(var_r[j] - float(beta @ c), 1e-30))
    return b1, b2, scu


def ratchet_cap_quadrature(cfg: HWConfig, market: MarketCurve, *,
                           spread: float = 0.0, strike0: float | None = None,
                           start: float | None = None, tenor: float = 4.0,
                           freq: float = 1.0,
                           libor_tenor: float | None = None,
                           sigma: float | None = None, n_quad: int = 96):
    """float64 ratchet-cap leg under the model's discrete trapezoid law:
    per period a Gauss-Hermite outer integral over the previous fixing
    of a closed-form (truncated-lognormal) inner caplet.  Returns
    (leg value, per-period list)."""
    from numpy.polynomial.hermite_e import hermegauss

    from .bermudan import _det_states
    from .range_note import _ndtr as _phi

    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    if strike0 is None:
        strike0 = forward_libor(cfg, market, start, delta) + spread

    fixes, pays = _ratchet_dates(float(start), n, tau)
    tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    sig2 = sig * sig
    dates = tuple(sorted(set(fixes) | set(pays)))
    idx = {t: q for q, t in enumerate(dates)}
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    var_r, var_I, cov_rI, cov_ab, cov_aI = (
        sig2 * v for v in _ratchet_stats(cfg, float(start), n, tau))
    terms = [tuple(float(np.asarray(v, np.float64)) for v in _libor_terms(
        cfg, jnp.float32(sigma), market, t, delta)) for t in fixes]
    gh_x, gh_w = hermegauss(int(n_quad))    # weight e^{-x^2/2}/sqrt(2pi)
    gh_w = gh_w / math.sqrt(2.0 * math.pi)

    def caplet(m_b, s_b, lnA, B, Q):
        """E[(e^{B r_b - lnA} - Q)^+] / delta, r_b ~ N(m_b, s_b^2)."""
        M = np.exp(B * m_b - lnA + 0.5 * B * B * s_b * s_b)
        Qc = np.maximum(Q, 1e-300)
        rstar = (lnA + np.log(Qc)) / B
        d2 = (m_b - rstar) / s_b
        d1 = d2 + B * s_b
        itm = M * _phi(d1) - Qc * _phi(d2)
        return np.where(Q > 0.0, itm, M - Q) / delta

    per = []
    for j in range(n):
        w0 = math.exp(-i_det_a[idx[pays[j]]] + 0.5 * var_I[j])
        m_b = r_det_a[idx[fixes[j]]] - cov_rI[j]
        lnA_b, B_b = terms[j]
        if j == 0:
            v = w0 * tau * float(caplet(np.array([m_b]),
                                        math.sqrt(var_r[0]), lnA_b, B_b,
                                        np.array([1.0 + delta * strike0]))[0])
        else:
            m_a = r_det_a[idx[fixes[j - 1]]] - cov_aI[j]
            s_a = math.sqrt(var_r[j - 1])
            beta_c = cov_ab[j] / var_r[j - 1]
            s_c = math.sqrt(max(var_r[j] - cov_ab[j] ** 2 / var_r[j - 1],
                                1e-30))
            lnA_a, B_a = terms[j - 1]
            x = m_a + s_a * gh_x
            La = (np.exp(B_a * x - lnA_a) - 1.0) / delta
            Q = 1.0 + delta * (La + spread)
            mu_c = m_b + beta_c * (x - m_a)
            v = w0 * tau * float(gh_w @ caplet(mu_c, s_c, lnA_b, B_b, Q))
        per.append(v)
    return float(sum(per)), per


class RatchetResult(NamedTuple):
    price: jax.Array           # CV estimate of the ratchet leg
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    periods: jax.Array         # (n,) per-period values (plain MC)
    n_paths: int


@lru_cache(maxsize=None)
def _ratchet_fn(cfg: HWConfig, spread: float, strike0: float, start: float,
                n: int, tau: float, delta: float, n_paths: int,
                n_blocks: int, rqmc: bool, mesh):
    from .bermudan import _functional_chol, _functional_det

    fixes, pays = _ratchet_dates(start, n, tau)
    # sample exactly the functionals the payoff touches, in payoff
    # order: r at the n fixings, then I at the n payments
    specs = tuple([("r", t) for t in fixes] + [("I", t) for t in pays])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    stats = tuple(jnp.asarray(v, jnp.float32)
                  for v in _ratchet_stats(cfg, start, n, tau))
    b1, b2, scu = (jnp.asarray(v, jnp.float32)
                   for v in _rb_coeffs(cfg, start, n, tau))

    def compute(key, sigma, market):
        from jax.scipy.stats import norm

        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det, i_det = det[:n], det[n:]
        lnA, B = (jnp.stack(v) for v in zip(
            *[_libor_terms(cfg, sigma, market, t, delta) for t in fixes]))
        # floating-leg CV tau sum_j L_j e^{-I_{j+1}}: exact discrete-law
        # (tilted lognormal) mean, as a function of sigma so CRN-FD vega
        # differentiates through it
        sig2 = tables.sig_st * tables.sig_st
        var_r, var_I, cov_rI = (sig2 * stats[q] for q in range(3))
        w0 = jnp.exp(-i_det + 0.5 * var_I)
        cv_mean = tau * jnp.sum(w0 * (jnp.exp(
            B * (r_det - cov_rI) - lnA + 0.5 * B * B * var_r) - 1.0)
            / delta)
        sc = tables.sig_st * scu                      # conditional stds

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]          # (paths, n)
                integ = i_det[None, :] + sgn * z[:, n:]       # (paths, n)
                disc = jnp.exp(-integ)
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                K = jnp.concatenate(
                    [jnp.full((ro.shape[0], 1), strike0, jnp.float32),
                     L[:, :-1] + spread], axis=1)
                # Rao-Blackwell: per period, the closed-form conditional
                # caplet E[(L_j - K_j)^+ | r_{j-1}, I_{j+1}] — the kinked
                # r_j draw is integrated out analytically (truncated
                # lognormal), leaving only the smooth (r_{j-1}, I)
                # noise.  ro_prev's column 0 is a dummy (b1[0] = 0).
                ro_prev = jnp.concatenate(
                    [ro[:, :1] * 0 + r_det[0], ro[:, :-1]], axis=1)
                rd_prev = jnp.concatenate([r_det[:1], r_det[:-1]])
                m_c = (r_det[None, :] + b1[None, :] * (ro_prev
                                                       - rd_prev[None, :])
                       + b2[None, :] * (integ - i_det[None, :]))
                Q = 1.0 + delta * K
                rstar = (lnA[None, :]
                         + jnp.log(jnp.maximum(Q, 1e-30))) / B[None, :]
                d2 = (m_c - rstar) / sc[None, :]
                M = jnp.exp(B[None, :] * m_c - lnA[None, :]
                            + 0.5 * (B[None, :] * sc[None, :]) ** 2)
                itm = (M * norm.cdf(d2 + B[None, :] * sc[None, :])
                       - Q * norm.cdf(d2))
                cond = jnp.where(Q > 0.0, itm, M - Q) / delta
                pv = tau * cond * disc                        # (paths, n)
                Y = tau * jnp.sum(L * disc, axis=1)
                raw = tau * jnp.sum(jnp.maximum(L - K, 0.0) * disc,
                                    axis=1)
                return pv, Y, raw

            pv_p, Yp, Rp = leg(1.0)
            pv_m, Ym, Rm = leg(-1.0)
            pv, Y = 0.5 * (pv_p + pv_m), 0.5 * (Yp + Ym)
            raw = 0.5 * (Rp + Rm)
            V = jnp.sum(pv, axis=1)
            return jnp.concatenate([
                jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                           jnp.sum(Y * Y), jnp.sum(V * Y),
                           jnp.sum(raw), jnp.sum(raw * raw)]),
                jnp.sum(pv, axis=0)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my, mr = s[0] / n_tot, s[2] / n_tot, s[5] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        var_r = jnp.maximum(s[6] / n_tot - mr * mr, 0.0)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cv_mean)
        if rqmc:
            # within a block the Sobol points are deterministic given
            # the digital shift; the shifts are the independent
            # replicates (requires n_blocks >= 2)
            cv_b = (per_block[:, 0] - beta * per_block[:, 2]) / n_paths
            se = jnp.std(cv_b, ddof=1) / jnp.sqrt(1.0 * n_blocks)
            raw_se = jnp.std(per_block[:, 5] / n_paths, ddof=1) \
                / jnp.sqrt(1.0 * n_blocks)
        else:
            var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
            bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            se = jnp.sqrt(bessel * var_cv / n_tot)
            raw_se = jnp.sqrt(bessel * var_r / n_tot)
        return price, se, mr, raw_se, beta, s[7:] / n_tot

    return jax.jit(compute)


def price_ratchet_cap(cfg: HWConfig, key, market: MarketCurve, *,
                      spread: float = 0.0, strike0: float | None = None,
                      start: float | None = None, tenor: float = 4.0,
                      freq: float = 1.0, libor_tenor: float | None = None,
                      sigma=None, n_paths: int | None = None,
                      n_blocks: int = 1, rqmc: bool = False,
                      mesh=None) -> RatchetResult:
    """Monte Carlo ratchet-cap leg on exactly-sampled multi-date (r, I)
    functionals, floating-leg control variate with its exact
    discrete-law mean.  ``rqmc=True`` draws each block from a
    digitally-shifted Sobol sequence mapped through ndtri — the
    Rao-Blackwell payoff is SMOOTH in the sampled (r, I) draws (the
    kink is integrated out in closed form), the ideal RQMC regime; the
    shifts are the independent replicates (n_blocks >= 2) and the SE
    is computed across blocks.  Blocks key on their global index;
    optionally sharded over ``mesh``.  fp64 oracle:
    ratchet_cap_quadrature."""
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
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
    if strike0 is None:
        strike0 = forward_libor(cfg, market, float(start),
                                float(libor_tenor)) + spread
    out = _ratchet_fn(cfg, float(spread), float(strike0), float(start), n,
                      float(tau), float(libor_tenor), int(n_paths),
                      int(n_blocks), bool(rqmc), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return RatchetResult(price=out[0], std_error=out[1], raw_price=out[2],
                         raw_std_error=out[3], beta=out[4], periods=out[5],
                         n_paths=int(n_paths) * int(n_blocks))


class RatchetVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    oracle_vega: float         # fp64 quadrature central difference
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_ratchet_cap(cfg: HWConfig, key, market: MarketCurve, *,
                     spread: float = 0.0, strike0: float | None = None,
                     start: float | None = None, tenor: float = 4.0,
                     freq: float = 1.0, libor_tenor: float | None = None,
                     sigma: float | None = None, eps: float = 1e-3,
                     n_paths: int | None = None, n_blocks: int = 1,
                     mesh=None) -> RatchetVega:
    """CRN central-difference vega of the CV estimate (same key both
    legs; the functional Cholesky and the CV mean carry the sigma
    dependence smoothly), cross-checked against the fp64 quadrature
    oracle's own central difference."""
    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    if libor_tenor is None:
        libor_tenor = 1.0 / freq
    if strike0 is None:
        strike0 = forward_libor(cfg, market, float(start),
                                float(libor_tenor)) + spread
    kw = dict(spread=spread, strike0=strike0, start=start, tenor=tenor,
              freq=freq, libor_tenor=libor_tenor)
    pm = price_ratchet_cap(cfg, key, market, sigma=sigma - eps,
                           n_paths=n_paths, n_blocks=n_blocks, mesh=mesh,
                           **kw)
    pp = price_ratchet_cap(cfg, key, market, sigma=sigma + eps,
                           n_paths=n_paths, n_blocks=n_blocks, mesh=mesh,
                           **kw)
    om, _ = ratchet_cap_quadrature(cfg, market, sigma=float(sigma) - eps,
                                   **kw)
    op, _ = ratchet_cap_quadrature(cfg, market, sigma=float(sigma) + eps,
                                   **kw)
    return RatchetVega(vega=(pp.price - pm.price) / (2.0 * eps),
                       oracle_vega=(op - om) / (2.0 * eps),
                       price_minus=pm.price, price_plus=pp.price,
                       epsilon=float(eps))


# ---------------------------------------------------------------------------
# G2++ twin: the ratchet rides the LIBOR strip projection u = Ba x + Bb y
# (a DATE-INDEPENDENT direction — the libor tenor is fixed), so
# (u_{j-1}, u_j, I_{j+1}) is the entire per-period state: the oracle is
# the SAME GH-outer / closed-form-inner integral with u replacing B r
# (unit exponent), covariances read off _g2_functional_cov — the
# sampler's own matrix, so oracle and MC integrate the identical law —
# and the deterministic drift absorbed into lnA by the V-adjustment
# (g2pp._libor_strip_g2's identity: u is CENTERED, tilting by e^{-I_p}
# shifts it by -Cov(u, I_p) and pays P(0, T_p) exactly).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ratchet_g2_stats(g, start: float, n: int, tau: float, delta: float):
    """Per-period fp64 covariances of (u_{j-1}, u_j, I_{j+1}) and the
    Rao-Blackwell regression of u_j on (u_{j-1}, I_{j+1}): returns
    (var_u, var_I, cov_uI, b1, b2, s_c), each (n,).  Period 0
    conditions on I(T_1) only (b1[0] = 0)."""
    from .models.g2pp import _B, _g2_functional_cov

    fixes, pays = _ratchet_dates(start, n, tau)
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    var_u = np.zeros(n)
    var_I = np.zeros(n)
    cov_uI = np.zeros(n)
    b1 = np.zeros(n)
    b2 = np.zeros(n)
    s_c = np.zeros(n)
    for j in range(n):
        if j == 0:
            C = _g2_functional_cov(g, (("u", fixes[0], Ba, Bb),
                                       ("I", pays[0])))
            var_u[0], var_I[0], cov_uI[0] = C[0, 0], C[1, 1], C[0, 1]
            b2[0] = C[0, 1] / C[1, 1]
            s_c[0] = math.sqrt(max(C[0, 0] - C[0, 1] ** 2 / C[1, 1],
                                   1e-30))
        else:
            C = _g2_functional_cov(g, (("u", fixes[j - 1], Ba, Bb),
                                       ("u", fixes[j], Ba, Bb),
                                       ("I", pays[j])))
            var_u[j], var_I[j], cov_uI[j] = C[1, 1], C[2, 2], C[1, 2]
            S = C[np.ix_([0, 2], [0, 2])]
            c = C[np.ix_([1], [0, 2])][0]
            beta = np.linalg.solve(S, c)
            b1[j], b2[j] = beta
            s_c[j] = math.sqrt(max(C[1, 1] - float(beta @ c), 1e-30))
    return var_u, var_I, cov_uI, b1, b2, s_c


@lru_cache(maxsize=None)
def _ratchet_g2_cross(g, start: float, n: int, tau: float, delta: float):
    """(n,) fp64 cross covariances Cov(u_{j-1}, I_{j+1}) and
    Cov(u_{j-1}, u_j) for the oracle's outer/inner decomposition."""
    from .models.g2pp import _B, _g2_functional_cov

    fixes, pays = _ratchet_dates(start, n, tau)
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    cov_aI = np.zeros(n)
    cov_ab = np.zeros(n)
    for j in range(1, n):
        C = _g2_functional_cov(g, (("u", fixes[j - 1], Ba, Bb),
                                   ("u", fixes[j], Ba, Bb),
                                   ("I", pays[j])))
        cov_aI[j] = C[0, 2]
        cov_ab[j] = C[0, 1]
    return cov_aI, cov_ab


def ratchet_cap_quadrature_g2(cfg: HWConfig, g, market: MarketCurve, *,
                              spread: float = 0.0,
                              strike0: float | None = None,
                              start: float | None = None,
                              tenor: float = 4.0, freq: float = 1.0,
                              libor_tenor: float | None = None,
                              n_quad: int = 96):
    """float64 G2++ ratchet-cap leg: per period, Gauss-Hermite over the
    tilted previous-fixing projection u_{j-1} of a closed-form
    (truncated lognormal in e^{u_j}) inner caplet.  Returns
    (leg value, per-period list)."""
    from numpy.polynomial.hermite_e import hermegauss

    from .g2_note import _strip_lnA_f64
    from .range_note import _ndtr as _phi

    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    if strike0 is None:
        strike0 = forward_libor(cfg, market, float(start), delta) + spread

    fixes, pays = _ratchet_dates(float(start), n, tau)
    var_u, var_I, cov_uI, b1, b2, s_c = _ratchet_g2_stats(
        g, float(start), n, tau, delta)
    del var_I, b1, b2, s_c
    cov_aI, cov_ab = _ratchet_g2_cross(g, float(start), n, tau, delta)
    lnA = [_strip_lnA_f64(cfg, g, market, t, delta) for t in fixes]
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    gh_x, gh_w = hermegauss(int(n_quad))
    gh_w = gh_w / math.sqrt(2.0 * math.pi)

    def caplet(m_b, s_b, lnA_b, Q):
        M = np.exp(m_b - lnA_b + 0.5 * s_b * s_b)
        Qc = np.maximum(Q, 1e-300)
        d2 = (m_b - (lnA_b + np.log(Qc))) / s_b
        itm = M * _phi(d2 + s_b) - Qc * _phi(d2)
        return np.where(Q > 0.0, itm, M - Q) / delta

    per = []
    for j in range(n):
        P0p = float(np.interp(pays[j], Ts, P0))
        m_b = -cov_uI[j]
        if j == 0:
            v = P0p * tau * float(caplet(
                np.array([m_b]), math.sqrt(var_u[0]), lnA[0],
                np.array([1.0 + delta * strike0]))[0])
        else:
            m_a = -cov_aI[j]
            s_a = math.sqrt(var_u[j - 1])
            beta_c = cov_ab[j] / var_u[j - 1]
            s_cc = math.sqrt(max(var_u[j] - cov_ab[j] ** 2 / var_u[j - 1],
                                 1e-30))
            x = m_a + s_a * gh_x
            La = (np.exp(x - lnA[j - 1]) - 1.0) / delta
            Q = 1.0 + delta * (La + spread)
            mu_c = m_b + beta_c * (x - m_a)
            v = P0p * tau * float(gh_w @ caplet(mu_c, s_cc, lnA[j], Q))
        per.append(v)
    return float(sum(per)), per


@lru_cache(maxsize=None)
def _ratchet_g2_fn(cfg: HWConfig, g, spread: float, strike0: float,
                   start: float, n: int, tau: float, delta: float,
                   n_paths: int, n_blocks: int,
                   rqmc: bool, mesh):
    from .models.g2pp import (_B, _g2_functional_chol, _v_integral)
    from .g2_note import _strip_lnA_traced

    fixes, pays = _ratchet_dates(start, n, tau)
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    specs = tuple([("u", t, Ba, Bb) for t in fixes]
                  + [("I", p) for p in pays])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    var_u, var_I, cov_uI, b1v, b2v, scv = _ratchet_g2_stats(
        g, start, n, tau, delta)
    var_u, cov_uI = (jnp.asarray(v, jnp.float32) for v in (var_u, cov_uI))
    b1, b2, sc = (jnp.asarray(v, jnp.float32) for v in (b1v, b2v, scv))
    v_half = jnp.asarray([0.5 * _v_integral(g, p) for p in pays],
                         jnp.float32)

    def compute(key, market):
        from jax.scipy.stats import norm

        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, t, delta)
                         for t in fixes])
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             for p in pays]) * jnp.exp(-v_half)
        # floating-leg CV mean: exact tilted lognormal in u
        cv_mean = tau * jnp.sum(
            jnp.stack([hw.interp_curve(market.P, jnp.float32(p), cfg)
                       for p in pays])
            * (jnp.exp(-cov_uI - lnA + 0.5 * var_u) - 1.0) / delta)

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                        # centered
                zi = sgn * z[:, n:]
                disc = disc0[None, :] * jnp.exp(-zi)
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                K = jnp.concatenate(
                    [jnp.full((u.shape[0], 1), strike0, jnp.float32),
                     L[:, :-1] + spread], axis=1)
                u_prev = jnp.concatenate([u[:, :1] * 0, u[:, :-1]],
                                         axis=1)
                m_c = b1[None, :] * u_prev + b2[None, :] * zi
                Q = 1.0 + delta * K
                d2 = (m_c - lnA[None, :]
                      - jnp.log(jnp.maximum(Q, 1e-30))) / sc[None, :]
                M = jnp.exp(m_c - lnA[None, :] + 0.5 * sc[None, :] ** 2)
                itm = (M * norm.cdf(d2 + sc[None, :]) - Q * norm.cdf(d2))
                cond = jnp.where(Q > 0.0, itm, M - Q) / delta
                pv = tau * cond * disc
                Y = tau * jnp.sum(L * disc, axis=1)
                raw = tau * jnp.sum(jnp.maximum(L - K, 0.0) * disc,
                                    axis=1)
                return pv, Y, raw

            pv_p, Yp, Rp = leg(1.0)
            pv_m, Ym, Rm = leg(-1.0)
            pv, Y = 0.5 * (pv_p + pv_m), 0.5 * (Yp + Ym)
            raw = 0.5 * (Rp + Rm)
            V = jnp.sum(pv, axis=1)
            return jnp.concatenate([
                jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                           jnp.sum(Y * Y), jnp.sum(V * Y),
                           jnp.sum(raw), jnp.sum(raw * raw)]),
                jnp.sum(pv, axis=0)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my, mr = s[0] / n_tot, s[2] / n_tot, s[5] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        var_raw = jnp.maximum(s[6] / n_tot - mr * mr, 0.0)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cv_mean)
        if rqmc:
            # within a block the Sobol points are deterministic given
            # the digital shift; the shifts are the independent
            # replicates (requires n_blocks >= 2)
            cv_b = (per_block[:, 0] - beta * per_block[:, 2]) / n_paths
            se = jnp.std(cv_b, ddof=1) / jnp.sqrt(1.0 * n_blocks)
            raw_se = jnp.std(per_block[:, 5] / n_paths, ddof=1) \
                / jnp.sqrt(1.0 * n_blocks)
        else:
            var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
            bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            se = jnp.sqrt(bessel * var_cv / n_tot)
            raw_se = jnp.sqrt(bessel * var_raw / n_tot)
        return price, se, mr, raw_se, beta, s[7:] / n_tot

    return jax.jit(compute)


def price_ratchet_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                         spread: float = 0.0, strike0: float | None = None,
                         start: float | None = None, tenor: float = 4.0,
                         freq: float = 1.0,
                         libor_tenor: float | None = None,
                         n_paths: int | None = None, n_blocks: int = 1,
                         rqmc: bool = False, mesh=None) -> RatchetResult:
    """Monte Carlo G2++ ratchet-cap leg (Rao-Blackwell conditional
    caplets on the strip projection, floating-leg CV).  ``rqmc=True``
    as in price_ratchet_cap: per-block digitally-shifted Sobol,
    across-block SEs, n_blocks >= 2.  fp64 oracle:
    ratchet_cap_quadrature_g2."""
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    if strike0 is None:
        strike0 = forward_libor(cfg, market, float(start),
                                float(libor_tenor)) + spread
    out = _ratchet_g2_fn(cfg, g, float(spread), float(strike0),
                         float(start), n, float(tau), float(libor_tenor),
                         int(n_paths), int(n_blocks), bool(rqmc),
                         mesh)(key, market)
    return RatchetResult(price=out[0], std_error=out[1], raw_price=out[2],
                         raw_std_error=out[3], beta=out[4], periods=out[5],
                         n_paths=int(n_paths) * int(n_blocks))


def vega_ratchet_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                        spread: float = 0.0, strike0: float | None = None,
                        start: float | None = None, tenor: float = 4.0,
                        freq: float = 1.0,
                        libor_tenor: float | None = None,
                        eps: float = 1e-3, n_paths: int | None = None,
                        n_blocks: int = 1, mesh=None) -> RatchetVega:
    """CRN central-difference d price / d sigma (the x-factor vol),
    cross-checked against the fp64 quadrature's own FD."""
    from .models.g2pp import G2Params

    if start is None:
        start = cfg.s1
    if libor_tenor is None:
        libor_tenor = 1.0 / freq
    if strike0 is None:
        strike0 = forward_libor(cfg, market, float(start),
                                float(libor_tenor)) + spread
    kw = dict(spread=spread, strike0=strike0, start=start, tenor=tenor,
              freq=freq, libor_tenor=libor_tenor)
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    mc = dict(n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    pm = price_ratchet_cap_g2(cfg, gm, key, market, **kw, **mc)
    pp = price_ratchet_cap_g2(cfg, gp, key, market, **kw, **mc)
    om, _ = ratchet_cap_quadrature_g2(cfg, gm, market, **kw)
    op, _ = ratchet_cap_quadrature_g2(cfg, gp, market, **kw)
    return RatchetVega(vega=(pp.price - pm.price) / (2.0 * eps),
                       oracle_vega=(op - om) / (2.0 * eps),
                       price_minus=pm.price, price_plus=pp.price,
                       epsilon=float(eps))
