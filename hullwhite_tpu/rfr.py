"""Backward-looking RFR (overnight-rate) caplets and floorlets.

Post-LIBOR products on the model's own realized short rate over an
accrual period [T_s, T_e] (the SOFR/ESTR convention family):

  * **compounded**: the continuously-compounded setting of the daily
    compound, R_c = (e^{I(T_e) - I(T_s)} - 1) / delta with
    I(t) = int_0^t r du the model's discount integral — exactly the
    quantity every engine in this repo already integrates.  Payoff at
    T_e: delta * max(zeta (R_c - K), 0), zeta = +1 caplet / -1 floorlet.
  * **averaged**: the arithmetic average A = (1/m) sum_i r(t_i) over m
    right-endpoint observation dates in (T_s, T_e].  Payoff at T_e:
    delta * max(zeta (A - K), 0).

Both are *exact* products of the multi-date functional machinery
(bermudan._functional_chol / g2pp._g2_functional_cov): the payoff
touches only Gaussian functionals (I at two dates; r at observations
plus I at payment), so the MC draws them directly — no path scan — and
the fp64 oracles are closed form:

  compounded: tilt by e^{-I_e} (Gaussian change of measure) makes
    e^{dI} lognormal => a Black formula,
      cap = P_s Phi(d1) - Kb P_e Phi(d2),   Kb = 1 + delta K,
      d2 = (mu~ - ln Kb)/s_D, d1 = d2 + s_D,
      mu~ = E[dI] - Cov(I_e, dI),  s_D^2 = Var dI,
    where P_t = E[e^{-I(t)}] is the model zero-coupon bond.
  averaged: the same tilt shifts the Gaussian average's mean by
    -Cov(A, I_e) => a Bachelier formula,
      cap = delta P_e [ (mu~_A - K) Phi(h) + s_A phi(h) ],
      h = (mu~_A - K)/s_A.

Reference anchor: the product layer of
/root/reference/src/2_option_pricing.cu:14-35 (simulate_ZBC_control_variate
— the single-functional e^{-I} payoff this family generalizes); the
closed-form validation style mirrors the reference's analytic ZBC gate
(2_option_pricing.cu:498-516).

G2++ twins ride the identical structure: I and dI are Gaussian under
G2++ too, and r(t) = phi(t) + x(t) + y(t) with phi(t) = f(0,t)
+ V'(t)/2, so the averaged twin samples the unit strip projection
("u", t, 1, 1) = x + y.  Discounting is market-consistent:
E[e^{-I_full(t)}] = P(0,t) by construction of phi.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HWConfig
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .ops.engine_linear import _shock_shapes
from .parallel import mesh as pmesh


class RFRResult(NamedTuple):
    price: jax.Array
    std_error: jax.Array
    n_paths: int


def _check_grid(cfg: HWConfig, t: float, what: str) -> float:
    n = round(t / cfg.dt)
    if abs(n * cfg.dt - t) > 1e-9 or not (0 < n <= cfg.n_steps):
        raise ValueError(f"{what} {t} must sit on the step grid")
    return float(n * cfg.dt)


def _obs_dates(cfg: HWConfig, start: float, end: float,
               n_obs: int) -> tuple:
    """m right-endpoint observation dates start + i*(end-start)/m,
    i = 1..m, each on the step grid."""
    step = (end - start) / n_obs
    if abs(round(step / cfg.dt) * cfg.dt - step) > 1e-9:
        raise ValueError("(end - start)/n_obs must be a multiple of dt")
    return tuple(start + (i + 1) * step for i in range(n_obs))


def _defaults(cfg: HWConfig, start, end, n_obs, style):
    if start is None:
        start = cfg.s1
    if end is None:
        end = start + 10 * cfg.mat_spacing  # one reference maturity decade
    start = _check_grid(cfg, start, "start")
    end = _check_grid(cfg, end, "end")
    if end <= start:
        raise ValueError("end must exceed start")
    if style not in ("compounded", "averaged"):
        raise ValueError(f"unknown RFR style {style!r}")
    if style == "averaged" and n_obs is None:
        n_obs = int(round((end - start) / cfg.dt))  # every step ~ daily
    return start, end, n_obs


def _specs(start: float, end: float, n_obs, style: str, cfg: HWConfig):
    if style == "compounded":
        return (("I", start), ("I", end))
    obs = _obs_dates(cfg, start, end, n_obs)
    return tuple([("r", t) for t in obs] + [("I", end)])


def _cov_np(cfg: HWConfig, specs: tuple) -> np.ndarray:
    """fp64 covariance of the spec functionals per unit sig_st (the
    oracle-side mirror of bermudan._functional_chol, no ridge)."""
    from .bermudan import _step_index

    U = np.zeros((cfg.n_steps, len(specs)))
    for c, (kind, t) in enumerate(specs):
        n = _step_index(cfg, t)
        u, w = _shock_shapes(cfg, n)
        U[:n, c] = np.asarray(u if kind == "r" else w, np.float64)
    return U.T @ U


# ---------------------------------------------------------------------------
# Hull-White
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _rfr_fn(cfg: HWConfig, style: str, strike: float, start: float,
            end: float, n_obs, n_paths: int, n_blocks: int, mesh):
    from .bermudan import _functional_chol, _functional_det

    specs = _specs(start, end, n_obs, style, cfg)
    LT = jnp.asarray(_functional_chol(cfg, specs))
    delta = end - start
    kb = 1.0 + delta * strike
    m = len(specs) - 1  # r-columns for averaged; 1 for compounded

    def compute(key, sigma):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, len(specs)), jnp.float32)
            z = tables.sig_st * jnp.dot(
                x, LT, preferred_element_type=jnp.float32,
                precision=cfg.matmul_precision)

            def leg(sgn):
                f = det[None, :] + sgn * z
                if style == "compounded":
                    i_s, i_e = f[:, 0], f[:, 1]
                    disc = jnp.exp(-i_e)
                    fwd = jnp.exp(i_e - i_s)
                    cap = disc * jnp.maximum(fwd - kb, 0.0)
                    flo = disc * jnp.maximum(kb - fwd, 0.0)
                else:
                    avg = jnp.mean(f[:, :m], axis=1)
                    disc = jnp.exp(-f[:, m])
                    cap = delta * disc * jnp.maximum(avg - strike, 0.0)
                    flo = delta * disc * jnp.maximum(strike - avg, 0.0)
                return cap, flo

            cp, fp_ = leg(1.0)
            cm, fm = leg(-1.0)
            c, fl = 0.5 * (cp + cm), 0.5 * (fp_ + fm)
            return jnp.stack([jnp.sum(c), jnp.sum(c * c),
                              jnp.sum(fl), jnp.sum(fl * fl)])

        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks

        def stat(s1, s2):
            mean = s1 / n_tot
            var = jnp.maximum(s2 / n_tot - mean ** 2, 0.0)
            var = var * n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            return mean, jnp.sqrt(var / n_tot)

        return stat(s[0], s[1]) + stat(s[2], s[3])

    return jax.jit(compute)


def price_rfr_caplet(cfg: HWConfig, key, market: MarketCurve = None, *,
                     strike: float, start: float | None = None,
                     end: float | None = None, style: str = "compounded",
                     n_obs: int | None = None, floor: bool = False,
                     sigma=None, n_paths: int | None = None,
                     n_blocks: int = 1, mesh=None) -> RFRResult:
    """Monte Carlo backward-looking RFR caplet (or floorlet) under
    Hull-White: exact functional draws (I at [start, end] for the
    compounded style; r at the observations + I at payment for the
    averaged style), antithetic, blocks keyed on the global index and
    optionally sharded over ``mesh``.  The HW leg is model-internally
    discounted (e^{-I}), so ``market`` is accepted for API uniformity
    but unused.  fp64 oracle: rfr_caplet_closed_form (exact Black /
    Bachelier after the e^{-I_e} tilt — no quadrature)."""
    del market
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    start, end, n_obs = _defaults(cfg, start, end, n_obs, style)
    cap, cap_se, flo, flo_se = _rfr_fn(
        cfg, style, float(strike), start, end, n_obs, int(n_paths),
        int(n_blocks), mesh)(key, jnp.asarray(sigma, jnp.float32))
    price, se = (flo, flo_se) if floor else (cap, cap_se)
    return RFRResult(price=price, std_error=se,
                     n_paths=int(n_paths) * int(n_blocks))


def rfr_caplet_closed_form(cfg: HWConfig, *, strike: float,
                           start: float | None = None,
                           end: float | None = None,
                           style: str = "compounded",
                           n_obs: int | None = None, floor: bool = False,
                           sigma: float | None = None) -> float:
    """float64 RFR caplet/floorlet in closed form (module docstring
    derivation).  Deterministic parts from the exact host affine
    decomposition (bermudan._det_affine), covariances from the shock
    shapes — the same law the sampler integrates."""
    from .bermudan import _det_affine, _step_index
    from .models.oracles import _phi

    if sigma is None:
        sigma = cfg.sigma
    start, end, n_obs = _defaults(cfg, start, end, n_obs, style)
    specs = _specs(start, end, n_obs, style, cfg)
    delta = end - start
    zeta = -1.0 if floor else 1.0

    tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    rA, rB, iA, iB = _det_affine(cfg)
    c0 = 0.5 * (float(sigma) ** 2 - cfg.sigma ** 2)

    def det(kind, t):
        nidx = _step_index(cfg, t) - 1
        return ((rA[nidx] + c0 * rB[nidx]) if kind == "r"
                else (iA[nidx] + c0 * iB[nidx]))

    C = sig * sig * _cov_np(cfg, specs)
    mu_e = det("I", end)
    v_e = C[-1, -1]
    P_e = math.exp(-mu_e + 0.5 * v_e)

    if style == "compounded":
        kb = 1.0 + delta * strike
        mu_s, v_s = det("I", start), C[0, 0]
        P_s = math.exp(-mu_s + 0.5 * v_s)
        v_d = C[0, 0] + C[1, 1] - 2.0 * C[0, 1]
        if v_d <= 0.0:
            fwd = P_s / P_e
            return max(zeta * (fwd - kb), 0.0) * P_e
        s_d = math.sqrt(v_d)
        cov = C[1, 1] - C[0, 1]  # Cov(I_e, dI)
        mu_t = (mu_e - mu_s) - cov
        d2 = (mu_t - math.log(kb)) / s_d
        d1 = d2 + s_d
        return zeta * (P_s * _phi(zeta * d1) - kb * P_e * _phi(zeta * d2))

    m = len(specs) - 1
    mu_a = sum(det("r", t) for _, t in specs[:m]) / m
    var_a = float(np.mean(C[:m, :m]))
    cov_a = float(np.mean(C[:m, m]))
    mu_t = mu_a - cov_a
    s_a = math.sqrt(var_a)
    h = zeta * (mu_t - strike) / s_a
    bach = zeta * (mu_t - strike) * _phi(h) \
        + s_a * math.exp(-0.5 * h * h) / math.sqrt(2.0 * math.pi)
    return delta * P_e * bach


def vega_rfr_caplet(cfg: HWConfig, key, market: MarketCurve = None, *,
                    strike: float, start: float | None = None,
                    end: float | None = None, style: str = "compounded",
                    n_obs: int | None = None, floor: bool = False,
                    sigma=None, n_paths: int | None = None,
                    n_blocks: int = 1, mesh=None):
    """(price, vega) by one jax.jvp through the sigma-scalar form (sigma
    enters only via sig_st and the affine drift — the library-wide
    invariant that makes the tangent exact)."""
    del market
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    start, end, n_obs = _defaults(cfg, start, end, n_obs, style)
    fn = _rfr_fn(cfg, style, float(strike), start, end, n_obs,
                 int(n_paths), int(n_blocks), mesh)
    idx = 2 if floor else 0
    out, tang = jax.jvp(lambda s: fn(key, s)[idx],
                        (jnp.asarray(sigma, jnp.float32),),
                        (jnp.float32(1.0),))
    return out, tang


# ---------------------------------------------------------------------------
# G2++ twins
# ---------------------------------------------------------------------------

def _v_prime(g, t: float) -> float:
    """V'(t) = d/dt Var(int_0^t (x+y)): sig^2 Ba(t)^2 + eta^2 Bb(t)^2
    + 2 rho sig eta Ba(t) Bb(t) — the phi(t) adjustment term."""
    from .models.g2pp import _B

    ba, bb = _B(g.a, t), _B(g.b, t)
    return (g.sigma * g.sigma * ba * ba + g.eta * g.eta * bb * bb
            + 2.0 * g.rho * g.sigma * g.eta * ba * bb)


def _specs_g2(start: float, end: float, n_obs, style: str,
              cfg: HWConfig):
    if style == "compounded":
        return (("I", start), ("I", end))
    obs = _obs_dates(cfg, start, end, n_obs)
    return tuple([("u", t, 1.0, 1.0) for t in obs] + [("I", end)])


@lru_cache(maxsize=None)
def _rfr_fn_g2(cfg: HWConfig, g, style: str, strike: float, start: float,
               end: float, n_obs, n_paths: int, n_blocks: int, mesh):
    from .models.g2pp import _g2_functional_chol, _v_integral

    specs = _specs_g2(start, end, n_obs, style, cfg)
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    delta = end - start
    kb = 1.0 + delta * strike
    m = len(specs) - 1
    v_s, v_e = _v_integral(g, start), _v_integral(g, end)
    obs = () if style == "compounded" else _obs_dates(cfg, start, end,
                                                      n_obs)

    def compute(key, market):
        P_s = hw.interp_curve(market.P, jnp.float32(start), cfg)
        P_e = hw.interp_curve(market.P, jnp.float32(end), cfg)
        disc0 = P_e * jnp.exp(jnp.float32(-0.5 * v_e))
        fwd0 = (P_s / P_e) * jnp.exp(jnp.float32(0.5 * (v_e - v_s)))
        if style == "averaged":
            phis = jnp.stack(
                [hw.interp_curve(market.f, jnp.float32(t), cfg)
                 + jnp.float32(0.5 * _v_prime(g, t)) for t in obs])

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, len(specs)), jnp.float32)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                disc = disc0 * jnp.exp(-sgn * z[:, m])
                if style == "compounded":
                    fwd = fwd0 * jnp.exp(sgn * (z[:, 1] - z[:, 0]))
                    cap = disc * jnp.maximum(fwd - kb, 0.0)
                    flo = disc * jnp.maximum(kb - fwd, 0.0)
                else:
                    avg = jnp.mean(phis[None, :] + sgn * z[:, :m], axis=1)
                    cap = delta * disc * jnp.maximum(avg - strike, 0.0)
                    flo = delta * disc * jnp.maximum(strike - avg, 0.0)
                return cap, flo

            cp, fp_ = leg(1.0)
            cm, fm = leg(-1.0)
            c, fl = 0.5 * (cp + cm), 0.5 * (fp_ + fm)
            return jnp.stack([jnp.sum(c), jnp.sum(c * c),
                              jnp.sum(fl), jnp.sum(fl * fl)])

        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks

        def stat(s1, s2):
            mean = s1 / n_tot
            var = jnp.maximum(s2 / n_tot - mean ** 2, 0.0)
            var = var * n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            return mean, jnp.sqrt(var / n_tot)

        return stat(s[0], s[1]) + stat(s[2], s[3])

    return jax.jit(compute)


def price_rfr_caplet_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                        strike: float, start: float | None = None,
                        end: float | None = None,
                        style: str = "compounded",
                        n_obs: int | None = None, floor: bool = False,
                        n_paths: int | None = None, n_blocks: int = 1,
                        mesh=None) -> RFRResult:
    """G2++ twin of price_rfr_caplet: the compounded style samples
    (I(start), I(end)); the averaged style samples the unit strip
    projection x + y at the observations (r = phi + x + y, phi(t) =
    f(0,t) + V'(t)/2) plus I at payment.  Market-consistent
    discounting.  fp64 oracle: rfr_caplet_closed_form_g2."""
    if n_paths is None:
        n_paths = cfg.n_paths
    start, end, n_obs = _defaults(cfg, start, end, n_obs, style)
    cap, cap_se, flo, flo_se = _rfr_fn_g2(
        cfg, g, style, float(strike), start, end, n_obs, int(n_paths),
        int(n_blocks), mesh)(key, market)
    price, se = (flo, flo_se) if floor else (cap, cap_se)
    return RFRResult(price=price, std_error=se,
                     n_paths=int(n_paths) * int(n_blocks))


def rfr_caplet_closed_form_g2(cfg: HWConfig, g, market: MarketCurve, *,
                              strike: float, start: float | None = None,
                              end: float | None = None,
                              style: str = "compounded",
                              n_obs: int | None = None,
                              floor: bool = False) -> float:
    """float64 G2++ RFR caplet/floorlet: the same Black / Bachelier
    closed forms with covariances read off _g2_functional_cov (the
    sampler's own matrix) and market P/f interpolated in fp64."""
    from .models.g2pp import _g2_functional_cov, _v_integral
    from .models.oracles import _phi

    start, end, n_obs = _defaults(cfg, start, end, n_obs, style)
    specs = _specs_g2(start, end, n_obs, style, cfg)
    delta = end - start
    zeta = -1.0 if floor else 1.0
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    P_s = float(np.interp(start, Ts, P0))
    P_e = float(np.interp(end, Ts, P0))
    v_s, v_e = _v_integral(g, start), _v_integral(g, end)
    C = _g2_functional_cov(g, specs)

    if style == "compounded":
        kb = 1.0 + delta * strike
        v_d = C[0, 0] + C[1, 1] - 2.0 * C[0, 1]
        if v_d <= 0.0:
            return max(zeta * (P_s / P_e - kb), 0.0) * P_e
        s_d = math.sqrt(v_d)
        cov = C[1, 1] - C[0, 1]
        mu_t = math.log(P_s / P_e) + 0.5 * (v_e - v_s) - cov
        d2 = (mu_t - math.log(kb)) / s_d
        d1 = d2 + s_d
        return zeta * (P_s * _phi(zeta * d1) - kb * P_e * _phi(zeta * d2))

    m = len(specs) - 1
    f0 = np.asarray(market.f, np.float64)
    obs = _obs_dates(cfg, start, end, n_obs)
    mu_a = float(np.mean([np.interp(t, Ts, f0) + 0.5 * _v_prime(g, t)
                          for t in obs]))
    var_a = float(np.mean(C[:m, :m]))
    cov_a = float(np.mean(C[:m, m]))
    mu_t = mu_a - cov_a
    s_a = math.sqrt(var_a)
    h = zeta * (mu_t - strike) / s_a
    bach = zeta * (mu_t - strike) * _phi(h) \
        + s_a * math.exp(-0.5 * h * h) / math.sqrt(2.0 * math.pi)
    return delta * P_e * bach
