"""Backward-looking RFR (overnight-rate) caps, caplets and floorlets.

Post-LIBOR products on the model's own realized short rate over accrual
periods [t_j, t_{j+1}] (the SOFR/ESTR convention family):

  * **compounded**: the continuously-compounded setting of the daily
    compound, R_j = (e^{I(t_{j+1}) - I(t_j)} - 1) / delta_j with
    I(t) = int_0^t r du the model's discount integral — exactly the
    quantity every engine in this repo already integrates.  Payoff at
    t_{j+1}: delta_j * max(zeta (R_j - K), 0), zeta = +1 cap / -1 floor.
  * **averaged**: the arithmetic average A_j = (1/m) sum_i r(t_i) over m
    right-endpoint observation dates per period.  Payoff at t_{j+1}:
    delta_j * max(zeta (A_j - K), 0).

A cap/floor is the strip over a schedule; a caplet is the one-period
strip.  Both styles are *exact* products of the multi-date functional
machinery (bermudan._functional_chol / g2pp._g2_functional_cov): the
payoff touches only Gaussian functionals (I at the period boundaries;
r at observations plus I at payments), so the MC draws them directly
from ONE joint Cholesky — no path scan — and the fp64 oracles are
closed form per period:

  compounded: tilt by e^{-I_e} (Gaussian change of measure) makes
    e^{dI} lognormal => a Black formula,
      caplet = P_s Phi(d1) - Kb P_e Phi(d2),   Kb = 1 + delta K,
      d2 = (mu~ - ln Kb)/s_D, d1 = d2 + s_D,
      mu~ = E[dI] - Cov(I_e, dI),  s_D^2 = Var dI,
    where P_t = E[e^{-I(t)}] is the model zero-coupon bond.
  averaged: the same tilt shifts the Gaussian average's mean by
    -Cov(A, I_e) => a Bachelier formula,
      caplet = delta P_e [ (mu~_A - K) Phi(h) + s_A phi(h) ],
      h = (mu~_A - K)/s_A.

Derivations: docs/MATH.md section 37.  Reference anchor: the product
layer of /root/reference/src/2_option_pricing.cu:14-35
(simulate_ZBC_control_variate — the single-functional e^{-I} payoff
this family generalizes); the closed-form validation style mirrors the
reference's analytic ZBC gate (2_option_pricing.cu:498-516).

G2++ twins ride the identical structure: I and dI are Gaussian under
G2++ too, and r(t) = phi(t) + x(t) + y(t) with phi(t) = f(0,t)
+ V'(t)/2, so the averaged twin samples the unit strip projection
("u", t, 1, 1) = x + y.  Discounting is market-consistent:
E[e^{-I_full(t)}] = P(0,t) by construction of phi.

``rqmc=True`` draws each block from a digitally-shifted Sobol sequence
(parallel.mesh.block_normals); the per-block shifts are the independent
replicates, so SEs are reported across blocks (n_blocks >= 2).
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
    caplets: jax.Array  # (n_periods,) per-period MC values
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


def _bounds(cfg: HWConfig, start, end, tenor, freq, n_obs, style):
    """Period boundaries (t_0, ..., t_n) and per-period observation
    count from either (start, end) single-caplet or (start, tenor,
    freq) strip arguments."""
    if start is None:
        start = cfg.s1
    start = _check_grid(cfg, start, "start")
    if end is not None:
        end = _check_grid(cfg, end, "end")
        if end <= start:
            raise ValueError("end must exceed start")
        bounds = (start, end)
    else:
        if tenor is None:
            tenor = 10 * cfg.mat_spacing
        n = int(round(tenor * freq))
        if n < 1:
            raise ValueError("tenor * freq must be >= 1")
        bounds = tuple(start + j / freq for j in range(n + 1))
        for t in bounds[1:]:
            _check_grid(cfg, t, "period boundary")
    if style not in ("compounded", "averaged"):
        raise ValueError(f"unknown RFR style {style!r}")
    if style == "averaged" and n_obs is None:
        n_obs = int(round((bounds[1] - bounds[0]) / cfg.dt))
    return bounds, n_obs


def _specs(bounds: tuple, n_obs, style: str, cfg: HWConfig):
    if style == "compounded":
        return tuple(("I", t) for t in bounds)
    obs = [t for j in range(len(bounds) - 1)
           for t in _obs_dates(cfg, bounds[j], bounds[j + 1], n_obs)]
    return tuple([("r", t) for t in obs]
                 + [("I", t) for t in bounds[1:]])


def _cov_np(cfg: HWConfig, specs: tuple) -> np.ndarray:
    """fp64 covariance of the spec functionals per unit sig_st — the
    oracle-side mirror of bermudan._functional_chol, INCLUDING its
    RIDGE*I jitter so the closed forms integrate exactly the law the
    sampler draws from (the G2 oracle reuses _g2_functional_cov for the
    same reason).  Without the ridge the two laws differ at the 1e-9
    variance level — far below the ~1e-4 z-gate SEs, but an avoidable
    asymmetry for near-degenerate specs (periods short enough that
    Var(dI) approaches the ridge scale)."""
    from .bermudan import RIDGE, _step_index

    U = np.zeros((cfg.n_steps, len(specs)))
    for c, (kind, t) in enumerate(specs):
        n = _step_index(cfg, t)
        u, w = _shock_shapes(cfg, n)
        U[:n, c] = np.asarray(u if kind == "r" else w, np.float64)
    return U.T @ U + RIDGE * np.eye(len(specs))


def _strip_stats(per_block, n_paths: int, n_blocks: int, n: int,
                 rqmc: bool):
    """(cap, cap_se, flo, flo_se, cap_per, flo_per) from the stacked
    per-block sums [capsum, capsq, flosum, flosq, cap_per(n),
    flo_per(n)]."""
    s = jnp.sum(per_block, axis=0)
    n_tot = 1.0 * n_paths * n_blocks

    def stat(s1, s2, col):
        mean = s1 / n_tot
        if rqmc:
            se = jnp.std(per_block[:, col] / n_paths, ddof=1) \
                / jnp.sqrt(1.0 * n_blocks)
        else:
            var = jnp.maximum(s2 / n_tot - mean ** 2, 0.0)
            var = var * n_tot / jnp.maximum(n_tot - 1.0, 1.0)
            se = jnp.sqrt(var / n_tot)
        return mean, se

    cap, cap_se = stat(s[0], s[1], 0)
    flo, flo_se = stat(s[2], s[3], 2)
    return cap, cap_se, flo, flo_se, s[4:4 + n] / n_tot, s[4 + n:] / n_tot


# ---------------------------------------------------------------------------
# Hull-White
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _rfr_fn(cfg: HWConfig, style: str, strike: float, bounds: tuple,
            n_obs, n_paths: int, n_blocks: int, rqmc: bool, mesh):
    from .bermudan import _functional_chol, _functional_det

    specs = _specs(bounds, n_obs, style, cfg)
    LT = jnp.asarray(_functional_chol(cfg, specs))
    n = len(bounds) - 1
    deltas = jnp.asarray([bounds[j + 1] - bounds[j] for j in range(n)],
                         jnp.float32)
    kbs = 1.0 + deltas * strike
    m = 0 if style == "compounded" else n * n_obs

    def compute(key, sigma):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, len(specs), rqmc)
            z = tables.sig_st * jnp.dot(
                x, LT, preferred_element_type=jnp.float32,
                precision=cfg.matmul_precision)

            def leg(sgn):
                f = det[None, :] + sgn * z
                if style == "compounded":
                    i_b = f  # (paths, n+1) at the boundaries
                    disc = jnp.exp(-i_b[:, 1:])
                    fwd = jnp.exp(i_b[:, 1:] - i_b[:, :-1])
                    cap = disc * jnp.maximum(fwd - kbs[None, :], 0.0)
                    flo = disc * jnp.maximum(kbs[None, :] - fwd, 0.0)
                else:
                    avg = jnp.mean(f[:, :m].reshape(-1, n, n_obs), axis=2)
                    disc = jnp.exp(-f[:, m:])
                    cap = deltas[None, :] * disc \
                        * jnp.maximum(avg - strike, 0.0)
                    flo = deltas[None, :] * disc \
                        * jnp.maximum(strike - avg, 0.0)
                return cap, flo

            cp, fp_ = leg(1.0)
            cm, fm = leg(-1.0)
            c, fl = 0.5 * (cp + cm), 0.5 * (fp_ + fm)
            ct, ft = jnp.sum(c, axis=1), jnp.sum(fl, axis=1)
            return jnp.concatenate([
                jnp.stack([jnp.sum(ct), jnp.sum(ct * ct),
                           jnp.sum(ft), jnp.sum(ft * ft)]),
                jnp.sum(c, axis=0), jnp.sum(fl, axis=0)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        return _strip_stats(per_block, n_paths, n_blocks, n, rqmc)

    return jax.jit(compute)


def _common(cfg, n_paths, n_blocks, rqmc):
    if n_paths is None:
        n_paths = cfg.n_paths
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    return int(n_paths)


def price_rfr_cap(cfg: HWConfig, key, market: MarketCurve = None, *,
                  strike: float, start: float | None = None,
                  end: float | None = None, tenor: float | None = None,
                  freq: float = 1.0, style: str = "compounded",
                  n_obs: int | None = None, floor: bool = False,
                  sigma=None, n_paths: int | None = None,
                  n_blocks: int = 1, rqmc: bool = False,
                  mesh=None) -> RFRResult:
    """Monte Carlo backward-looking RFR cap (or floor) under Hull-White:
    a strip of compounded or averaged caplets over [start, start+tenor]
    at ``freq`` periods/year (or a single caplet when ``end`` is given),
    all periods drawn from ONE exact joint functional sample
    (antithetic; optionally RQMC), blocks keyed on the global index and
    optionally sharded over ``mesh``.  The HW leg is model-internally
    discounted (e^{-I}), so ``market`` is accepted for API uniformity
    but unused.  fp64 oracle: rfr_cap_closed_form (exact per-period
    Black / Bachelier after the e^{-I_e} tilt — no quadrature)."""
    del market
    if sigma is None:
        sigma = cfg.sigma
    n_paths = _common(cfg, n_paths, n_blocks, rqmc)
    bounds, n_obs = _bounds(cfg, start, end, tenor, freq, n_obs, style)
    cap, cap_se, flo, flo_se, cper, fper = _rfr_fn(
        cfg, style, float(strike), bounds, n_obs, n_paths,
        int(n_blocks), bool(rqmc), mesh)(
            key, jnp.asarray(sigma, jnp.float32))
    price, se, per = ((flo, flo_se, fper) if floor
                      else (cap, cap_se, cper))
    return RFRResult(price=price, std_error=se, caplets=per,
                     n_paths=n_paths * int(n_blocks))


def price_rfr_caplet(cfg: HWConfig, key, market: MarketCurve = None, *,
                     strike: float, start: float | None = None,
                     end: float | None = None, style: str = "compounded",
                     n_obs: int | None = None, floor: bool = False,
                     sigma=None, n_paths: int | None = None,
                     n_blocks: int = 1, rqmc: bool = False,
                     mesh=None) -> RFRResult:
    """Single backward-looking RFR caplet/floorlet: the one-period strip
    over [start, end] (defaults: [s1, s1 + one maturity decade])."""
    if end is None:
        s = cfg.s1 if start is None else start
        end = s + 10 * cfg.mat_spacing
    return price_rfr_cap(cfg, key, market, strike=strike, start=start,
                         end=end, style=style, n_obs=n_obs, floor=floor,
                         sigma=sigma, n_paths=n_paths, n_blocks=n_blocks,
                         rqmc=rqmc, mesh=mesh)


def rfr_cap_closed_form(cfg: HWConfig, *, strike: float,
                        start: float | None = None,
                        end: float | None = None,
                        tenor: float | None = None, freq: float = 1.0,
                        style: str = "compounded",
                        n_obs: int | None = None, floor: bool = False,
                        sigma: float | None = None):
    """(total, per-period list): float64 RFR cap/floor in closed form
    (module docstring / docs/MATH.md section 37).  Deterministic parts
    from the exact host affine decomposition (bermudan._det_affine),
    covariances from the shock shapes — the same law the sampler
    integrates."""
    from .bermudan import _det_affine, _step_index
    from .models.oracles import _phi

    if sigma is None:
        sigma = cfg.sigma
    bounds, n_obs = _bounds(cfg, start, end, tenor, freq, n_obs, style)
    zeta = -1.0 if floor else 1.0

    tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    rA, rB, iA, iB = _det_affine(cfg)
    c0 = 0.5 * (float(sigma) ** 2 - cfg.sigma ** 2)

    def det(kind, t):
        nidx = _step_index(cfg, t) - 1
        return ((rA[nidx] + c0 * rB[nidx]) if kind == "r"
                else (iA[nidx] + c0 * iB[nidx]))

    per = []
    for j in range(len(bounds) - 1):
        s_, e_ = bounds[j], bounds[j + 1]
        delta = e_ - s_
        specs = _specs((s_, e_), n_obs, style, cfg)
        C = sig * sig * _cov_np(cfg, specs)
        mu_e, v_e = det("I", e_), C[-1, -1]
        P_e = math.exp(-mu_e + 0.5 * v_e)
        if style == "compounded":
            kb = 1.0 + delta * strike
            mu_s, v_s = det("I", s_), C[0, 0]
            P_s = math.exp(-mu_s + 0.5 * v_s)
            v_d = C[0, 0] + C[1, 1] - 2.0 * C[0, 1]
            if v_d <= 0.0:
                per.append(max(zeta * (P_s / P_e - kb), 0.0) * P_e)
                continue
            s_d = math.sqrt(v_d)
            cov = C[1, 1] - C[0, 1]  # Cov(I_e, dI)
            mu_t = (mu_e - mu_s) - cov
            d2 = (mu_t - math.log(kb)) / s_d
            d1 = d2 + s_d
            per.append(zeta * (P_s * _phi(zeta * d1)
                               - kb * P_e * _phi(zeta * d2)))
        else:
            mm = len(specs) - 1
            mu_a = sum(det("r", t) for _, t in specs[:mm]) / mm
            var_a = float(np.mean(C[:mm, :mm]))
            cov_a = float(np.mean(C[:mm, mm]))
            mu_t = mu_a - cov_a
            s_a = math.sqrt(var_a)
            h = zeta * (mu_t - strike) / s_a
            bach = zeta * (mu_t - strike) * _phi(h) \
                + s_a * math.exp(-0.5 * h * h) / math.sqrt(2.0 * math.pi)
            per.append(delta * P_e * bach)
    return sum(per), per


def rfr_caplet_closed_form(cfg: HWConfig, *, strike: float,
                           start: float | None = None,
                           end: float | None = None,
                           style: str = "compounded",
                           n_obs: int | None = None, floor: bool = False,
                           sigma: float | None = None) -> float:
    """float64 single RFR caplet/floorlet (one-period strip)."""
    if end is None:
        s = cfg.s1 if start is None else start
        end = s + 10 * cfg.mat_spacing
    return rfr_cap_closed_form(cfg, strike=strike, start=start, end=end,
                               style=style, n_obs=n_obs, floor=floor,
                               sigma=sigma)[0]


def vega_rfr_cap(cfg: HWConfig, key, market: MarketCurve = None, *,
                 strike: float, start: float | None = None,
                 end: float | None = None, tenor: float | None = None,
                 freq: float = 1.0, style: str = "compounded",
                 n_obs: int | None = None, floor: bool = False,
                 sigma=None, n_paths: int | None = None,
                 n_blocks: int = 1, rqmc: bool = False, mesh=None):
    """(price, vega) by one jax.jvp through the sigma-scalar form (sigma
    enters only via sig_st and the affine drift — the library-wide
    invariant that makes the tangent exact)."""
    del market
    if sigma is None:
        sigma = cfg.sigma
    n_paths = _common(cfg, n_paths, n_blocks, rqmc)
    bounds, n_obs = _bounds(cfg, start, end, tenor, freq, n_obs, style)
    fn = _rfr_fn(cfg, style, float(strike), bounds, n_obs, n_paths,
                 int(n_blocks), bool(rqmc), mesh)
    idx = 2 if floor else 0
    out, tang = jax.jvp(lambda s: fn(key, s)[idx],
                        (jnp.asarray(sigma, jnp.float32),),
                        (jnp.float32(1.0),))
    return out, tang


def vega_rfr_caplet(cfg: HWConfig, key, market: MarketCurve = None, *,
                    strike: float, start: float | None = None,
                    end: float | None = None, style: str = "compounded",
                    n_obs: int | None = None, floor: bool = False,
                    sigma=None, n_paths: int | None = None,
                    n_blocks: int = 1, rqmc: bool = False, mesh=None):
    """(price, vega) for the SINGLE one-period caplet, applying
    price_rfr_caplet's end-default (end = start + one maturity decade)
    before delegating — a bare alias to vega_rfr_cap would instead fall
    through to _bounds' multi-period strip default (tenor=10*mat_spacing
    at freq=1) and silently price a different instrument."""
    if end is None:
        s = cfg.s1 if start is None else start
        end = s + 10 * cfg.mat_spacing
    return vega_rfr_cap(cfg, key, market, strike=strike, start=start,
                        end=end, style=style, n_obs=n_obs, floor=floor,
                        sigma=sigma, n_paths=n_paths, n_blocks=n_blocks,
                        rqmc=rqmc, mesh=mesh)


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


def _specs_g2(bounds: tuple, n_obs, style: str, cfg: HWConfig):
    if style == "compounded":
        return tuple(("I", t) for t in bounds)
    obs = [t for j in range(len(bounds) - 1)
           for t in _obs_dates(cfg, bounds[j], bounds[j + 1], n_obs)]
    return tuple([("u", t, 1.0, 1.0) for t in obs]
                 + [("I", t) for t in bounds[1:]])


@lru_cache(maxsize=None)
def _rfr_fn_g2(cfg: HWConfig, g, style: str, strike: float, bounds: tuple,
               n_obs, n_paths: int, n_blocks: int, rqmc: bool, mesh):
    from .models.g2pp import _g2_functional_chol, _v_integral

    specs = _specs_g2(bounds, n_obs, style, cfg)
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    n = len(bounds) - 1
    deltas = jnp.asarray([bounds[j + 1] - bounds[j] for j in range(n)],
                         jnp.float32)
    kbs = 1.0 + deltas * strike
    m = 0 if style == "compounded" else n * n_obs
    vs = [_v_integral(g, t) for t in bounds]
    obs = () if style == "compounded" else [
        t for j in range(n)
        for t in _obs_dates(cfg, bounds[j], bounds[j + 1], n_obs)]

    def compute(key, market):
        P = [hw.interp_curve(market.P, jnp.float32(t), cfg)
             for t in bounds]
        disc0 = jnp.stack([P[j + 1] * jnp.exp(jnp.float32(-0.5 * vs[j + 1]))
                           for j in range(n)])
        fwd0 = jnp.stack([(P[j] / P[j + 1])
                          * jnp.exp(jnp.float32(0.5 * (vs[j + 1] - vs[j])))
                          for j in range(n)])
        if style == "averaged":
            phis = jnp.stack(
                [hw.interp_curve(market.f, jnp.float32(t), cfg)
                 + jnp.float32(0.5 * _v_prime(g, t))
                 for t in obs]).reshape(n, n_obs)

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, len(specs), rqmc)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                if style == "compounded":
                    i_b = sgn * z  # (paths, n+1), centered
                    disc = disc0[None, :] * jnp.exp(-i_b[:, 1:])
                    fwd = fwd0[None, :] * jnp.exp(i_b[:, 1:] - i_b[:, :-1])
                    cap = disc * jnp.maximum(fwd - kbs[None, :], 0.0)
                    flo = disc * jnp.maximum(kbs[None, :] - fwd, 0.0)
                else:
                    avg = jnp.mean(phis[None, :, :]
                                   + sgn * z[:, :m].reshape(-1, n, n_obs),
                                   axis=2)
                    disc = disc0[None, :] * jnp.exp(-sgn * z[:, m:])
                    cap = deltas[None, :] * disc \
                        * jnp.maximum(avg - strike, 0.0)
                    flo = deltas[None, :] * disc \
                        * jnp.maximum(strike - avg, 0.0)
                return cap, flo

            cp, fp_ = leg(1.0)
            cm, fm = leg(-1.0)
            c, fl = 0.5 * (cp + cm), 0.5 * (fp_ + fm)
            ct, ft = jnp.sum(c, axis=1), jnp.sum(fl, axis=1)
            return jnp.concatenate([
                jnp.stack([jnp.sum(ct), jnp.sum(ct * ct),
                           jnp.sum(ft), jnp.sum(ft * ft)]),
                jnp.sum(c, axis=0), jnp.sum(fl, axis=0)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        return _strip_stats(per_block, n_paths, n_blocks, n, rqmc)

    return jax.jit(compute)


def price_rfr_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                     strike: float, start: float | None = None,
                     end: float | None = None, tenor: float | None = None,
                     freq: float = 1.0, style: str = "compounded",
                     n_obs: int | None = None, floor: bool = False,
                     n_paths: int | None = None, n_blocks: int = 1,
                     rqmc: bool = False, mesh=None) -> RFRResult:
    """G2++ twin of price_rfr_cap: the compounded style samples I at the
    period boundaries; the averaged style samples the unit strip
    projection x + y at the observations (r = phi + x + y, phi(t) =
    f(0,t) + V'(t)/2) plus I at the payments.  Market-consistent
    discounting.  fp64 oracle: rfr_cap_closed_form_g2."""
    n_paths = _common(cfg, n_paths, n_blocks, rqmc)
    bounds, n_obs = _bounds(cfg, start, end, tenor, freq, n_obs, style)
    cap, cap_se, flo, flo_se, cper, fper = _rfr_fn_g2(
        cfg, g, style, float(strike), bounds, n_obs, n_paths,
        int(n_blocks), bool(rqmc), mesh)(key, market)
    price, se, per = ((flo, flo_se, fper) if floor
                      else (cap, cap_se, cper))
    return RFRResult(price=price, std_error=se, caplets=per,
                     n_paths=n_paths * int(n_blocks))


def price_rfr_caplet_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                        strike: float, start: float | None = None,
                        end: float | None = None,
                        style: str = "compounded",
                        n_obs: int | None = None, floor: bool = False,
                        n_paths: int | None = None, n_blocks: int = 1,
                        rqmc: bool = False, mesh=None) -> RFRResult:
    """Single G2++ RFR caplet/floorlet (one-period strip)."""
    if end is None:
        s = cfg.s1 if start is None else start
        end = s + 10 * cfg.mat_spacing
    return price_rfr_cap_g2(cfg, g, key, market, strike=strike,
                            start=start, end=end, style=style,
                            n_obs=n_obs, floor=floor, n_paths=n_paths,
                            n_blocks=n_blocks, rqmc=rqmc, mesh=mesh)


def rfr_cap_closed_form_g2(cfg: HWConfig, g, market: MarketCurve, *,
                           strike: float, start: float | None = None,
                           end: float | None = None,
                           tenor: float | None = None, freq: float = 1.0,
                           style: str = "compounded",
                           n_obs: int | None = None, floor: bool = False):
    """(total, per-period list): float64 G2++ RFR cap/floor — the same
    Black / Bachelier closed forms per period with covariances read off
    _g2_functional_cov (the sampler's own matrix) and market P/f
    interpolated in fp64."""
    from .models.g2pp import _g2_functional_cov, _v_integral
    from .models.oracles import _phi

    bounds, n_obs = _bounds(cfg, start, end, tenor, freq, n_obs, style)
    zeta = -1.0 if floor else 1.0
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    f0 = np.asarray(market.f, np.float64)

    per = []
    for j in range(len(bounds) - 1):
        s_, e_ = bounds[j], bounds[j + 1]
        delta = e_ - s_
        specs = _specs_g2((s_, e_), n_obs, style, cfg)
        C = _g2_functional_cov(g, specs)
        P_s = float(np.interp(s_, Ts, P0))
        P_e = float(np.interp(e_, Ts, P0))
        v_s, v_e = _v_integral(g, s_), _v_integral(g, e_)
        if style == "compounded":
            kb = 1.0 + delta * strike
            v_d = C[0, 0] + C[1, 1] - 2.0 * C[0, 1]
            if v_d <= 0.0:
                per.append(max(zeta * (P_s / P_e - kb), 0.0) * P_e)
                continue
            s_d = math.sqrt(v_d)
            cov = C[1, 1] - C[0, 1]
            mu_t = math.log(P_s / P_e) + 0.5 * (v_e - v_s) - cov
            d2 = (mu_t - math.log(kb)) / s_d
            d1 = d2 + s_d
            per.append(zeta * (P_s * _phi(zeta * d1)
                               - kb * P_e * _phi(zeta * d2)))
        else:
            mm = len(specs) - 1
            obs = _obs_dates(cfg, s_, e_, n_obs)
            mu_a = float(np.mean([np.interp(t, Ts, f0)
                                  + 0.5 * _v_prime(g, t) for t in obs]))
            var_a = float(np.mean(C[:mm, :mm]))
            cov_a = float(np.mean(C[:mm, mm]))
            mu_t = mu_a - cov_a
            s_a = math.sqrt(var_a)
            h = zeta * (mu_t - strike) / s_a
            bach = zeta * (mu_t - strike) * _phi(h) \
                + s_a * math.exp(-0.5 * h * h) / math.sqrt(2.0 * math.pi)
            per.append(delta * P_e * bach)
    return sum(per), per


def rfr_caplet_closed_form_g2(cfg: HWConfig, g, market: MarketCurve, *,
                              strike: float, start: float | None = None,
                              end: float | None = None,
                              style: str = "compounded",
                              n_obs: int | None = None,
                              floor: bool = False) -> float:
    """float64 single G2++ RFR caplet/floorlet (one-period strip)."""
    if end is None:
        s = cfg.s1 if start is None else start
        end = s + 10 * cfg.mat_spacing
    return rfr_cap_closed_form_g2(cfg, g, market, strike=strike,
                                  start=start, end=end, style=style,
                                  n_obs=n_obs, floor=floor)[0]
