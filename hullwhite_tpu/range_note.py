"""Puttable (Bermudan-callable) range-accrual note.

The flagship callable exotic: a note paying per period the range-accrual
coupon coupon * tau * (1/m) sum_i 1{lo <= L(t_ji) <= hi} at T_{j+1}
(observations t_ji = T_j + i tau/m), redeeming 1 at T_n, and PUTTABLE by
the holder at par at every interior period boundary T_1..T_{n-1}: putting
at T_k collects the period-(k-1) coupon plus 1 at T_k and forfeits the
rest.  This widens the reference's single European option (the product
layer, src/2_option_pricing.cu:14-35) to a path-dependent Bermudan.

Under one-factor Hull-White the decision state at T_j is r(T_j) alone, so

* the fp64 oracle is a 1-d value iteration on an r-grid
  (``dp_oracle_range_note``): per period the coupon's conditional value
  is CLOSED FORM (tilted Gaussian Phi differences, the conditional
  version of ``instruments.range_accrual_closed_form``), and the
  continuation is a dense Gaussian-kernel average of the next date's
  value function (NOT Gauss-Hermite: the value function carries narrow
  indicator features that sparse nodes straddle) — the same
  Gaussian-projection conditioning the Bermudan machinery uses
  (bermudan._interval_params);
* the optimal policy is a threshold: put when r(T_j) > r*_j (high rates
  shrink both the in-band accrual probability and the discounted
  redemption, so continuation is decreasing in r while par is constant);
  the boundary is read off the DP continuation by inverse interpolation;
* the MC estimator applies the FIXED threshold policy to exactly-sampled
  multi-date (r, I) states (any fixed policy gives an unbiased lower
  bound; with the DP threshold it reproduces the DP value to MC noise),
  with the NON-callable note as a control variate (its expectation is
  exact closed form via ``range_accrual_closed_form`` — the CV removes
  the common coupon/redemption noise, leaving only the rare put paths).

Engine invariants kept: blocks key on the GLOBAL block index, sigma
enters only through the scalar multiplier ``tables.sig_st``, every
product takes n_blocks/mesh.
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

_nphi = np.vectorize(lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2.0))))

try:
    from scipy.special import ndtr as _ndtr
except ImportError:                          # pragma: no cover
    _ndtr = _nphi


def _hermite_slopes(xs, Wv, brk):
    """Per-node derivative estimates for the C^1 cubic-Hermite
    interpolant of (xs, Wv), segment-aware: ``brk`` marks zero-width
    cells (double nodes carrying jumps) and no slope ever differences
    across one — nodes adjacent to a break get the one-sided estimate
    from their own segment.  Wv is (G,) or (G, L); returns like Wv."""
    h = np.diff(xs)
    sl = np.diff(Wv, axis=0) / (h[:, None] if Wv.ndim > 1 else h)
    m = np.zeros_like(Wv, dtype=np.float64)
    hl, hr = h[:-1], h[1:]                      # cells left/right of node k
    bl, br = brk[:-1], brk[1:]
    # interior: 3-point weighted slope; one-sided when a side is a break
    wgt = lambda a: a[:, None] if Wv.ndim > 1 else a   # noqa: E731
    interior = (wgt(hr) * sl[:-1] + wgt(hl) * sl[1:]) / wgt(hl + hr)
    pick = np.where(wgt(bl & ~br), sl[1:],
                    np.where(wgt(br & ~bl), sl[:-1],
                             np.where(wgt(bl & br), 0.0, interior)))
    m[1:-1] = pick
    m[0] = np.where(brk[0], 0.0, sl[0])
    m[-1] = np.where(brk[-1], 0.0, sl[-1])
    return m


def _kernel_avg(mu, s, xs, Wv, order="linear"):
    """E[W(Y)], Y ~ N(mu, s^2) per element of mu, integrating an
    interpolant of (xs, Wv) EXACTLY against the Gaussian kernel cell by
    cell (Phi/phi closed forms), with constant extension beyond the
    grid.  Exact-cell integration — NOT Gauss-Hermite or trapezoid —
    because W carries observation indicators: narrow discontinuous
    features that sparse nodes straddle (measured: the t=T_j
    observation integrated to 0 under GH-48, and to ~1e-4 error under
    an 801-point trapezoid).

    order="linear": the piecewise-linear interpolant (the round-3
    behavior — O(h^2) convexity bias on smooth surfaces).
    order="cubic": adds the exact cell integral of the C^1
    cubic-Hermite correction (three extra moment matmuls; zero-width
    cells — the double nodes that carry jumps — and their neighbors
    fall back one-sidedly, so jump features are untouched).  Kills the
    (u, w) DPs' measured O(h^2) bias (VERDICT r3 #5): the degenerate
    G2 snowball probe drops +4.9e-5 -> ~1e-7 at the same grid.

    Wv may be (G,) -> returns (M,), or (G, L) for L value functions on
    the shared grid -> returns (M, L) (one dPhi assembly serves all
    columns; the integral is linear in the values — the snowball and
    two-factor DPs batch their coupon levels / outer nodes this way)."""
    mu = np.atleast_1d(np.asarray(mu, np.float64))
    z = (xs[None, :] - mu[:, None]) / s                # (M, G)
    Phi = _ndtr(z)
    phi = np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
    dPhi = Phi[:, 1:] - Phi[:, :-1]
    dphi = phi[:, 1:] - phi[:, :-1]
    one_d = Wv.ndim == 1
    W2 = Wv[:, None] if one_d else Wv
    h = np.diff(xs)
    slope = np.diff(W2, axis=0) / h[:, None]           # (G-1, L)
    out = dPhi @ W2[:-1, :]
    out += ((mu[:, None] - xs[None, :-1]) * dPhi - s * dphi) @ slope
    out += W2[0][None, :] * Phi[:, :1]
    out += W2[-1][None, :] * (1.0 - Phi[:, -1:])
    if order == "cubic":
        span = xs[-1] - xs[0]
        brk = h <= 1e-4 * span / max(len(xs) - 1, 1)   # double nodes
        m_nodes = _hermite_slopes(xs, W2, brk)
        # Hermite-minus-chord correction on cell k, in t = (y-a)/h:
        #   d1 t + d2 t^2 + d3 t^3 with d1 = h m_a - dW,
        #   d2 = 3 dW - h(2 m_a + m_b) - ... (standard Hermite coeffs
        #   minus the chord; d1 + d2 + d3 = 0 so ends are untouched)
        dW = np.diff(W2, axis=0)
        hma = h[:, None] * m_nodes[:-1]
        hmb = h[:, None] * m_nodes[1:]
        d1 = hma - dW
        d2 = 3.0 * dW - 2.0 * hma - hmb
        d3 = -2.0 * dW + hma + hmb
        live = ~brk
        d1[brk], d2[brk], d3[brk] = 0.0, 0.0, 0.0
        # Gaussian moments of t^p over the cell: t = alpha + beta z,
        #   E0 = dPhi, E1 = int z phi = -dphi,
        #   E2 = dPhi - (z phi)|, E3 = ((z^2+2) phi)|_b^a
        alpha = np.where(live, (mu[:, None] - xs[None, :-1])
                         / np.where(live, h, 1.0), 0.0)
        beta = np.where(live, s / np.where(live, h, 1.0), 0.0)
        zphi = z * phi
        E1 = -dphi
        E2 = dPhi - (zphi[:, 1:] - zphi[:, :-1])
        z2phi = (z * z + 2.0) * phi
        E3 = z2phi[:, :-1] - z2phi[:, 1:]
        S1 = alpha * dPhi + beta * E1
        S2 = alpha * (alpha * dPhi + 2.0 * beta * E1) + beta * beta * E2
        S3 = (alpha * alpha * (alpha * dPhi + 3.0 * beta * E1)
              + beta * beta * (3.0 * alpha * E2 + beta * E3))
        out += S1 @ d1 + S2 @ d2 + S3 @ d3
    return out[:, 0] if one_d else out


def _catmull_weights(wg, w_val):
    """(idx, (c_m1, c_0, c_1, c_2)) 4-point Catmull-Rom weights for
    evaluating a smooth function tabulated on the uniform grid ``wg`` at
    ``w_val`` (clipped to the ends: lam 0/1 gives exactly the endpoint
    columns, so constant extension beyond the grid is preserved).  The
    cubic kills the 2-point lam-blend's O(h^2) convexity bias AND
    restores Gauss-Hermite's fast convergence when the blend feeds a
    quadrature (a C^1 interpolant instead of a kinked piecewise-linear
    one).  Pair with ``_ghost_cols`` and index idx..idx+3.

    The 0.5 tangent weights hard-code UNIFORM spacing; a nonuniform grid
    (e.g. a w-grid with inserted nodes, mirroring the u-grids) would
    silently bias the blends — asserted away here (round-5 advisor
    finding): generalize the tangents before feeding one."""
    dw = np.diff(wg)
    assert np.ptp(dw) <= 1e-6 * np.mean(dw), (
        "_catmull_weights requires a uniform grid (nonuniform tangents "
        "not implemented)", float(np.ptp(dw)), float(np.mean(dw)))
    last = len(wg) - 2
    idx = np.clip(np.searchsorted(wg, w_val) - 1, 0, last)
    lam = np.clip((w_val - wg[idx]) / (wg[idx + 1] - wg[idx]), 0.0, 1.0)
    l2 = lam * lam
    l3 = l2 * lam
    return idx, (0.5 * (-l3 + 2.0 * l2 - lam),
                 0.5 * (3.0 * l3 - 5.0 * l2 + 2.0),
                 0.5 * (-3.0 * l3 + 4.0 * l2 + lam),
                 0.5 * (l3 - l2))


def _ghost_cols(T):
    """Extend the last axis with linear-extrapolation ghost columns so
    Catmull-Rom's 4-point stencil is defined at the edge cells (the
    ghost reduces the edge cells to the one-sided quadratic)."""
    g0 = 2.0 * T[..., :1] - T[..., 1:2]
    g1 = 2.0 * T[..., -1:] - T[..., -2:-1]
    return np.concatenate([g0, T, g1], axis=-1)


def _note_dates(start: float, n: int, tau: float, m: int):
    """(obs per period, period boundaries T_0..T_n, sorted date tuple)."""
    obs = [tuple(start + j * tau + i * tau / m for i in range(m))
           for j in range(n)]
    bounds = tuple(start + j * tau for j in range(n + 1))
    dates = tuple(sorted({t for o in obs for t in o} | set(bounds)))
    return obs, bounds, dates


@lru_cache(maxsize=None)
def _note_shapes(cfg: HWConfig, start: float, n: int, tau: float, m: int):
    """fp64 shock-shape vectors (length n_steps) for every date the note
    touches: u (short-rate shape) and w (integral shape) per date."""
    from .bermudan import _step_index
    from .ops.engine_linear import _shock_shapes

    obs, bounds, dates = _note_dates(start, n, tau, m)
    U, W = {}, {}
    for t in dates:
        nt = _step_index(cfg, t)
        u, w = (np.asarray(a, np.float64) for a in _shock_shapes(cfg, nt))
        U[t] = np.pad(u, (0, cfg.n_steps - len(u)))
        W[t] = np.pad(w, (0, cfg.n_steps - len(w)))
    return obs, bounds, dates, U, W


def _r_band(cfg: HWConfig, sigma, market, t: float, delta: float,
            lo: float, hi: float):
    from .instruments import _libor_r_bounds

    r_lo, r_hi = _libor_r_bounds(cfg, jnp.float32(sigma), market, t,
                                 delta, lo, hi)
    return float(np.asarray(r_lo, np.float64)), \
        float(np.asarray(r_hi, np.float64))


class NoteDP(NamedTuple):
    price: float               # fp64 DP value of the puttable note
    plain_price: float         # non-callable note (coupons + redemption)
    boundaries: tuple          # r*_j at T_1..T_{n-1} (+inf = never put)
    put_premium: float         # price - plain_price  (>= 0)
    profile_x: tuple = ()      # r-grid at the first put date T_1
    profile_cont: tuple = ()   # continuation C_1(r) there (vs par = 1)


def dp_oracle_range_note(cfg: HWConfig, market: MarketCurve, *,
                         coupon: float, lo: float, hi: float,
                         start: float | None = None, tenor: float = 4.0,
                         freq: float = 1.0, obs_per_period: int = 5,
                         libor_tenor: float | None = None,
                         sigma: float | None = None, n_grid: int = 801,
                         width: float = 8.0) -> NoteDP:
    """fp64 value iteration for the puttable range-accrual note on a 1-d
    r-grid.  Conditioning on r(T_j) is the Gaussian projection of the
    model's exact discrete-law covariances (the same construction as
    bermudan._interval_params, so the oracle integrates the SAME law the
    MC samples).  Returns the DP price, the plain (non-callable) price
    computed by the same iteration with the put disabled (an internal
    consistency anchor for range_accrual_closed_form), and the exercise
    boundary per put date."""
    from .bermudan import _det_states
    from .models.hull_white import step_tables

    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), m)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    band = {t: _r_band(cfg, sigma, market, t, libor_tenor, lo, hi)
            for o in obs for t in o}

    def grid(t):
        """Value grid at date t.  For a period start the date's OWN
        observation indicator jumps at its band edges: insert double
        nodes there so the piecewise-linear representation of the value
        function captures the jump exactly (the indicator is evaluated
        pointwise at the nodes, so the pair brackets the discontinuity
        within 2 ulp-scale cells)."""
        s = sig * math.sqrt(float(U[t] @ U[t]))
        xs = np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                         n_grid)
        if t in band:
            eps = 1e-9
            extra = [v for edge in band[t]
                     for v in (edge - eps, edge + eps)
                     if xs[0] < v < xs[-1] and math.isfinite(v)]
            if extra:
                xs = np.unique(np.concatenate([xs, np.asarray(extra)]))
        return xs

    profile = []

    def backward(puttable: bool):
        xs_next = grid(bounds[n])
        W_next = np.ones(len(xs_next))    # value at T_n = redemption
        boundaries = []
        for j in range(n - 1, -1, -1):
            Tj, Tp = bounds[j], bounds[j + 1]
            xs = grid(Tj)
            uj, dj = U[Tj], W[Tp] - W[Tj]          # r(T_j), Delta I shapes
            vjj = float(uj @ uj)
            e = (xs - r_det[Tj]) / vjj             # projection coefficient
            dI_det = i_det[Tp] - i_det[Tj]
            b_I = float(dj @ uj)
            v_I = sig * sig * (float(dj @ dj) - b_I * b_I / vjj)
            m_I = dI_det + b_I * e
            w0 = np.exp(-m_I + 0.5 * v_I)          # tilted discount factor

            # closed-form conditional coupon value on the grid
            cpn = np.zeros(len(xs))
            for t in obs[j]:
                ui = U[t]
                b_i = float(ui @ uj)
                v_i = sig * sig * (float(ui @ ui) - b_i * b_i / vjj)
                c_iI = sig * sig * (float(ui @ dj) - b_i * b_I / vjj)
                mu = r_det[t] + b_i * e - c_iI     # tilted conditional mean
                s_i = math.sqrt(max(v_i, 0.0))
                r_lo_t, r_hi_t = band[t]
                if s_i < 1e-12:                    # t == T_j: r is known
                    p = ((xs >= r_lo_t) & (xs <= r_hi_t)).astype(np.float64)
                else:
                    p = _nphi((r_hi_t - mu) / s_i) - _nphi((r_lo_t - mu) / s_i)
                cpn += coupon * tau / m * p
            cpn *= w0

            # dense-kernel continuation through the next value function
            up = U[Tp]
            b_p = float(up @ uj)
            v_p = sig * sig * (float(up @ up) - b_p * b_p / vjj)
            c_pI = sig * sig * (float(up @ dj) - b_p * b_I / vjj)
            mu_p = r_det[Tp] + b_p * e - c_pI
            s_p = math.sqrt(max(v_p, 0.0))
            cont = cpn + w0 * _kernel_avg(mu_p, s_p, xs_next, W_next,
                                          order="cubic")

            if puttable and j == 1:
                profile.append((tuple(float(v) for v in xs),
                                tuple(float(v) for v in cont)))
            if puttable and 1 <= j:
                # value AT T_j with the put right exercised before period j
                # accrues: W_j = max(1, cont).  Boundary: cont decreasing
                # in r, crosses 1 once.
                if cont[-1] < 1.0 < cont[0]:
                    rb = float(np.interp(-1.0, -cont, xs))
                elif cont[0] <= 1.0:
                    rb = -math.inf                 # always put
                else:
                    rb = math.inf                  # never put
                boundaries.append(rb)
                W_next = np.maximum(1.0, cont)
            else:
                W_next = cont
            xs_next = xs
        # discount from 0 to T_0 (tilted unconditional Gaussian)
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
    return NoteDP(price=price, plain_price=plain, boundaries=boundaries,
                  put_premium=price - plain, profile_x=px, profile_cont=pc)


class NoteResult(NamedTuple):
    price: jax.Array           # CV lower-bound estimate
    std_error: jax.Array       # SE of the CV estimate
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    put_fraction: jax.Array    # fraction of paths that put early
    n_paths: int


@lru_cache(maxsize=None)
def _note_fn(cfg: HWConfig, coupon: float, lo: float, hi: float,
             start: float, n: int, tau: float, m: int, delta: float,
             boundaries: tuple, plain_mean: float, n_paths: int,
             n_blocks: int, mesh):
    from .bermudan import _joint_chol, _det_states
    from .instruments import _libor_r_bounds

    from .bermudan import _functional_chol, _functional_det

    obs, bounds, dates = _note_dates(start, n, tau, m)
    del dates
    # sample exactly the functionals the payoff touches (see the
    # _range_accrual_fn note): r at the n*m observations — put dates
    # T_1..T_{n-1} are observation i=0 of periods 1..n-1 — then I at
    # T_1..T_n (put cash, coupons and redemption)
    specs = tuple([("r", t) for o in obs for t in o]
                  + [("I", t) for t in bounds[1:]])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    nm = n * m

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det = det[:nm].reshape(n, m)
        i_det = det[nm:]
        b_lo, b_hi = (jnp.stack(b).reshape(n, m) for b in zip(
            *[_libor_r_bounds(cfg, sigma, market, t, delta, lo, hi)
              for o in obs for t in o]))

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, nm + n), jnp.float32)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :, :] + sgn * z[:, :nm].reshape(
                    -1, n, m)                            # (paths, n, m)
                integral = i_det[None, :] + sgn * z[:, nm:]  # (paths, n)
                in_band = ((ro >= b_lo[None, :, :])
                           & (ro <= b_hi[None, :, :]))
                fr = jnp.mean(in_band.astype(jnp.float32), axis=2)
                discs = jnp.exp(-integral)
                cpn = [coupon * tau * fr[:, j] * discs[:, j]
                       for j in range(n)]
                # put policy: alive_j = no put at T_1..T_j
                alive = jnp.ones(ro.shape[0], jnp.float32)
                V = cpn[0]                  # period-0 coupon always accrues
                Y = cpn[0]                  # CV: non-callable note
                for j in range(1, n):
                    put = (ro[:, j, 0] > boundaries[j - 1]).astype(
                        jnp.float32)
                    V = V + alive * put * discs[:, j - 1]
                    alive = alive * (1.0 - put)
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
        # CV estimator: V - beta (Y - E[Y]), E[Y] exact (closed form)
        price = mv - beta * (my - plain_mean)
        var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
        bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (price, jnp.sqrt(bessel * var_cv / n_tot), mv,
                jnp.sqrt(bessel * var_v / n_tot), beta, s[5] / n_tot)

    return jax.jit(compute)


def price_range_note(cfg: HWConfig, key, market: MarketCurve, *,
                     coupon: float, lo: float, hi: float,
                     start: float | None = None, tenor: float = 4.0,
                     freq: float = 1.0, obs_per_period: int = 5,
                     libor_tenor: float | None = None, sigma=None,
                     boundaries: tuple | None = None,
                     n_paths: int | None = None, n_blocks: int = 1,
                     mesh=None) -> NoteResult:
    """Monte Carlo lower bound for the puttable range-accrual note under
    the fixed threshold policy ``boundaries`` (default: read off the fp64
    DP oracle; any fixed policy is an unbiased lower bound — with the DP
    boundary the estimate reproduces ``dp_oracle_range_note`` to MC
    noise).  The non-callable note is used as a control variate with its
    EXACT closed-form mean, collapsing the common coupon/redemption
    noise.  Blocks key on their global index; optionally shards over
    ``mesh``."""
    from .instruments import range_accrual_closed_form

    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m
    if boundaries is None:
        boundaries = dp_oracle_range_note(
            cfg, market, coupon=coupon, lo=lo, hi=hi, start=start,
            tenor=tenor, freq=freq, obs_per_period=m,
            libor_tenor=libor_tenor, sigma=float(sigma)).boundaries
    leg, _ = range_accrual_closed_form(
        cfg, market, coupon=coupon, lo=lo, hi=hi, start=start, tenor=tenor,
        freq=freq, obs_per_period=m, libor_tenor=libor_tenor,
        sigma=float(sigma))
    # exact non-callable mean: coupon leg + discrete-law P(0, T_n)
    from .bermudan import _det_states, _step_index
    from .ops.engine_linear import _shock_shapes
    from .models.hull_white import step_tables

    tables = step_tables(cfg, float(sigma), cfg.sigma, jnp.float32)
    Tn = start + n * tau
    _, i_det = _det_states(cfg, tables, (Tn,))
    _, wn = (np.asarray(a, np.float64)
             for a in _shock_shapes(cfg, _step_index(cfg, Tn)))
    sig = float(tables.sig_st)
    p0Tn = math.exp(-float(np.asarray(i_det, np.float64)[0])
                    + 0.5 * sig * sig * float(wn @ wn))
    plain_mean = leg + p0Tn
    out = _note_fn(cfg, float(coupon), float(lo), float(hi), float(start),
                   n, float(tau), m, float(libor_tenor),
                   tuple(float(b) for b in boundaries), float(plain_mean),
                   int(n_paths), int(n_blocks), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return NoteResult(price=out[0], std_error=out[1], raw_price=out[2],
                      raw_std_error=out[3], beta=out[4],
                      put_fraction=out[5],
                      n_paths=int(n_paths) * int(n_blocks))


class NoteVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_range_note(cfg: HWConfig, key, market: MarketCurve, *,
                    coupon: float, lo: float, hi: float,
                    start: float | None = None, tenor: float = 4.0,
                    freq: float = 1.0, obs_per_period: int = 5,
                    libor_tenor: float | None = None, eps: float = 1e-3,
                    n_paths: int | None = None, n_blocks: int = 1,
                    mesh=None) -> NoteVega:
    """CRN central-difference vega of the puttable note with the put
    BOUNDARY FROZEN at the base-sigma DP policy (envelope theorem: at
    the optimal threshold the policy derivative contributes zero first
    order, so the fixed-policy derivative IS the price sensitivity).
    Oracle: the same central difference of the fp64 DP value, which
    re-optimizes the boundary at each bump — agreement of the two also
    CHECKS the envelope argument numerically.  CRN by key reuse; the
    control variate's exact mean is recomputed per bump so each side
    stays unbiased."""
    if start is None:
        start = cfg.s1
    kw = dict(coupon=coupon, lo=lo, hi=hi, start=start, tenor=tenor,
              freq=freq, obs_per_period=obs_per_period,
              libor_tenor=libor_tenor)
    base = dp_oracle_range_note(cfg, market, sigma=cfg.sigma, **kw)
    dp_m = dp_oracle_range_note(cfg, market, sigma=cfg.sigma - eps, **kw)
    dp_p = dp_oracle_range_note(cfg, market, sigma=cfg.sigma + eps, **kw)
    mc = dict(kw, boundaries=base.boundaries, n_paths=n_paths,
              n_blocks=n_blocks, mesh=mesh)
    p_m = price_range_note(cfg, key, market, sigma=cfg.sigma - eps,
                           **mc).price
    p_p = price_range_note(cfg, key, market, sigma=cfg.sigma + eps,
                           **mc).price
    return NoteVega(vega=(p_p - p_m) / (2.0 * eps),
                    dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                    price_minus=p_m, price_plus=p_p, epsilon=eps)


# ---------------------------------------------------------------------------
# TARN (target redemption note) on the range-accrual coupon: the note
# accrues coupon tau frac_j per period and KNOCKS OUT at the first
# payment date where the cumulative coupon reaches ``target`` — the
# final coupon is capped at target - K and par is redeemed immediately
# at that payment date; otherwise par at T_n.  Path-dependent through
# the running total K, which at one observation per period (m = 1, the
# observation at the period start) lives on the LATTICE {0, ct, 2 ct,
# ...} (ct = coupon tau): the fp64 oracle is a value iteration over
# (lattice level, r-grid) with the coupon indicator DETERMINISTIC at
# the decision state — exact, no approximation beyond the grid.
# ---------------------------------------------------------------------------

class TarnDP(NamedTuple):
    price: float
    ko_prob: float             # knockout probability (lattice DP)
    levels: tuple              # lattice of cumulative-coupon levels


def dp_oracle_tarn(cfg: HWConfig, market: MarketCurve, *, coupon: float,
                   lo: float, hi: float, target: float,
                   start: float | None = None, tenor: float = 4.0,
                   freq: float = 1.0, libor_tenor: float | None = None,
                   sigma: float | None = None, n_grid: int = 801,
                   width: float = 8.0) -> TarnDP:
    """fp64 lattice value iteration for the range-accrual TARN with ONE
    observation per period (m = 1): the period-j coupon indicator is a
    deterministic function of the decision state r(T_j), so the running
    total K is lattice-valued and the DP over (K, r) integrates the
    model's exact projected law — same conditioning and exact
    piecewise-linear kernel integration as dp_oracle_range_note.
    Also returns the knockout probability (computed by the same
    iteration with the value replaced by the knockout indicator)."""
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
    ct = coupon * tau
    levels = tuple(k * ct for k in range(n + 1))

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), 1)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    band = {t: _r_band(cfg, sigma, market, t, libor_tenor, lo, hi)
            for o in obs for t in o}

    def grid(t):
        s = sig * math.sqrt(float(U[t] @ U[t]))
        xs = np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                         n_grid)
        if t in band:
            eps = 1e-9
            extra = [v for edge in band[t]
                     for v in (edge - eps, edge + eps)
                     if xs[0] < v < xs[-1] and math.isfinite(v)]
            if extra:
                xs = np.unique(np.concatenate([xs, np.asarray(extra)]))
        return xs

    # W[l] = value at T_j given running total levels[l], not yet knocked
    # out; P[l] = knockout probability from that state on
    xs_next = grid(bounds[n])
    Wn = [np.ones(len(xs_next)) for _ in range(n + 1)]
    Pn = [np.zeros(len(xs_next)) for _ in range(n + 1)]
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
        mu_p = r_det[Tp] + b_p * e - c_pI
        mu_p_real = r_det[Tp] + b_p * e    # untilted: knockout PROBABILITY
        s_p = math.sqrt(max(v_p, 0.0))
        r_lo_t, r_hi_t = band[bounds[j]]
        ind = ((xs >= r_lo_t) & (xs <= r_hi_t)).astype(np.float64)
        W_new, P_new = [], []
        for li, K in enumerate(levels):
            if K >= target - 1e-12:            # already out (unreachable)
                W_new.append(np.ones(len(xs)))
                P_new.append(np.ones(len(xs)))
                continue
            c_full = min(ct, target - K)
            ko = K + ct >= target - 1e-12
            # coupon-earning branch: knock out (pay capped coupon + par
            # at T_p) or move up one level
            if ko:
                v_in = w0 * (c_full + 1.0)
                p_in = np.ones(len(xs))
            else:
                li_up = min(li + 1, n)
                v_in = w0 * (ct + _kernel_avg(mu_p, s_p, xs_next, Wn[li_up],
                                              order="cubic"))
                p_in = _kernel_avg(mu_p_real, s_p, xs_next, Pn[li_up],
                                   order="cubic")
            # no-coupon branch: stay at level li
            v_out = w0 * _kernel_avg(mu_p, s_p, xs_next, Wn[li],
                                     order="cubic")
            p_out = _kernel_avg(mu_p_real, s_p, xs_next, Pn[li],
                                order="cubic")
            W_new.append(ind * v_in + (1.0 - ind) * v_out)
            P_new.append(ind * p_in + (1.0 - ind) * p_out)
        Wn, Pn, xs_next = W_new, P_new, xs
    # discount 0 -> T_0 over the tilted unconditional law
    T0 = bounds[0]
    u0, w0v = U[T0], W[T0]
    v00 = sig * sig * float(u0 @ u0)
    vI0 = sig * sig * float(w0v @ w0v)
    c0 = sig * sig * float(u0 @ w0v)
    disc0 = math.exp(-i_det[T0] + 0.5 * vI0)
    price = disc0 * float(_kernel_avg(r_det[T0] - c0, math.sqrt(v00),
                                      xs_next, Wn[0],
                                      order="cubic")[0])
    # knockout probability under the REAL (untilted) measure
    ko_p = float(_kernel_avg(r_det[T0], math.sqrt(v00), xs_next, Pn[0],
                             order="cubic")[0])
    return TarnDP(price=price, ko_prob=ko_p, levels=levels)


class TarnResult(NamedTuple):
    price: jax.Array
    std_error: jax.Array
    ko_fraction: jax.Array     # fraction of paths that knocked out
    mean_total: jax.Array      # mean cumulative coupon paid
    n_paths: int


@lru_cache(maxsize=None)
def _tarn_fn(cfg: HWConfig, coupon: float, lo: float, hi: float,
             target: float, start: float, n: int, tau: float, m: int,
             delta: float, n_paths: int, n_blocks: int, mesh):
    from .bermudan import _functional_chol, _functional_det
    from .instruments import _libor_r_bounds

    obs, bounds, dates = _note_dates(start, n, tau, m)
    del dates
    specs = tuple([("r", t) for o in obs for t in o]
                  + [("I", t) for t in bounds[1:]])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    nm = n * m
    ct = coupon * tau

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det = det[:nm].reshape(n, m)
        i_det = det[nm:]
        b_lo, b_hi = (jnp.stack(b).reshape(n, m) for b in zip(
            *[_libor_r_bounds(cfg, sigma, market, t, delta, lo, hi)
              for o in obs for t in o]))

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, nm + n), jnp.float32)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :, :] + sgn * z[:, :nm].reshape(
                    -1, n, m)
                integral = i_det[None, :] + sgn * z[:, nm:]
                in_band = ((ro >= b_lo[None, :, :])
                           & (ro <= b_hi[None, :, :]))
                fr = jnp.mean(in_band.astype(jnp.float32), axis=2)
                discs = jnp.exp(-integral)               # (paths, n)
                alive = jnp.ones(ro.shape[0], jnp.float32)
                K = jnp.zeros(ro.shape[0], jnp.float32)
                V = jnp.zeros(ro.shape[0], jnp.float32)
                for j in range(n):
                    c = jnp.minimum(ct * fr[:, j], target - K)
                    ko = (K + ct * fr[:, j] >= target - 1e-12).astype(
                        jnp.float32)
                    # coupon (capped) always paid at T_{j+1} while alive;
                    # on knockout par is redeemed at the same date
                    V = V + alive * discs[:, j] * (c + ko)
                    K = K + alive * c
                    alive = alive * (1.0 - ko)
                V = V + alive * discs[:, n - 1]          # par at T_n
                return V, 1.0 - alive, K

            Vp, Kop, Kp = leg(1.0)
            Vm, Kom, Km = leg(-1.0)
            V, Ko, K = 0.5 * (Vp + Vm), 0.5 * (Kop + Kom), 0.5 * (Kp + Km)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Ko),
                              jnp.sum(K)])

        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mean = s[0] / n_tot
        var = jnp.maximum(s[1] / n_tot - mean ** 2, 0.0)
        var = var * n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (mean, jnp.sqrt(var / n_tot), s[2] / n_tot, s[3] / n_tot)

    return jax.jit(compute)


def price_tarn(cfg: HWConfig, key, market: MarketCurve, *, coupon: float,
               lo: float, hi: float, target: float,
               start: float | None = None, tenor: float = 4.0,
               freq: float = 1.0, obs_per_period: int = 1,
               libor_tenor: float | None = None, sigma=None,
               n_paths: int | None = None, n_blocks: int = 1,
               mesh=None) -> TarnResult:
    """Monte Carlo range-accrual TARN from the exact multi-date states
    (antithetic): the cumulative coupon K knocks the note out at the
    first payment where K reaches ``target`` (final coupon capped at
    target - K, par redeemed at that payment date).  obs_per_period = 1
    (the default) is the lattice case pinned EXACTLY by
    ``dp_oracle_tarn``; larger m is supported by the MC (the oracle
    lattice no longer applies).  Blocks key on the global index;
    optionally sharded over ``mesh``."""
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m
    out = _tarn_fn(cfg, float(coupon), float(lo), float(hi), float(target),
                   float(start), n, float(tau), m, float(libor_tenor),
                   int(n_paths), int(n_blocks), mesh)(
        key, jnp.asarray(sigma, jnp.float32), market)
    return TarnResult(price=out[0], std_error=out[1], ko_fraction=out[2],
                      mean_total=out[3],
                      n_paths=int(n_paths) * int(n_blocks))
