"""Puttable (Bermudan-callable) range-accrual note under G2++.

Two-factor twin of ``range_note`` (the product layer the reference stops
short of, src/2_option_pricing.cu:14-35): per period the note pays
coupon * tau * (1/m) sum_i 1{lo <= L(t_ji) <= hi} at T_{j+1}, redeems 1
at T_n, and is puttable by the holder at par at T_1..T_{n-1}.

Under G2++ the decision state at T_j is (x, y) — 2-d — but the product
only ever LOOKS at the state through two fixed linear functionals:

* the LIBOR strip projection u = Ba x + Bb y (Ba = B(a, delta),
  Bb = B(b, delta); delta is the same at every observation, so the strip
  DIRECTION is date-independent — g2pp._libor_strip_g2), and
* discounting, through I = int (x + y) ds.

So the DP runs in ROTATED coordinates (u, w) with w = -Bb x + Ba y the
orthogonal complement: the bijection (x, y) <-> (u, w) makes (u, w) the
full Markov state, and the date's own observation indicator (t_j0 = T_j
is known at the decision time) jumps on the VERTICAL lines u = c_lo,
c_hi — the 1-factor oracle's double-node trick applies verbatim to the
u-grid, and the value function stays smooth in w given u.  Per period,
conditional on (u_j, w_j) and tilted by e^{-Delta I} (means shift by
-Cov_cond(., Delta I), normalizer exp(-m_dI + v_dI/2)):

* the coupon's conditional value is CLOSED FORM (Phi differences per
  interior observation; the T_j observation is a deterministic strip
  indicator on the u-grid),
* the continuation integrates the bilinear interpolant of the next
  value function EXACTLY in u' per Gauss-Hermite node in w' — the
  w'-blend weights commute with the u'-integral (bilinear = linear in
  u' per column), so one ``range_note._kernel_avg`` (G, L)-batched call
  per node serves every w'-column at once.

Every conditional law is projected off ``g2pp._g2_functional_cov`` —
the SAME matrix whose Cholesky drives the sampler — so the oracle and
the MC integrate the identical law (the property that makes the HW
note's DP==MC agreement exact; range_note.dp_oracle_range_note).

The MC estimator applies the FIXED DP policy — put at T_j when
u_j > u*_j(w_j), a per-date piecewise-linear boundary curve read off
the DP continuation — to exactly-sampled functionals (u at the n*m
observations, w at the put dates, I at the payments: the
bermudan._functional_chol pattern), with the non-callable note as a
control variate against its EXACT closed-form mean
(g2pp.range_accrual_closed_form_g2 + P(0, T_n)).

Engine invariants kept: blocks key on the GLOBAL block index, every
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
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .ops.interp import uinterp  # noqa: E402
from .models.g2pp import (G2Params, _B, _v_integral, _g2_functional_cov,
                          _g2_functional_chol, _libor_strip_g2,
                          range_accrual_closed_form_g2)
from .range_note import (_catmull_weights, _ghost_cols, _kernel_avg,
                         _note_dates, _nphi)
from .parallel import mesh as pmesh


def _strip_edges_f64(cfg: HWConfig, g: G2Params, market, t: float,
                     delta: float, lo: float, hi: float):
    """fp64 (c_lo, c_hi): lo <= L(t, t+delta) <= hi  <=>
    c_lo <= Ba x + Bb y <= c_hi (the host-precision twin of
    g2pp._libor_strip_g2, matching range_accrual_closed_form_g2)."""
    lnA = _strip_lnA_f64(cfg, g, market, t, delta)
    return _kink_edge(lnA, delta, lo), _kink_edge(lnA, delta, hi)


def _period_machine(g: G2Params, Tj: float, Tp: float, obs_j, Ba: float,
                    Bb: float, ca: float, cb: float):
    """Conditional-Gaussian parameters of one period, given the rotated
    state S = (u_j, w_j).  Targets, in order: Delta I = I(Tp) - I(Tj),
    the period's INTERIOR observations u(t_i) (t_i > Tj; the t = Tj
    observation is deterministic given S), u(Tp), w(Tp).

    Returns (interior obs times, kcoef (2, T): cond mean of target t at
    state s is kcoef[:, t] . s, CondC (T, T): cond covariance).  All
    read off _g2_functional_cov — the sampler's own law."""
    interior = tuple(t for t in obs_j if t > Tj + 1e-12)
    specs = ((("u", Tj, Ba, Bb), ("u", Tj, ca, cb), ("I", Tj), ("I", Tp))
             + tuple(("u", t, Ba, Bb) for t in interior)
             + (("u", Tp, Ba, Bb), ("u", Tp, ca, cb)))
    Sig = _g2_functional_cov(g, specs)
    ns = len(specs)

    def unit(i):
        v = np.zeros(ns)
        v[i] = 1.0
        return v

    cols = ([unit(3) - unit(2)]                       # Delta I
            + [unit(4 + i) for i in range(len(interior))]
            + [unit(ns - 2), unit(ns - 1)])           # u(Tp), w(Tp)
    A = np.stack(cols, axis=1)                        # (ns, T)
    S = Sig[:2, :2]
    Sinv = np.linalg.inv(S)
    SigSA = Sig[:2, :] @ A                            # (2, T)
    kcoef = Sinv @ SigSA
    CondC = A.T @ Sig @ A - SigSA.T @ Sinv @ SigSA
    return interior, kcoef, CondC


def _expect_bilinear(mu_u, mu_w, v_u, c_uw, v_w, ug, wg, V, nodes, wq):
    """E[V(U, W)] per source, (U, W) ~ N((mu_u, mu_w), [[v_u, c_uw],
    [c_uw, v_w]]) elementwise over the flat source arrays: exact
    cubic-Hermite integration in u (where V carries the strip-edge
    jumps — double grid nodes; _kernel_avg order="cubic" falls back to
    linear across them) per Gauss-Hermite node in w, with Catmull-Rom
    in w (V is smooth in w).  V is (len(ug), len(wg)); the per-node
    w-blend weights are independent of u, so they commute with the
    u-integral and one (G, L)-batched _kernel_avg serves all w-columns.
    Round-4 upgrade: the previous bilinear version carried a measured
    O(h^2) convexity bias (+7e-5 on the puttable note at default
    grids); cubic in both directions removes it (VERDICT r3 #5)."""
    v_w = max(v_w, 1e-18)
    s_w = math.sqrt(v_w)
    beta = c_uw / v_w
    s_c = math.sqrt(max(v_u - c_uw * c_uw / v_w, 1e-18))
    out = np.zeros(mu_u.shape[0])
    rows = np.arange(mu_u.shape[0])
    for xq, wq_ in zip(nodes, wq):
        w_val = mu_w + s_w * xq
        T = _ghost_cols(
            _kernel_avg(mu_u + beta * s_w * xq, s_c, ug, V,
                        order="cubic"))               # (ns, L+2)
        idx, cw = _catmull_weights(wg, w_val)
        out += wq_ * (cw[0] * T[rows, idx] + cw[1] * T[rows, idx + 1]
                      + cw[2] * T[rows, idx + 2] + cw[3] * T[rows, idx + 3])
    return out


class G2NoteDP(NamedTuple):
    price: float               # fp64 DP value of the puttable note
    plain_price: float         # non-callable note (coupons + redemption)
    boundaries: tuple          # per put date: (w-grid, u*(w)) tuples
    put_premium: float         # price - plain_price  (>= 0)
    profile_u: tuple = ()      # u-grid at the first put date T_1
    profile_cont: tuple = ()   # continuation there (center w column)


def dp_oracle_range_note_g2(cfg: HWConfig, g: G2Params,
                            market: MarketCurve, *, coupon: float,
                            lo: float, hi: float,
                            start: float | None = None, tenor: float = 4.0,
                            freq: float = 1.0, obs_per_period: int = 5,
                            libor_tenor: float | None = None,
                            n_u: int = 161, n_w: int = 61,
                            width: float = 7.0,
                            n_quad: int = 16,
                            boundary_cascade: bool = False) -> G2NoteDP:
    """fp64 2-d value iteration for the G2++ puttable range-accrual note
    on rotated (u, w) grids (see the module docstring).  Also returns
    the plain (put-disabled) price from the same iteration — pinned
    against range_accrual_closed_form_g2 + P(0, T_n) by the tests, which
    certifies the whole conditional machinery — and the per-date
    exercise boundary curves u*_j(w) for the MC policy."""
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m
    obs, bounds, dates = _note_dates(float(start), n, float(tau), m)
    del dates
    Ba, Bb = _B(g.a, libor_tenor), _B(g.b, libor_tenor)
    ca, cb = -Bb, Ba

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    dd = {t: float(np.interp(t, Ts, P0)) * math.exp(-0.5 * _v_integral(g, t))
          for t in bounds}
    band = {t: _strip_edges_f64(cfg, g, market, t, libor_tenor, lo, hi)
            for o in obs for t in o}

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        ug = np.linspace(-width * s_u, width * s_u, n_u)
        if t in band:
            eps = 1e-9
            h = ug[1] - ug[0]
            extra = []
            for edge in band[t]:
                if not (math.isfinite(edge)
                        and ug[0] < edge < ug[-1]):
                    continue
                # jump double node at the edge itself, plus a geometric
                # halving cascade (round-5): the one-sided cells next to
                # each band edge carried the full-scale default-grid
                # residual (+1.65e-6 isolated by u-only refinement) —
                # three cascade levels shrink the edge-adjacent cell 8x
                # for 6 extra nodes per edge
                extra += [edge - eps, edge + eps]
                for frac in (0.5, 0.25, 0.125):
                    extra += [edge - frac * h, edge + frac * h]
            extra = [v for v in extra if ug[0] < v < ug[-1]]
            if extra:
                ug = np.unique(np.concatenate([ug, np.asarray(extra)]))
        return ug, np.linspace(-width * s_w, width * s_w, n_w)

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds}
    profile = []

    def backward(puttable: bool):
        ug_next, wg_next = gr[bounds[n]]
        V = np.ones((len(ug_next), len(wg_next)))     # redemption at T_n
        boundaries = []
        for j in range(n - 1, -1, -1):
            Tj, Tp = bounds[j], bounds[j + 1]
            ug, wg = gr[Tj]
            interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                                 Ba, Bb, ca, cb)
            ni = len(interior)
            iu, iw = 1 + ni, 2 + ni

            def cont_at(uf, wf, *, interior=interior, kcoef=kcoef, C=C,
                        Tj=Tj, Tp=Tp, obs_j=obs[j], V=V,
                        ug_next=ug_next, wg_next=wg_next):
                """Closed-form continuation value at arbitrary flat source
                points (uf, wf) — factored out so the put-kink double
                nodes below can be evaluated EXACTLY, not interpolated."""
                m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
                w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
                # closed-form conditional coupon fraction (tilted)
                cpn = np.zeros(uf.shape[0])
                for t in obs_j:
                    c_lo_t, c_hi_t = band[t]
                    if t <= Tj + 1e-12:    # the date's own observation:
                        p = ((uf >= c_lo_t)
                             & (uf <= c_hi_t)).astype(np.float64)
                    else:
                        q = 1 + interior.index(t)
                        mu = kcoef[0, q] * uf + kcoef[1, q] * wf - C[q, 0]
                        s_i = math.sqrt(max(C[q, q], 1e-18))
                        p = (_nphi((c_hi_t - mu) / s_i)
                             - _nphi((c_lo_t - mu) / s_i))
                    cpn += coupon * tau / m * p
                mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf - C[iu, 0]
                mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf - C[iw, 0]
                Ev = _expect_bilinear(mu_u, mu_w, C[iu, iu], C[iu, iw],
                                      C[iw, iw], ug_next, wg_next, V,
                                      nodes, wq)
                return w0 * (cpn + Ev)

            U, Wm = np.meshgrid(ug, wg, indexing="ij")
            cont = cont_at(U.ravel(), Wm.ravel()).reshape(len(ug),
                                                          len(wg))

            if puttable and j == 1:
                mid = cont[:, len(wg) // 2]
                profile.append((tuple(float(v) for v in ug),
                                tuple(float(v) for v in mid)))
            if puttable and j >= 1:
                span = ug[-1] - ug[0]
                lo_big, hi_big = ug[0] - span, ug[-1] + span
                ustar = []
                for col in range(len(wg)):
                    d = cont[:, col] - 1.0
                    if d[0] <= 0.0:
                        ustar.append(lo_big)       # put at every u
                        continue
                    cr = np.nonzero(d[:-1] * d[1:] <= 0.0)[0]
                    if len(cr) == 0:
                        ustar.append(hi_big)       # never put
                        continue
                    i = int(cr[0])
                    lam = d[i] / (d[i] - d[i + 1])
                    ustar.append(float(ug[i] + lam * (ug[i + 1] - ug[i])))
                boundaries.append((tuple(float(v) for v in wg),
                                   tuple(ustar)))
                # put-kink double nodes (round-5, VERDICT r4 #4): the
                # value crease of max(1, cont) runs along the CURVED
                # boundary u*(w), so the vertical-line double-node trick
                # does not apply — but per w-column the crease is a
                # single u-point, exactly the solved 1-d case.  Insert
                # +-eps double nodes at every column's crossing (shared
                # u-grid: each column sees its own kink at a break cell,
                # and a double node on another column's smooth data is
                # harmless under the one-sided fallback), with the new
                # rows evaluated EXACTLY by cont_at.  One vectorized
                # secant refinement moves the crossing estimate from
                # O(h^2) linear-interpolation error to ~O(h^3).
                eps = 1e-9
                sel = [(c, us) for c, us in enumerate(ustar)
                       if ug[0] < us < ug[-1]]
                if sel:
                    ci = np.asarray([c for c, _ in sel])
                    lin = np.asarray([us for _, us in sel])
                    d_lin = cont_at(lin, wg[ci]) - 1.0
                    # secant against the nearest lower grid node
                    i_lo = np.clip(np.searchsorted(ug, lin) - 1, 0,
                                   len(ug) - 2)
                    d_lo = cont[i_lo, ci] - 1.0
                    denom = d_lin - d_lo
                    safe = np.abs(denom) > 1e-300
                    refined = np.where(
                        safe, lin - d_lin * (lin - ug[i_lo])
                        / np.where(safe, denom, 1.0), lin)
                    refined = np.clip(refined, ug[0] + 2 * eps,
                                      ug[-1] - 2 * eps)
                    extra = np.concatenate([refined - eps, refined + eps])
                    if boundary_cascade:
                        # OPT-IN halving cascade around each crossing:
                        # the kink double node's one-sided neighbor
                        # cells carry O(h^2 V'') error where the value
                        # curvature peaks.  Measured full scale:
                        # default-grid bias +1.37e-6 -> +0.50e-6, but
                        # the boundary spans many cells across the
                        # w-columns so the satellite union ~4x-es the
                        # augmented-grid work — accuracy already within
                        # the band-edge cascade's ~1e-6 without it,
                        # hence off by default
                        h_loc = (ug[-1] - ug[0]) / (len(ug) - 1)
                        sat = np.concatenate(
                            [refined - 0.5 * h_loc,
                             refined + 0.5 * h_loc,
                             refined - 0.25 * h_loc,
                             refined + 0.25 * h_loc])
                        sat = np.unique(np.round(sat / (0.25 * h_loc))
                                        * (0.25 * h_loc))
                        extra = np.concatenate([extra, sat])
                    extra = extra[(extra > ug[0]) & (extra < ug[-1])]
                    ug_aug = np.unique(np.concatenate([ug, extra]))
                    new_u = np.asarray(sorted(set(ug_aug) - set(ug)))
                    Un, Wn = np.meshgrid(new_u, wg, indexing="ij")
                    cont_new = cont_at(Un.ravel(), Wn.ravel()).reshape(
                        len(new_u), len(wg))
                    pos = {v: i for i, v in enumerate(ug_aug)}
                    call = np.empty((len(ug_aug), len(wg)))
                    for i, v in enumerate(ug):
                        call[pos[v]] = cont[i]
                    for i, v in enumerate(new_u):
                        call[pos[v]] = cont_new[i]
                    V = np.maximum(1.0, call)
                    ug = ug_aug
                else:
                    V = np.maximum(1.0, cont)
            else:
                V = cont
            ug_next, wg_next = ug, wg
        # integrate from 0 over the tilted unconditional (u_0, w_0) law:
        # dd(T0) e^{Var I(T0)/2} = P(0, T0) exactly
        T0 = bounds[0]
        S0 = _g2_functional_cov(
            g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
        val = float(np.interp(T0, Ts, P0)) * _expect_bilinear(
            np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1],
            S0[1, 2], S0[2, 2], ug_next, wg_next, V, nodes, wq)[0]
        return val, tuple(reversed(boundaries))

    price, boundaries = backward(True)
    plain, _ = backward(False)
    pu, pc = profile[0] if profile else ((), ())
    return G2NoteDP(price=price, plain_price=plain, boundaries=boundaries,
                    put_premium=price - plain, profile_u=pu,
                    profile_cont=pc)


class G2NoteResult(NamedTuple):
    price: jax.Array           # CV lower-bound estimate
    std_error: jax.Array       # SE of the CV estimate
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    put_fraction: jax.Array    # fraction of paths that put early
    n_paths: int


@lru_cache(maxsize=None)
def _g2_note_fn(cfg: HWConfig, g: G2Params, coupon: float, lo: float,
                hi: float, start: float, n: int, tau: float, m: int,
                delta: float, boundaries: tuple, plain_mean: float,
                n_paths: int, n_blocks: int, mesh):
    obs, bounds, dates = _note_dates(start, n, tau, m)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba
    # sample exactly the functionals the payoff touches: u at the n*m
    # observations (put dates T_1..T_{n-1} are observation i=0 of
    # periods 1..n-1), w at the put dates (the second policy
    # coordinate), I at the payments T_1..T_n
    specs = tuple([("u", t, Ba, Bb) for o in obs for t in o]
                  + [("u", T, ca, cb) for T in bounds[1:n]]
                  + [("I", T) for T in bounds[1:]])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    nm = n * m
    v_half = [0.5 * _v_integral(g, p) for p in bounds[1:]]
    bw = [jnp.asarray(b[0], jnp.float32) for b in boundaries]
    bu = [jnp.asarray(b[1], jnp.float32) for b in boundaries]

    def compute(key, market):
        edges = [_libor_strip_g2(cfg, g, market, t, delta, lo, hi)
                 for o in obs for t in o]
        c_lo = jnp.stack([e[2] for e in edges]).reshape(n, m)
        c_hi = jnp.stack([e[3] for e in edges]).reshape(n, m)
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             * jnp.exp(jnp.float32(-v_half[j]))
             for j, p in enumerate(bounds[1:])])

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, nm + (n - 1) + n), jnp.float32)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :nm].reshape(-1, n, m)       # (paths, n, m)
                wv = sgn * z[:, nm:nm + n - 1]              # (paths, n-1)
                integral = sgn * z[:, nm + n - 1:]          # (paths, n)
                in_band = ((u >= c_lo[None, :, :])
                           & (u <= c_hi[None, :, :]))
                fr = jnp.mean(in_band.astype(jnp.float32), axis=2)
                discs = disc0[None, :] * jnp.exp(-integral)
                cpn = [coupon * tau * fr[:, j] * discs[:, j]
                       for j in range(n)]
                alive = jnp.ones(u.shape[0], jnp.float32)
                V = cpn[0]                  # period-0 coupon always accrues
                Y = cpn[0]                  # CV: non-callable note
                for j in range(1, n):
                    ustar = uinterp(bw[j - 1], bu[j - 1],
                                    wv[:, j - 1])
                    put = (u[:, j, 0] > ustar).astype(jnp.float32)
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
        price = mv - beta * (my - plain_mean)
        var_cv = jnp.maximum(var_v - cov * cov / var_y, 0.0)
        bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (price, jnp.sqrt(bessel * var_cv / n_tot), mv,
                jnp.sqrt(bessel * var_v / n_tot), beta, s[5] / n_tot)

    return jax.jit(compute)


def price_range_note_g2(cfg: HWConfig, g: G2Params, key,
                        market: MarketCurve, *, coupon: float, lo: float,
                        hi: float, start: float | None = None,
                        tenor: float = 4.0, freq: float = 1.0,
                        obs_per_period: int = 5,
                        libor_tenor: float | None = None,
                        boundaries: tuple | None = None,
                        n_paths: int | None = None, n_blocks: int = 1,
                        mesh=None) -> G2NoteResult:
    """Monte Carlo lower bound for the G2++ puttable range-accrual note
    under the fixed boundary-curve policy ``boundaries`` (default: read
    off the fp64 2-d DP oracle; any fixed policy is an unbiased lower
    bound — with the DP curves the estimate reproduces
    ``dp_oracle_range_note_g2`` to MC noise).  The non-callable note is
    the control variate with its EXACT closed-form mean.  Blocks key on
    their global index; optionally sharded over ``mesh``."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    if n < 2:
        raise ValueError("puttable note needs tenor * freq >= 2 periods")
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m
    if boundaries is None:
        boundaries = dp_oracle_range_note_g2(
            cfg, g, market, coupon=coupon, lo=lo, hi=hi, start=start,
            tenor=tenor, freq=freq, obs_per_period=m,
            libor_tenor=libor_tenor).boundaries
    leg, _ = range_accrual_closed_form_g2(
        cfg, g, market, coupon=coupon, lo=lo, hi=hi, start=start,
        tenor=tenor, freq=freq, obs_per_period=m, libor_tenor=libor_tenor)
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0n = float(np.interp(start + n * tau, Ts,
                          np.asarray(market.P, np.float64)))
    out = _g2_note_fn(cfg, g, float(coupon), float(lo), float(hi),
                      float(start), n, float(tau), m, float(libor_tenor),
                      boundaries, float(leg + P0n), int(n_paths),
                      int(n_blocks), mesh)(key, market)
    return G2NoteResult(price=out[0], std_error=out[1], raw_price=out[2],
                        raw_std_error=out[3], beta=out[4],
                        put_fraction=out[5],
                        n_paths=int(n_paths) * int(n_blocks))


# ---------------------------------------------------------------------------
# G2++ TARN (two-factor twin of range_note.price_tarn / dp_oracle_tarn):
# the note accrues coupon tau frac_j per period and KNOCKS OUT at the
# first payment where the cumulative coupon reaches ``target``.  With
# one observation per period (at the period start) the coupon indicator
# is a deterministic STRIP in u at the decision state, so the running
# total K lives on the lattice {0, ct, 2ct, ...} and the fp64 oracle is
# a value iteration over (lattice level, u, w) — the level axis rides
# _kernel_avg's (G, L) batching (one Phi assembly per Hermite node
# serves every level's every w'-column at once).
# ---------------------------------------------------------------------------

class G2TarnDP(NamedTuple):
    price: float
    ko_prob: float             # knockout probability (untilted recursion)
    levels: tuple


def _expect_bilinear_multi(mu_u, mu_w, v_u, c_uw, v_w, ug, wg, Vs,
                           nodes, wq):
    """Batched _expect_bilinear over a LIST of value surfaces sharing
    the (ug, wg) grid: returns (n_src, len(Vs)).  The per-node Phi/phi
    assembly depends only on the source means, so it is shared across
    every surface and every w-column (one (G, L = n_surf * n_w) matmul
    per Hermite node)."""
    n_sur = len(Vs)
    V = np.stack(Vs, axis=1).reshape(len(ug), n_sur * len(wg))
    v_w = max(v_w, 1e-18)
    s_w = math.sqrt(v_w)
    beta = c_uw / v_w
    s_c = math.sqrt(max(v_u - c_uw * c_uw / v_w, 1e-18))
    out = np.zeros((mu_u.shape[0], n_sur))
    rows = np.arange(mu_u.shape[0])
    for xq, wq_ in zip(nodes, wq):
        w_val = mu_w + s_w * xq
        T = _ghost_cols(
            _kernel_avg(mu_u + beta * s_w * xq, s_c, ug, V,
                        order="cubic").reshape(-1, n_sur, len(wg)))
        idx, cw = _catmull_weights(wg, w_val)
        out += wq_ * (cw[0][:, None] * T[rows, :, idx]
                      + cw[1][:, None] * T[rows, :, idx + 1]
                      + cw[2][:, None] * T[rows, :, idx + 2]
                      + cw[3][:, None] * T[rows, :, idx + 3])
    return out


def dp_oracle_tarn_g2(cfg: HWConfig, g: G2Params, market: MarketCurve, *,
                      coupon: float, lo: float, hi: float, target: float,
                      start: float | None = None, tenor: float = 4.0,
                      freq: float = 1.0, libor_tenor: float | None = None,
                      n_u: int = 161, n_w: int = 61, width: float = 7.0,
                      n_quad: int = 16) -> G2TarnDP:
    """fp64 lattice value iteration for the G2++ range-accrual TARN with
    ONE observation per period: DP over (cumulative-coupon level, u, w)
    in the rotated coordinates of the module docstring.  Also returns
    the knockout probability from the same iteration run UNTILTED
    (real-measure conditional means, no discounting) — an independent
    second statistic the MC must reproduce."""
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    ct = coupon * tau
    levels = tuple(k * ct for k in range(n + 1))
    obs, bounds, dates = _note_dates(float(start), n, float(tau), 1)
    del dates
    Ba, Bb = _B(g.a, libor_tenor), _B(g.b, libor_tenor)
    ca, cb = -Bb, Ba

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    dd = {t: float(np.interp(t, Ts, P0)) * math.exp(-0.5 * _v_integral(g, t))
          for t in bounds}
    band = {t: _strip_edges_f64(cfg, g, market, t, libor_tenor, lo, hi)
            for o in obs for t in o}

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        ug = np.linspace(-width * s_u, width * s_u, n_u)
        if t in band:
            eps = 1e-9
            h = ug[1] - ug[0]
            extra = []
            for edge in band[t]:
                if not (math.isfinite(edge)
                        and ug[0] < edge < ug[-1]):
                    continue
                # jump double node at the edge itself, plus a geometric
                # halving cascade (round-5): the one-sided cells next to
                # each band edge carried the full-scale default-grid
                # residual (+1.65e-6 isolated by u-only refinement) —
                # three cascade levels shrink the edge-adjacent cell 8x
                # for 6 extra nodes per edge
                extra += [edge - eps, edge + eps]
                for frac in (0.5, 0.25, 0.125):
                    extra += [edge - frac * h, edge + frac * h]
            extra = [v for v in extra if ug[0] < v < ug[-1]]
            if extra:
                ug = np.unique(np.concatenate([ug, np.asarray(extra)]))
        return ug, np.linspace(-width * s_w, width * s_w, n_w)

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds}

    ug_next, wg_next = gr[bounds[n]]
    shape = (len(ug_next), len(wg_next))
    Wn = [np.ones(shape) for _ in range(n + 1)]
    Pn = [np.zeros(shape) for _ in range(n + 1)]
    for j in range(n - 1, -1, -1):
        Tj, Tp = bounds[j], bounds[j + 1]
        ug, wg = gr[Tj]
        U, Wm = np.meshgrid(ug, wg, indexing="ij")
        uf, wf = U.ravel(), Wm.ravel()
        interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                             Ba, Bb, ca, cb)
        assert not interior          # m = 1: the only obs is at T_j
        iu, iw = 1, 2
        m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
        w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
        mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf - C[iu, 0]
        mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf - C[iw, 0]
        # untilted means: real-measure knockout probability
        ru_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf
        ru_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf
        Ev = _expect_bilinear_multi(mu_u, mu_w, C[iu, iu], C[iu, iw],
                                    C[iw, iw], ug_next, wg_next, Wn,
                                    nodes, wq)
        Pv = _expect_bilinear_multi(ru_u, ru_w, C[iu, iu], C[iu, iw],
                                    C[iw, iw], ug_next, wg_next, Pn,
                                    nodes, wq)
        c_lo_t, c_hi_t = band[bounds[j]]
        ind = ((uf >= c_lo_t) & (uf <= c_hi_t)).astype(np.float64)
        W_new, P_new = [], []
        for li, K in enumerate(levels):
            if K >= target - 1e-12:            # already out (unreachable)
                W_new.append(np.ones(len(uf)).reshape(len(ug), len(wg)))
                P_new.append(np.ones(len(uf)).reshape(len(ug), len(wg)))
                continue
            c_full = min(ct, target - K)
            if K + ct >= target - 1e-12:       # coupon branch knocks out
                v_in = w0 * (c_full + 1.0)
                p_in = np.ones(len(uf))
            else:
                li_up = min(li + 1, n)
                v_in = w0 * (ct + Ev[:, li_up])
                p_in = Pv[:, li_up]
            v_out = w0 * Ev[:, li]
            p_out = Pv[:, li]
            W_new.append((ind * v_in + (1.0 - ind) * v_out)
                         .reshape(len(ug), len(wg)))
            P_new.append((ind * p_in + (1.0 - ind) * p_out)
                         .reshape(len(ug), len(wg)))
        Wn, Pn, ug_next, wg_next = W_new, P_new, ug, wg
    # integrate from 0: tilted for the price, untilted for the KO prob
    T0 = bounds[0]
    S0 = _g2_functional_cov(
        g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
    price = float(np.interp(T0, Ts, P0)) * _expect_bilinear(
        np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1], S0[1, 2],
        S0[2, 2], ug_next, wg_next, Wn[0], nodes, wq)[0]
    ko_p = _expect_bilinear(
        np.array([0.0]), np.array([0.0]), S0[1, 1], S0[1, 2], S0[2, 2],
        ug_next, wg_next, Pn[0], nodes, wq)[0]
    return G2TarnDP(price=price, ko_prob=float(ko_p), levels=levels)


class G2TarnResult(NamedTuple):
    price: jax.Array
    std_error: jax.Array
    ko_fraction: jax.Array     # fraction of paths that knocked out
    mean_total: jax.Array      # mean cumulative coupon paid
    n_paths: int


@lru_cache(maxsize=None)
def _g2_tarn_fn(cfg: HWConfig, g: G2Params, coupon: float, lo: float,
                hi: float, target: float, start: float, n: int,
                tau: float, m: int, delta: float, n_paths: int,
                n_blocks: int, mesh):
    obs, bounds, dates = _note_dates(start, n, tau, m)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    specs = tuple([("u", t, Ba, Bb) for o in obs for t in o]
                  + [("I", T) for T in bounds[1:]])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    nm = n * m
    ct = coupon * tau
    v_half = [0.5 * _v_integral(g, p) for p in bounds[1:]]

    def compute(key, market):
        edges = [_libor_strip_g2(cfg, g, market, t, delta, lo, hi)
                 for o in obs for t in o]
        c_lo = jnp.stack([e[2] for e in edges]).reshape(n, m)
        c_hi = jnp.stack([e[3] for e in edges]).reshape(n, m)
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             * jnp.exp(jnp.float32(-v_half[j]))
             for j, p in enumerate(bounds[1:])])

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, nm + n), jnp.float32)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :nm].reshape(-1, n, m)
                integral = sgn * z[:, nm:]
                in_band = ((u >= c_lo[None, :, :])
                           & (u <= c_hi[None, :, :]))
                fr = jnp.mean(in_band.astype(jnp.float32), axis=2)
                discs = disc0[None, :] * jnp.exp(-integral)
                alive = jnp.ones(u.shape[0], jnp.float32)
                K = jnp.zeros(u.shape[0], jnp.float32)
                V = jnp.zeros(u.shape[0], jnp.float32)
                for j in range(n):
                    c = jnp.minimum(ct * fr[:, j], target - K)
                    ko = (K + ct * fr[:, j] >= target - 1e-12).astype(
                        jnp.float32)
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


def price_tarn_g2(cfg: HWConfig, g: G2Params, key, market: MarketCurve, *,
                  coupon: float, lo: float, hi: float, target: float,
                  start: float | None = None, tenor: float = 4.0,
                  freq: float = 1.0, obs_per_period: int = 1,
                  libor_tenor: float | None = None,
                  n_paths: int | None = None, n_blocks: int = 1,
                  mesh=None) -> G2TarnResult:
    """Monte Carlo G2++ range-accrual TARN from the exact multi-date
    functionals (antithetic): obs_per_period = 1 (the default) is the
    lattice case pinned EXACTLY by ``dp_oracle_tarn_g2``; larger m is
    supported by the MC (the oracle lattice no longer applies).  Blocks
    key on the global index; optionally sharded over ``mesh``."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    m = int(obs_per_period)
    if libor_tenor is None:
        libor_tenor = tau / m
    out = _g2_tarn_fn(cfg, g, float(coupon), float(lo), float(hi),
                      float(target), float(start), n, float(tau), m,
                      float(libor_tenor), int(n_paths), int(n_blocks),
                      mesh)(key, market)
    return G2TarnResult(price=out[0], std_error=out[1], ko_fraction=out[2],
                        mean_total=out[3],
                        n_paths=int(n_paths) * int(n_blocks))


class G2NoteVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_range_note_g2(cfg: HWConfig, g: G2Params, key,
                       market: MarketCurve, *, coupon: float, lo: float,
                       hi: float, start: float | None = None,
                       tenor: float = 4.0, freq: float = 1.0,
                       obs_per_period: int = 5,
                       libor_tenor: float | None = None,
                       eps: float = 1e-3, n_paths: int | None = None,
                       n_blocks: int = 1, mesh=None,
                       dp_kwargs: dict | None = None) -> G2NoteVega:
    """CRN central-difference d price / d sigma (the x-factor vol) of
    the G2++ puttable note with the put BOUNDARY CURVES frozen at the
    base-sigma DP policy (envelope theorem: at the optimal boundary the
    policy derivative contributes zero first order).  Oracle: the same
    central difference of the fp64 2-d DP, which RE-OPTIMIZES the curve
    at each bump — agreement also checks the envelope argument for the
    curved 2-d boundary.  CRN by key reuse (the functional Cholesky
    carries all sigma dependence, the vega_zbc_g2 convention); the CV's
    exact mean is recomputed per bump so each side stays unbiased."""
    if start is None:
        start = cfg.s1
    kw = dict(coupon=coupon, lo=lo, hi=hi, start=start, tenor=tenor,
              freq=freq, obs_per_period=obs_per_period,
              libor_tenor=libor_tenor)
    dkw = dict(dp_kwargs or {})
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    base = dp_oracle_range_note_g2(cfg, g, market, **kw, **dkw)
    dp_m = dp_oracle_range_note_g2(cfg, gm, market, **kw, **dkw)
    dp_p = dp_oracle_range_note_g2(cfg, gp, market, **kw, **dkw)
    mc = dict(kw, boundaries=base.boundaries, n_paths=n_paths,
              n_blocks=n_blocks, mesh=mesh)
    p_m = price_range_note_g2(cfg, gm, key, market, **mc).price
    p_p = price_range_note_g2(cfg, gp, key, market, **mc).price
    return G2NoteVega(vega=(p_p - p_m) / (2.0 * eps),
                      dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                      price_minus=p_m, price_plus=p_p, epsilon=eps)


# ---------------------------------------------------------------------------
# G2++ issuer-callable capped floater (two-factor twin of floater.py,
# widening the reference product layer src/2_option_pricing.cu:14-35):
# coupon clip(L(T_j; delta) + spread, floor, cap) tau at T_{j+1},
# redemption 1 at T_n, ISSUER call at par at T_1..T_{n-1}.  Under G2++
# the coupon is a deterministic KINKED function of the strip projection
# u (L is increasing in u), so the DP rides the same rotated (u, w)
# machinery as the puttable note with kink nodes (single nodes — the
# value is continuous there) instead of jump double-nodes, the plain
# leg is closed form (tilted lognormal partial moments in u), and the
# issuer policy is a boundary CURVE u*(w): call when u < u*(w) (low
# rates: the spread is expensive to keep paying; the continuation is
# decreasing in u because the coupon is capped while discounting is
# not).  Any fixed issuer policy gives an unbiased UPPER bound (the
# issuer minimizes); with the DP curves the MC reproduces the DP value.
# ---------------------------------------------------------------------------


def _strip_lnA_f64(cfg: HWConfig, g: G2Params, market, t: float,
                   delta: float) -> float:
    """fp64 lnA(t) so that L(t, t+delta) = (e^{u - lnA} - 1)/delta with
    u the strip projection (the host twin of g2pp._libor_strip_g2's
    traced lnA)."""
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    vadj = 0.5 * (_v_integral(g, delta) - _v_integral(g, t + delta)
                  + _v_integral(g, t))
    return (math.log(float(np.interp(t + delta, Ts, P0)))
            - math.log(float(np.interp(t, Ts, P0))) + vadj)


def _strip_lnA_traced(cfg: HWConfig, g: G2Params, market, t: float,
                      delta: float):
    """Traced (market-dependent) lnA, fp32 — the MC-side twin."""
    vadj = 0.5 * (_v_integral(g, delta) - _v_integral(g, t + delta)
                  + _v_integral(g, t))
    return (jnp.log(hw.interp_curve(market.P, jnp.float32(t + delta), cfg))
            - jnp.log(hw.interp_curve(market.P, jnp.float32(t), cfg))
            + jnp.float32(vadj))


def _kink_edge(lnA: float, delta: float, level: float) -> float:
    """u-coordinate of the coupon kink at L + spread = level."""
    if 1.0 + delta * level <= 0.0:
        return -math.inf
    return lnA + math.log1p(delta * level)


class G2FloaterDP(NamedTuple):
    price: float               # fp64 DP value of the callable note
    plain_price: float         # non-callable note (coupons + redemption)
    boundaries: tuple          # per call date: (w-grid, u*(w) tuples);
    call_premium: float        # plain_price - price  (>= 0)


def capped_floater_closed_form_g2(cfg: HWConfig, g: G2Params,
                                  market: MarketCurve, *, cap: float,
                                  floor: float = 0.0, spread: float = 0.0,
                                  start: float | None = None,
                                  tenor: float = 4.0, freq: float = 1.0,
                                  libor_tenor: float | None = None):
    """float64 non-callable capped-floater LEG in closed form under the
    exact G2++ functional law (the two-factor twin of
    floater.capped_floater_closed_form): per period, with u Gaussian
    and tilted mean mu~ = -Cov(u, I(T_p)),

      tau P(0,T_p) [ floor Phi(zf) + cap (1 - Phi(zc)) + spread dPhi
                     + (1/delta)(e^{mu~ + s^2/2 - lnA}
                                 (Phi(zc - s) - Phi(zf - s)) - dPhi) ],

    zf/zc the standardized kink locations u(floor - spread),
    u(cap - spread).  Returns (leg value, per-period list); note value
    = leg + P(0, T_n)."""
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
    total, per = 0.0, []
    for j in range(n):
        t = float(start) + j * tau
        Tp = t + tau
        Sig = _g2_functional_cov(g, (("I", Tp), ("u", t, Ba, Bb)))
        s_u = math.sqrt(Sig[1, 1])
        mu = -Sig[1, 0]
        lnA = _strip_lnA_f64(cfg, g, market, t, delta)
        c_f = _kink_edge(lnA, delta, floor - spread)
        c_c = _kink_edge(lnA, delta, cap - spread)
        zf, zc = (c_f - mu) / s_u, (c_c - mu) / s_u
        Pf, Pc = float(_nphi(zf)), float(_nphi(zc))
        dPhi = Pc - Pf
        emom = math.exp(mu + 0.5 * s_u * s_u - lnA) \
            * float(_nphi(zc - s_u) - _nphi(zf - s_u))
        P0p = float(np.interp(Tp, Ts, P0))
        v = tau * P0p * (floor * Pf + cap * (1.0 - Pc) + spread * dPhi
                         + (emom - dPhi) / delta)
        per.append(v)
        total += v
    return total, per


def dp_oracle_capped_floater_g2(cfg: HWConfig, g: G2Params,
                                market: MarketCurve, *, cap: float,
                                floor: float = 0.0, spread: float = 0.0,
                                start: float | None = None,
                                tenor: float = 4.0, freq: float = 1.0,
                                libor_tenor: float | None = None,
                                n_u: int = 161, n_w: int = 61,
                                width: float = 7.0,
                                n_quad: int = 16) -> G2FloaterDP:
    """fp64 2-d value iteration for the G2++ issuer-callable capped
    floater on rotated (u, w) grids.  The coupon is deterministic and
    kinked at the decision state (kink nodes inserted in the u-grid);
    the issuer minimizes, W_j = min(1, cont), and the call boundary is
    a per-date curve u*(w) (call when u < u*).  The call-disabled plain
    price from the same iteration is pinned against
    ``capped_floater_closed_form_g2`` + P(0, T_n) by the tests."""
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    delta = float(libor_tenor)
    obs, bounds, dates = _note_dates(float(start), n, float(tau), 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    dd = {t: float(np.interp(t, Ts, P0)) * math.exp(-0.5 * _v_integral(g, t))
          for t in bounds}
    lnAs = {t: _strip_lnA_f64(cfg, g, market, t, delta)
            for o in obs for t in o}
    kinks = {t: (_kink_edge(lnAs[t], delta, floor - spread),
                 _kink_edge(lnAs[t], delta, cap - spread))
             for o in obs for t in o}

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        ug = np.linspace(-width * s_u, width * s_u, n_u)
        if t in kinks:
            # +-eps pairs since round 4's cubic surfaces: the coupon is
            # continuous but KINKED at the clip edges, and the zero-width
            # cell marks a slope-segment break (see chooser.grids)
            extra = [v + s for v in kinks[t] for s in (-1e-9, 1e-9)
                     if ug[0] < v < ug[-1] and math.isfinite(v)]
            if extra:
                ug = np.unique(np.concatenate([ug, np.asarray(extra)]))
        return ug, np.linspace(-width * s_w, width * s_w, n_w)

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds}

    def backward(callable_: bool):
        ug_next, wg_next = gr[bounds[n]]
        V = np.ones((len(ug_next), len(wg_next)))     # redemption at T_n
        boundaries = []
        for j in range(n - 1, -1, -1):
            Tj, Tp = bounds[j], bounds[j + 1]
            ug, wg = gr[Tj]
            U, Wm = np.meshgrid(ug, wg, indexing="ij")
            uf, wf = U.ravel(), Wm.ravel()
            interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                                 Ba, Bb, ca, cb)
            assert not interior          # m = 1: the only obs is at T_j
            iu, iw = 1, 2
            m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
            w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
            L = (np.exp(uf - lnAs[Tj]) - 1.0) / delta
            cpn = tau * np.clip(L + spread, floor, cap)
            mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf - C[iu, 0]
            mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf - C[iw, 0]
            Ev = _expect_bilinear(mu_u, mu_w, C[iu, iu], C[iu, iw],
                                  C[iw, iw], ug_next, wg_next, V,
                                  nodes, wq)
            cont = (w0 * (cpn + Ev)).reshape(len(ug), len(wg))

            if callable_ and j >= 1:
                # issuer calls at par: W_j = min(1, cont).  cont is
                # decreasing in u (capped coupon, full discounting), so
                # it crosses 1 at most once per w-column from above:
                # call when u < u*(w).
                span = ug[-1] - ug[0]
                lo_big, hi_big = ug[0] - span, ug[-1] + span
                ustar = []
                for col in range(len(wg)):
                    d = cont[:, col] - 1.0
                    if d[0] <= 0.0:
                        ustar.append(lo_big)       # never call
                        continue
                    cr = np.nonzero(d[:-1] * d[1:] <= 0.0)[0]
                    if len(cr) == 0:
                        ustar.append(hi_big)       # always call
                        continue
                    i = int(cr[0])
                    lam = d[i] / (d[i] - d[i + 1])
                    ustar.append(float(ug[i] + lam * (ug[i + 1] - ug[i])))
                boundaries.append((tuple(float(v) for v in wg),
                                   tuple(ustar)))
                V = np.minimum(1.0, cont)
            else:
                V = cont
            ug_next, wg_next = ug, wg
        T0 = bounds[0]
        S0 = _g2_functional_cov(
            g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
        val = float(np.interp(T0, Ts, P0)) * _expect_bilinear(
            np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1],
            S0[1, 2], S0[2, 2], ug_next, wg_next, V, nodes, wq)[0]
        return val, tuple(reversed(boundaries))

    price, boundaries = backward(True)
    plain, _ = backward(False)
    return G2FloaterDP(price=price, plain_price=plain,
                       boundaries=boundaries,
                       call_premium=plain - price)


class G2FloaterResult(NamedTuple):
    price: jax.Array           # CV upper-bound estimate (issuer policy)
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    call_fraction: jax.Array   # fraction of paths called early
    n_paths: int


@lru_cache(maxsize=None)
def _g2_floater_fn(cfg: HWConfig, g: G2Params, cap: float, floor: float,
                   spread: float, start: float, n: int, tau: float,
                   delta: float, boundaries: tuple, plain_mean: float,
                   n_paths: int, n_blocks: int, mesh):
    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba
    # sample exactly the functionals the payoff touches: u at the n
    # period starts (call dates T_1..T_{n-1} are observations 1..n-1),
    # w there (the second policy coordinate), I at T_1..T_n
    specs = tuple([("u", o[0], Ba, Bb) for o in obs]
                  + [("u", T, ca, cb) for T in bounds[1:n]]
                  + [("I", T) for T in bounds[1:]])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    v_half = [0.5 * _v_integral(g, p) for p in bounds[1:]]
    bw = [jnp.asarray(b[0], jnp.float32) for b in boundaries]
    bu = [jnp.asarray(b[1], jnp.float32) for b in boundaries]

    def compute(key, market):
        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, o[0], delta)
                         for o in obs])
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             * jnp.exp(jnp.float32(-v_half[j]))
             for j, p in enumerate(bounds[1:])])

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, n + (n - 1) + n), jnp.float32)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                          # (paths, n)
                wv = sgn * z[:, n:n + n - 1]                # (paths, n-1)
                integral = sgn * z[:, n + n - 1:]           # (paths, n)
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                crate = jnp.clip(L + spread, floor, cap)
                discs = disc0[None, :] * jnp.exp(-integral)
                cpn = [tau * crate[:, j] * discs[:, j] for j in range(n)]
                alive = jnp.ones(u.shape[0], jnp.float32)
                V = cpn[0]                  # period-0 coupon always accrues
                Y = cpn[0]                  # CV: non-callable note
                for j in range(1, n):
                    ustar = uinterp(bw[j - 1], bu[j - 1],
                                    wv[:, j - 1])
                    call = (u[:, j] < ustar).astype(jnp.float32)
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


def price_capped_floater_g2(cfg: HWConfig, g: G2Params, key,
                            market: MarketCurve, *, cap: float,
                            floor: float = 0.0, spread: float = 0.0,
                            start: float | None = None, tenor: float = 4.0,
                            freq: float = 1.0,
                            libor_tenor: float | None = None,
                            boundaries: tuple | None = None,
                            n_paths: int | None = None, n_blocks: int = 1,
                            mesh=None) -> G2FloaterResult:
    """Monte Carlo upper bound for the G2++ issuer-callable capped
    floater under the fixed boundary-curve policy ``boundaries``
    (default: read off the fp64 2-d DP oracle; any fixed issuer policy
    is an unbiased upper bound — with the DP curves the estimate
    reproduces ``dp_oracle_capped_floater_g2`` to MC noise).  The
    non-callable note is the control variate with its EXACT closed-form
    mean.  Blocks key on their global index; optionally sharded over
    ``mesh``."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    if n < 2:
        raise ValueError("callable floater needs tenor * freq >= 2 periods")
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    kw = dict(cap=cap, floor=floor, spread=spread, start=start,
              tenor=tenor, freq=freq, libor_tenor=libor_tenor)
    if boundaries is None:
        boundaries = dp_oracle_capped_floater_g2(cfg, g, market,
                                                 **kw).boundaries
    leg, _ = capped_floater_closed_form_g2(cfg, g, market, **kw)
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0n = float(np.interp(start + n * tau, Ts,
                          np.asarray(market.P, np.float64)))
    out = _g2_floater_fn(cfg, g, float(cap), float(floor), float(spread),
                         float(start), n, float(tau), float(libor_tenor),
                         boundaries, float(leg + P0n), int(n_paths),
                         int(n_blocks), mesh)(key, market)
    return G2FloaterResult(price=out[0], std_error=out[1],
                           raw_price=out[2], raw_std_error=out[3],
                           beta=out[4], call_fraction=out[5],
                           n_paths=int(n_paths) * int(n_blocks))


def vega_capped_floater_g2(cfg: HWConfig, g: G2Params, key,
                           market: MarketCurve, *, cap: float,
                           floor: float = 0.0, spread: float = 0.0,
                           start: float | None = None, tenor: float = 4.0,
                           freq: float = 1.0,
                           libor_tenor: float | None = None,
                           eps: float = 1e-3, n_paths: int | None = None,
                           n_blocks: int = 1, mesh=None,
                           dp_kwargs: dict | None = None) -> G2NoteVega:
    """CRN central-difference d price / d sigma (the x-factor vol) of
    the G2++ callable floater with the call BOUNDARY CURVES frozen at
    the base-sigma DP policy (envelope theorem at the issuer-optimal
    boundary).  Oracle: the same central difference of the fp64 2-d DP,
    which re-optimizes at each bump.  CRN by key reuse; the CV's exact
    mean is recomputed per bump so each side stays unbiased."""
    if start is None:
        start = cfg.s1
    kw = dict(cap=cap, floor=floor, spread=spread, start=start,
              tenor=tenor, freq=freq, libor_tenor=libor_tenor)
    dkw = dict(dp_kwargs or {})
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    base = dp_oracle_capped_floater_g2(cfg, g, market, **kw, **dkw)
    dp_m = dp_oracle_capped_floater_g2(cfg, gm, market, **kw, **dkw)
    dp_p = dp_oracle_capped_floater_g2(cfg, gp, market, **kw, **dkw)
    mc = dict(kw, boundaries=base.boundaries, n_paths=n_paths,
              n_blocks=n_blocks, mesh=mesh)
    p_m = price_capped_floater_g2(cfg, gm, key, market, **mc).price
    p_p = price_capped_floater_g2(cfg, gp, key, market, **mc).price
    return G2NoteVega(vega=(p_p - p_m) / (2.0 * eps),
                      dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                      price_minus=p_m, price_plus=p_p, epsilon=eps)


# ---------------------------------------------------------------------------
# G2++ snowball note (two-factor twin of snowball.py): the coupon RATE
# accumulates path-dependently, c_j = clip(c_{j-1} + spread - L(T_j),
# floor, cap), paying tau c_j at T_{j+1} and redeeming 1 at T_n.  L is a
# deterministic increasing function of the strip projection u, so the
# CONTINUOUS coupon state joins the rotated-coordinate machinery as a
# third axis: the fp64 oracle iterates over (u, w, c) with the c-levels
# riding _expect_bilinear_multi's surface batch (one Phi assembly per
# Hermite node serves every c-level's every w'-column), then blends
# linearly in c at the deterministic update — exactly the HW snowball's
# c-interpolation, on the 2-d conditional machinery.  The MC is
# unbiased (no policy); the UNCLIPPED linear snowball is the control
# variate with its exact closed-form mean (tilted lognormal moments in
# u), and E[c_{n-1}] runs as an untilted cross-observable.
# ---------------------------------------------------------------------------


class G2SnowballDP(NamedTuple):
    price: float               # fp64 DP value of the snowball note
    linear_price: float        # unclipped linear snowball (closed form)
    mean_final_coupon: float   # E[c_{n-1}] under the real measure (DP)
    c_grid: tuple


def snowball_linear_closed_form_g2(cfg: HWConfig, g: G2Params,
                                   market: MarketCurve, *, initial: float,
                                   spread: float,
                                   start: float | None = None,
                                   tenor: float = 4.0, freq: float = 1.0,
                                   libor_tenor: float | None = None):
    """float64 UNCLIPPED G2++ snowball value in closed form: with
    c_j = c_0 + j spread - sum_{i<=j} L_i and E[e^{-I(T_p)}] = P(0,T_p)
    exact under the functional law,

      V = sum_j tau P(0,T_{j+1}) [ c_0 + j spread
                                   - sum_{i<=j} tilted_L(T_i, T_{j+1}) ]
          + P(0, T_n),

    tilted_L(t, T_p) = (e^{mu~ + s^2/2 - lnA} - 1)/delta with
    mu~ = -Cov(u_t, I(T_p)) — the G2 analogue of the HW snowball's
    tilted lognormal moment.  Returns (value, per-period list)."""
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
    obs = tuple(float(start) + j * tau for j in range(n))
    pays = tuple(float(start) + (j + 1) * tau for j in range(n))

    def tilted_L(t, T_p):
        Sig = _g2_functional_cov(g, (("I", T_p), ("u", t, Ba, Bb)))
        mu = -Sig[1, 0]
        s2 = Sig[1, 1]
        lnA = _strip_lnA_f64(cfg, g, market, t, delta)
        return (math.exp(mu + 0.5 * s2 - lnA) - 1.0) / delta

    total, per = 0.0, []
    for j in range(n):
        P0p = float(np.interp(pays[j], Ts, P0))
        c_mean = initial + j * spread - sum(tilted_L(obs[i], pays[j])
                                            for i in range(1, j + 1))
        v = tau * P0p * c_mean
        per.append(v)
        total += v
    total += float(np.interp(pays[-1], Ts, P0))
    return total, per


def _g2_snowball_dp(cfg: HWConfig, g: G2Params, market: MarketCurve, *,
                    initial: float, spread: float, cap: float,
                    floor: float, start: float, n: int, tau: float,
                    delta: float, n_u: int, n_w: int, n_c: int,
                    width: float, n_quad: int, callable_: bool = False):
    """Shared fp64 (u, w, c) value iteration for the G2++ snowball
    family.  With ``callable_`` the ISSUER may call at par at every
    interior boundary T_1..T_{n-1} (decision state: (u_j, w_j) and the
    running coupon c_{j-1}): the value gets min(1, .) per c-level and
    the call boundary becomes a per-date SURFACE u*(w, c_l) read off
    the crossing per (w-column, c-level) — call when u < u* (the note
    is worth most when rates are low).  Never/always-call levels are
    clamped one u-span outside the grid so the MC's bilinear (w, c)
    interpolation stays finite.  Returns (price, mean_final_coupon,
    boundaries, cs) with boundaries = () unless ``callable_``; each
    boundaries entry is (w-grid tuple, (n_c, n_w) u*(w, c) rows)."""
    obs, bounds, dates = _note_dates(float(start), n, float(tau), 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba

    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P0 = np.asarray(market.P, np.float64)
    dd = {t: float(np.interp(t, Ts, P0)) * math.exp(-0.5 * _v_integral(g, t))
          for t in bounds}
    lnAs = {o[0]: _strip_lnA_f64(cfg, g, market, o[0], delta) for o in obs}
    cs = np.linspace(floor, cap, n_c)

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        return (np.linspace(-width * s_u, width * s_u, n_u),
                np.linspace(-width * s_w, width * s_w, n_w))

    def c_interp(M, c_new):
        """Blend columns of M (n_src, n_c) linearly in c at c_new."""
        k = np.clip(np.searchsorted(cs, c_new) - 1, 0, n_c - 2)
        dc = cs[k + 1] - cs[k]
        lam = np.clip((c_new - cs[k]) / np.where(dc > 0, dc, 1.0),
                      0.0, 1.0)
        rows = np.arange(len(c_new))
        return (1.0 - lam) * M[rows, k] + lam * M[rows, k + 1]

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds}

    ug_next, wg_next = gr[bounds[n]]
    shape = (len(ug_next), len(wg_next))
    Wn = [np.ones(shape) for _ in range(n_c)]         # value per c-level
    Cn = [np.full(shape, c) for c in cs]              # E[c_{n-1}] per level
    bnds = []
    for j in range(n - 1, -1, -1):
        Tj, Tp = bounds[j], bounds[j + 1]
        ug, wg = gr[Tj]
        U, Wm = np.meshgrid(ug, wg, indexing="ij")
        uf, wf = U.ravel(), Wm.ravel()
        interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                             Ba, Bb, ca, cb)
        assert not interior          # m = 1: the only obs is at T_j
        iu, iw = 1, 2
        m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
        w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
        mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf - C[iu, 0]
        mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf - C[iw, 0]
        ru_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf
        ru_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf
        Ev = _expect_bilinear_multi(mu_u, mu_w, C[iu, iu], C[iu, iw],
                                    C[iw, iw], ug_next, wg_next, Wn,
                                    nodes, wq)
        Cv = _expect_bilinear_multi(ru_u, ru_w, C[iu, iu], C[iu, iw],
                                    C[iw, iw], ug_next, wg_next, Cn,
                                    nodes, wq)
        L = (np.exp(uf - lnAs[Tj]) - 1.0) / delta
        W_new, C_new = [], []
        for l, c_prev in enumerate(cs):
            c_new = (np.full(len(uf), initial) if j == 0
                     else np.clip(c_prev + spread - L, floor, cap))
            W_new.append((w0 * (tau * c_new + c_interp(Ev, c_new)))
                         .reshape(len(ug), len(wg)))
            cv = c_interp(Cv, c_new) if j < n - 1 else c_new
            C_new.append(cv.reshape(len(ug), len(wg)))
        if callable_ and 1 <= j:
            # issuer calls at par at T_j (decision state: (u, w) and
            # the running coupon level): the value is decreasing in u
            # per (w, c) — the coupon melts and the discounting deepens
            # as rates rise — so min(1, W) flips on at most one
            # crossing u*(w, c_l) per column
            span = ug[-1] - ug[0]
            rows = []
            for l in range(n_c):
                row = []
                for col in range(len(wg)):
                    v = W_new[l][:, col]
                    if v[0] > 1.0 > v[-1]:
                        ub = float(np.interp(-1.0, -v, ug))
                    elif v[0] <= 1.0:
                        ub = ug[0] - span      # never call at this level
                    else:
                        ub = ug[-1] + span     # always call
                    row.append(ub)
                rows.append(tuple(row))
            bnds.append((tuple(float(v) for v in wg), tuple(rows)))
            W_new = [np.minimum(1.0, Wl) for Wl in W_new]
        Wn, Cn, ug_next, wg_next = W_new, C_new, ug, wg
    # integrate from 0 (every c-column is identical at j = 0: the first
    # coupon is `initial` regardless of c_prev — use column 0)
    T0 = bounds[0]
    S0 = _g2_functional_cov(
        g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
    price = float(np.interp(T0, Ts, P0)) * _expect_bilinear(
        np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1], S0[1, 2],
        S0[2, 2], ug_next, wg_next, Wn[0], nodes, wq)[0]
    mean_c = _expect_bilinear(
        np.array([0.0]), np.array([0.0]), S0[1, 1], S0[1, 2], S0[2, 2],
        ug_next, wg_next, Cn[0], nodes, wq)[0]
    return price, float(mean_c), tuple(reversed(bnds)), tuple(cs)


def dp_oracle_snowball_g2(cfg: HWConfig, g: G2Params, market: MarketCurve,
                          *, initial: float, spread: float, cap: float,
                          floor: float = 0.0, start: float | None = None,
                          tenor: float = 4.0, freq: float = 1.0,
                          libor_tenor: float | None = None,
                          n_u: int = 161, n_w: int = 61, n_c: int = 41,
                          width: float = 7.0,
                          n_quad: int = 16) -> G2SnowballDP:
    """fp64 value iteration for the G2++ snowball over (u, w, c): the
    c-levels are value surfaces batched through
    ``_expect_bilinear_multi`` (tilted for the value, untilted for
    E[c_{n-1}]), blended linearly in c at the deterministic update
    c' = clip(c + spread - L(u), floor, cap).  With clip bounds the
    paths cannot reach, the DP must collapse to
    ``snowball_linear_closed_form_g2`` (pinned by the tests)."""
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    price, mean_c, _, cs = _g2_snowball_dp(
        cfg, g, market, initial=initial, spread=spread, cap=cap,
        floor=floor, start=float(start), n=n, tau=tau,
        delta=float(libor_tenor), n_u=n_u, n_w=n_w, n_c=n_c, width=width,
        n_quad=n_quad)
    lin, _ = snowball_linear_closed_form_g2(
        cfg, g, market, initial=initial, spread=spread, start=start,
        tenor=tenor, freq=freq, libor_tenor=libor_tenor)
    return G2SnowballDP(price=price, linear_price=lin,
                        mean_final_coupon=mean_c, c_grid=cs)


class G2CallableSnowballDP(NamedTuple):
    price: float               # fp64 DP value of the callable snowball
    plain_price: float         # call-disabled snowball DP value
    boundaries: tuple          # per call date: (w-grid, (n_c, n_w) u*)
    call_premium: float        # plain_price - price  (>= 0)
    c_grid: tuple


def dp_oracle_callable_snowball_g2(cfg: HWConfig, g: G2Params,
                                   market: MarketCurve, *, initial: float,
                                   spread: float, cap: float,
                                   floor: float = 0.0,
                                   start: float | None = None,
                                   tenor: float = 4.0, freq: float = 1.0,
                                   libor_tenor: float | None = None,
                                   n_u: int = 161, n_w: int = 61,
                                   n_c: int = 41, width: float = 7.0,
                                   n_quad: int = 16
                                   ) -> G2CallableSnowballDP:
    """fp64 value iteration for the G2++ ISSUER-CALLABLE snowball: the
    (u, w, c) snowball DP with min(1, .) per c-level at every interior
    boundary and the call boundary SURFACE u*(w, c) read off the
    crossing — the two-factor twin of
    ``snowball.dp_oracle_callable_snowball`` (whose boundary is the
    curve r*(c)); the extra w-axis is the orthogonal factor direction
    the issuer also observes."""
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=float(start), n=n, tau=tau, delta=float(libor_tenor),
              n_u=n_u, n_w=n_w, n_c=n_c, width=width, n_quad=n_quad)
    price, _, bnds, cs = _g2_snowball_dp(cfg, g, market, callable_=True,
                                         **kw)
    plain, _, _, _ = _g2_snowball_dp(cfg, g, market, **kw)
    return G2CallableSnowballDP(price=price, plain_price=plain,
                                boundaries=bnds,
                                call_premium=plain - price, c_grid=cs)


class G2SnowballResult(NamedTuple):
    price: jax.Array           # CV estimate
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    mean_final_coupon: jax.Array
    n_paths: int


@lru_cache(maxsize=None)
def _g2_snowball_fn(cfg: HWConfig, g: G2Params, initial: float,
                    spread: float, cap: float, floor: float, start: float,
                    n: int, tau: float, delta: float, linear_mean: float,
                    n_paths: int, n_blocks: int,
                    rqmc: bool, mesh):
    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    # sample exactly the functionals the payoff touches: u at the n
    # period starts, I at the n payments
    specs = tuple([("u", o[0], Ba, Bb) for o in obs]
                  + [("I", T) for T in bounds[1:]])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    v_half = [0.5 * _v_integral(g, p) for p in bounds[1:]]

    def compute(key, market):
        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, o[0], delta)
                         for o in obs])
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             * jnp.exp(jnp.float32(-v_half[j]))
             for j, p in enumerate(bounds[1:])])

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n,
                                    rqmc)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                          # (paths, n)
                integral = sgn * z[:, n:]                   # (paths, n)
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                discs = disc0[None, :] * jnp.exp(-integral)
                c = jnp.full(u.shape[0], initial, jnp.float32)
                cl = jnp.full(u.shape[0], initial, jnp.float32)
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
            V, Y, Cc = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Cp + Cm)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y), jnp.sum(Cc)])

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


def price_snowball_g2(cfg: HWConfig, g: G2Params, key,
                      market: MarketCurve, *, initial: float,
                      spread: float, cap: float, floor: float = 0.0,
                      start: float | None = None, tenor: float = 4.0,
                      freq: float = 1.0, libor_tenor: float | None = None,
                      n_paths: int | None = None, n_blocks: int = 1,
                      rqmc: bool = False, mesh=None) -> G2SnowballResult:
    """Monte Carlo G2++ snowball from exactly-sampled (u, I) functionals
    (antithetic), UNBIASED (no policy), with the unclipped linear
    snowball as control variate against its exact closed-form mean;
    ``dp_oracle_snowball_g2`` pins the price.  Blocks key on their
    global index; optionally sharded over ``mesh``."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    linear_mean, _ = snowball_linear_closed_form_g2(
        cfg, g, market, initial=initial, spread=spread, start=start,
        tenor=tenor, freq=freq, libor_tenor=libor_tenor)
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _g2_snowball_fn(cfg, g, float(initial), float(spread),
                          float(cap), float(floor), float(start), n,
                          float(tau), float(libor_tenor),
                          float(linear_mean), int(n_paths), int(n_blocks),
                          bool(rqmc), mesh)(key, market)
    return G2SnowballResult(price=out[0], std_error=out[1],
                            raw_price=out[2], raw_std_error=out[3],
                            beta=out[4], mean_final_coupon=out[5],
                            n_paths=int(n_paths) * int(n_blocks))


def vega_snowball_g2(cfg: HWConfig, g: G2Params, key,
                     market: MarketCurve, *, initial: float, spread: float,
                     cap: float, floor: float = 0.0,
                     start: float | None = None, tenor: float = 4.0,
                     freq: float = 1.0, libor_tenor: float | None = None,
                     eps: float = 1e-3, n_paths: int | None = None,
                     n_blocks: int = 1, mesh=None,
                     dp_kwargs: dict | None = None) -> G2NoteVega:
    """CRN central-difference d price / d sigma (the x-factor vol) of
    the G2++ snowball (key reuse; the CV's exact mean is recomputed per
    bump).  Oracle: the central difference of the fp64 3-axis DP.  No
    policy freezing is needed — the snowball has no exercise right."""
    if start is None:
        start = cfg.s1
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=start, tenor=tenor, freq=freq,
              libor_tenor=libor_tenor)
    dkw = dict(dp_kwargs or {})
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    dp_m = dp_oracle_snowball_g2(cfg, gm, market, **kw, **dkw)
    dp_p = dp_oracle_snowball_g2(cfg, gp, market, **kw, **dkw)
    mc = dict(kw, n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    p_m = price_snowball_g2(cfg, gm, key, market, **mc).price
    p_p = price_snowball_g2(cfg, gp, key, market, **mc).price
    return G2NoteVega(vega=(p_p - p_m) / (2.0 * eps),
                      dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                      price_minus=p_m, price_plus=p_p, epsilon=eps)


class G2CallableSnowballResult(NamedTuple):
    price: jax.Array           # CV upper-bound estimate (issuer policy)
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient (plain-note leg)
    call_fraction: jax.Array   # fraction of paths called early
    n_paths: int


@lru_cache(maxsize=None)
def _g2_callable_snowball_fn(cfg: HWConfig, g: G2Params, initial: float,
                             spread: float, cap: float, floor: float,
                             start: float, n: int, tau: float,
                             delta: float, boundaries: tuple, cs: tuple,
                             plain_mean: float, n_paths: int,
                             n_blocks: int, mesh):
    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba
    # sample u at the n period starts (coupon + policy), w at the
    # interior call dates T_1..T_{n-1}, I at the n payments
    specs = tuple([("u", o[0], Ba, Bb) for o in obs]
                  + [("u", T, ca, cb) for T in bounds[1:n]]
                  + [("I", T) for T in bounds[1:]])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    v_half = [0.5 * _v_integral(g, p) for p in bounds[1:]]
    CS = jnp.asarray(cs, jnp.float32)
    n_c = len(cs)
    bw = [jnp.asarray(b[0], jnp.float32) for b in boundaries]
    bu = [jnp.asarray(np.asarray(b[1], np.float64), jnp.float32)
          for b in boundaries]              # (n_c, n_w) per call date

    def compute(key, market):
        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, o[0], delta)
                         for o in obs])
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             * jnp.exp(jnp.float32(-v_half[j]))
             for j, p in enumerate(bounds[1:])])

        def block(bi):
            x = jax.random.normal(jax.random.fold_in(key, bi),
                                  (n_paths, n + (n - 1) + n), jnp.float32)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                          # centered
                wv = sgn * z[:, n:n + n - 1]
                discs = disc0[None, :] * jnp.exp(-sgn * z[:, n + n - 1:])
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                c = jnp.full(u.shape[0], initial, jnp.float32)
                alive = jnp.ones(u.shape[0], jnp.float32)
                V = tau * c * discs[:, 0]
                Y = V                      # CV: the non-callable note
                for j in range(1, n):
                    # issuer decision at T_j: state (u_j, w_j, c_{j-1});
                    # boundary surface bilinear in (w, coupon)
                    bwj, buj = bw[j - 1], bu[j - 1]
                    uw = (wv[:, j - 1] - bwj[0]) / (bwj[1] - bwj[0])
                    iw = jnp.clip(jnp.floor(uw), 0,
                                  bwj.shape[0] - 2).astype(jnp.int32)
                    lw = jnp.clip(uw - iw, 0.0, 1.0)
                    ic = jnp.clip(jnp.searchsorted(CS, c) - 1,
                                  0, n_c - 2)
                    dc = CS[ic + 1] - CS[ic]
                    lc = jnp.clip((c - CS[ic])
                                  / jnp.where(dc > 0, dc, 1.0), 0.0, 1.0)
                    lo = (1.0 - lw) * buj[ic, iw] + lw * buj[ic, iw + 1]
                    hi = ((1.0 - lw) * buj[ic + 1, iw]
                          + lw * buj[ic + 1, iw + 1])
                    ub = (1.0 - lc) * lo + lc * hi
                    call_now = alive * (u[:, j] < ub).astype(jnp.float32)
                    V = V + call_now * discs[:, j - 1]     # par at T_j
                    alive = alive - call_now
                    c = jnp.clip(c + spread - L[:, j], floor, cap)
                    V = V + alive * tau * c * discs[:, j]
                    Y = Y + tau * c * discs[:, j]
                V = V + alive * discs[:, n - 1]
                Y = Y + discs[:, n - 1]
                # second CV: the deterministic "call at T_1" leg
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

        # exact mean of the second CV: E[e^{-I(T_1)}] = P(0, T_1)
        z_mean = ((1.0 + tau * initial)
                  * hw.interp_curve(market.P, jnp.float32(bounds[1]),
                                    cfg))
        s = jnp.sum(pmesh.map_blocks(block, n_blocks, mesh), axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my, mz = s[0] / n_tot, s[2] / n_tot, s[4] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        var_z = jnp.maximum(s[5] / n_tot - mz * mz, 1e-30)
        c_vy = s[6] / n_tot - mv * my
        c_vz = s[7] / n_tot - mv * mz
        c_yz = s[8] / n_tot - my * mz
        det = jnp.maximum(var_y * var_z - c_yz * c_yz, 1e-30)
        b_y = (var_z * c_vy - c_yz * c_vz) / det
        b_z = (var_y * c_vz - c_yz * c_vy) / det
        price = mv - b_y * (my - plain_mean) - b_z * (mz - z_mean)
        var_cv = jnp.maximum(var_v - b_y * c_vy - b_z * c_vz, 0.0)
        bessel = n_tot / jnp.maximum(n_tot - 1.0, 1.0)
        return (price, jnp.sqrt(bessel * var_cv / n_tot), mv,
                jnp.sqrt(bessel * var_v / n_tot), b_y, s[9] / n_tot)

    return jax.jit(compute)


def price_callable_snowball_g2(cfg: HWConfig, g: G2Params, key,
                               market: MarketCurve, *, initial: float,
                               spread: float, cap: float,
                               floor: float = 0.0,
                               start: float | None = None,
                               tenor: float = 4.0, freq: float = 1.0,
                               libor_tenor: float | None = None,
                               boundaries: tuple | None = None,
                               c_grid: tuple | None = None,
                               plain_mean: float | None = None,
                               n_paths: int | None = None,
                               n_blocks: int = 1, mesh=None,
                               dp_kwargs: dict | None = None
                               ) -> G2CallableSnowballResult:
    """Monte Carlo upper bound for the G2++ issuer-callable snowball
    under the fixed boundary-SURFACE policy u*(w, c) per call date
    (default: read off the fp64 (u, w, c) DP; any fixed issuer policy
    is an unbiased upper bound).  The issuer calls at T_j when
    u_j < u*_j(w_j, c_{j-1}), bilinear in (w, running coupon).  CVs: the
    non-callable snowball anchored at its DP mean, plus the
    deterministic call-at-T_1 leg at its exact closed-form mean."""
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if libor_tenor is None:
        libor_tenor = tau
    if boundaries is None or c_grid is None or plain_mean is None:
        dp = dp_oracle_callable_snowball_g2(
            cfg, g, market, initial=initial, spread=spread, cap=cap,
            floor=floor, start=start, tenor=tenor, freq=freq,
            libor_tenor=libor_tenor, **(dp_kwargs or {}))
        if boundaries is None or c_grid is None:
            boundaries, c_grid = dp.boundaries, dp.c_grid
        if plain_mean is None:
            plain_mean = dp.plain_price
    out = _g2_callable_snowball_fn(
        cfg, g, float(initial), float(spread), float(cap), float(floor),
        float(start), n, float(tau), float(libor_tenor),
        tuple(boundaries), tuple(float(v) for v in c_grid),
        float(plain_mean), int(n_paths), int(n_blocks), mesh)(key, market)
    return G2CallableSnowballResult(
        price=out[0], std_error=out[1], raw_price=out[2],
        raw_std_error=out[3], beta=out[4], call_fraction=out[5],
        n_paths=int(n_paths) * int(n_blocks))


def vega_callable_snowball_g2(cfg: HWConfig, g: G2Params, key,
                              market: MarketCurve, *, initial: float,
                              spread: float, cap: float,
                              floor: float = 0.0,
                              start: float | None = None,
                              tenor: float = 4.0, freq: float = 1.0,
                              libor_tenor: float | None = None,
                              eps: float = 1e-3,
                              n_paths: int | None = None,
                              n_blocks: int = 1, mesh=None,
                              dp_kwargs: dict | None = None
                              ) -> G2NoteVega:
    """CRN central-difference d price / d sigma (the x-factor vol) with
    the call boundary SURFACES frozen at the base-sigma DP policy
    (envelope theorem at the issuer-optimal boundary); oracle: the
    re-optimizing fp64 DP's own FD.  The CV's DP mean is recomputed per
    bump so each side stays anchored at its own sigma."""
    if start is None:
        start = cfg.s1
    dpk = dp_kwargs or {}
    kw = dict(initial=initial, spread=spread, cap=cap, floor=floor,
              start=start, tenor=tenor, freq=freq,
              libor_tenor=libor_tenor)
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    base = dp_oracle_callable_snowball_g2(cfg, g, market, **kw, **dpk)
    dp_m = dp_oracle_callable_snowball_g2(cfg, gm, market, **kw, **dpk)
    dp_p = dp_oracle_callable_snowball_g2(cfg, gp, market, **kw, **dpk)
    mc = dict(kw, boundaries=base.boundaries, c_grid=base.c_grid,
              n_paths=n_paths, n_blocks=n_blocks, mesh=mesh)
    p_m = price_callable_snowball_g2(cfg, gm, key, market,
                                     plain_mean=dp_m.plain_price,
                                     **mc).price
    p_p = price_callable_snowball_g2(cfg, gp, key, market,
                                     plain_mean=dp_p.plain_price,
                                     **mc).price
    return G2NoteVega(vega=(p_p - p_m) / (2.0 * eps),
                      dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                      price_minus=p_m, price_plus=p_p,
                      epsilon=float(eps))
