"""Chooser (flexi) cap and auto-cap under Hull-White.

A cap with an EXERCISE BUDGET: the holder owns n caplets (fixing T_j,
payment T_{j+1}, strike ``rate``) but may collect at most ``k`` of them.

* **auto-cap**: the first k in-the-money caplets pay automatically —
  path-dependent through the used-rights count, no optimization;
* **chooser cap**: the holder CHOOSES which caplets to exercise — a
  multi-exercise (swing) optimal-stopping problem, the canonical
  extension of the Bermudan single-right structure the reference's
  product layer stops short of (src/2_option_pricing.cu:14-35).

The rights count c lives on the lattice {0..k}, so the fp64 oracle is a
value iteration over (c, r-grid) — the same lattice-axis machinery as
``range_note.dp_oracle_tarn`` — with the caplet cash a DETERMINISTIC
kinked function of the decision state r(T_j) (kink node inserted at
L(r) = rate) and the continuation integrated per c-level by ONE
(G, k+1)-batched exact piecewise-linear cell kernel
(``range_note._kernel_avg``).  Exercising does NOT stop the product:
V_j(r, c) = max(cp(r) + E[V(c-1)], E[V(c)]), both branches tilted by
the same e^{-Delta I} factor, so the comparison happens untilted.

Two exact internal pins fall out of the same iteration:

* a side "full cap" column (every caplet collected) must equal the
  caplet-replication closed form ``instruments.cap_closed_form`` (up to
  the discrete-trapezoid-law vs continuous-law gap, ~1e-6 at the
  reference step count), and is the MC control variate's exact mean
  under the SAME discrete law the sampler integrates;
* chooser(k = n) == auto(k = n) == that full cap.

The MC estimator applies the FIXED DP policy — exercise right c at T_j
when r(T_j) > r*_{j,c}, thresholds read off the DP's own marginal-value
comparison — to exactly-sampled multi-date (r, I) functionals
(bermudan._functional_chol), with the full cap as control variate.  Any
fixed policy is an unbiased LOWER bound on the holder-optimal chooser
value; with the DP thresholds it reproduces the DP to MC noise.  The
auto-cap's policy is intrinsic (exercise when in the money while the
budget lasts), so its MC is exact-policy, not a bound.

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
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .ops.interp import uinterp
from .parallel import mesh as pmesh
from .range_note import _kernel_avg, _note_dates, _note_shapes, _r_band
from .floater import _libor_terms


class ChooserDP(NamedTuple):
    price: float               # fp64 DP value with k rights
    cap_price: float           # full cap (all n caplets) from the same DP
    boundaries: tuple          # (n, k+1) rows: r*_{j,c}; exercise r > r*
    k: int
    auto: bool
    profile_x: tuple = ()      # r-grid at the first fixing T_0
    profile_marg: tuple = ()   # marginal right value E[V(k)] - E[V(k-1)]


def dp_oracle_chooser_cap(cfg: HWConfig, market: MarketCurve, *,
                          rate: float, k: int, start: float | None = None,
                          tenor: float = 5.0, freq: float = 1.0,
                          sigma: float | None = None, auto: bool = False,
                          n_grid: int = 801,
                          width: float = 8.0) -> ChooserDP:
    """fp64 value iteration for the chooser cap (or auto-cap) on a
    (rights-lattice, r-grid) state space.  Conditioning is the Gaussian
    projection of the model's exact discrete-law covariances (the
    ``range_note.dp_oracle_range_note`` construction, so the oracle
    integrates the SAME law the MC samples).  Returns the DP price, the
    full-cap side column (the closed-form pin and the MC CV mean), and
    the per-(date, rights) exercise thresholds for the chooser policy."""
    from .bermudan import _det_states
    from .models.hull_white import step_tables

    if sigma is None:
        sigma = cfg.sigma
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    delta = tau
    k = int(k)
    if not 0 <= k <= n:
        raise ValueError(f"need 0 <= k <= n caplets, got k={k}, n={n}")

    obs, bounds, dates, U, W = _note_shapes(cfg, float(start), n,
                                            float(tau), 1)
    tables = step_tables(cfg, sigma, cfg.sigma, jnp.float32)
    sig = float(tables.sig_st)
    r_det_a, i_det_a = (np.asarray(a, np.float64)
                        for a in _det_states(cfg, tables, dates))
    r_det = {t: r_det_a[q] for q, t in enumerate(dates)}
    i_det = {t: i_det_a[q] for q, t in enumerate(dates)}
    fixings = bounds[:n]
    # caplet cash kink: L(r) = rate  <=>  r = r_band lower edge
    kink = {t: _r_band(cfg, sigma, market, t, delta, rate, math.inf)[0]
            for t in fixings}
    terms = {t: tuple(float(np.asarray(v, np.float64))
                      for v in _libor_terms(cfg, jnp.float32(sigma),
                                            market, t, delta))
             for t in fixings}

    def grid(t):
        s = sig * math.sqrt(float(U[t] @ U[t]))
        xs = np.linspace(r_det[t] - width * s, r_det[t] + width * s,
                         n_grid)
        v = kink[t]
        if xs[0] < v < xs[-1] and math.isfinite(v):
            # +-eps double node since round 4's cubic cell kernel: the
            # zero-width cell marks a slope-segment break so Hermite
            # slopes stay one-sided at the crease (see docs/MATH.md §38)
            xs = np.unique(np.concatenate([xs, [v - 1e-9, v + 1e-9]]))
        return xs

    def caplet_cash(t, xs):
        """tau (L(r) - rate)^+ paid at t + tau, on the fp64 grid."""
        lnA, B = terms[t]
        L = (np.exp(B * xs - lnA) - 1.0) / delta
        return tau * np.maximum(L - rate, 0.0)

    # V columns: c = 0..k (remaining rights) plus the full-cap side
    # column; after the last fixing everything is worthless.
    xs_next = None
    Vn = None
    boundaries = []
    profile = ()
    for j in range(n - 1, -1, -1):
        Tj, Tp = fixings[j], bounds[j + 1]
        xs = grid(Tj)
        uj, dj = U[Tj], W[Tp] - W[Tj]
        vjj = float(uj @ uj)
        e = (xs - r_det[Tj]) / vjj
        b_I = float(dj @ uj)
        v_I = sig * sig * (float(dj @ dj) - b_I * b_I / vjj)
        m_I = (i_det[Tp] - i_det[Tj]) + b_I * e
        w0 = np.exp(-m_I + 0.5 * v_I)
        cp = caplet_cash(Tj, xs)

        if Vn is None:
            Ec = np.zeros((len(xs), k + 2))
        else:
            up = U[Tp]
            b_p = float(up @ uj)
            v_p = sig * sig * (float(up @ up) - b_p * b_p / vjj)
            c_pI = sig * sig * (float(up @ dj) - b_p * b_I / vjj)
            mu_p = r_det[Tp] + b_p * e - c_pI
            s_p = math.sqrt(max(v_p, 0.0))
            Ec = _kernel_avg(mu_p, s_p, xs_next, Vn,
                             order="cubic")      # (G, k+2)

        V_new = np.empty((len(xs), k + 2))
        V_new[:, 0] = 0.0                                 # no rights left
        row = []
        for c in range(1, k + 1):
            d = cp + Ec[:, c - 1] - Ec[:, c]              # marginal value
            if auto:
                ex = cp > 0.0
            else:
                # noise guard: below the kink d = E[c-1] - E[c] <= 0
                # exactly, but the kernel sums can leave ~1e-17 residue
                ex = d > 1e-14
                pos = np.nonzero(ex)[0]
                if len(pos) == 0:
                    row.append(math.inf)                  # never exercise
                elif pos[0] == 0:
                    row.append(-math.inf)                 # always
                else:
                    i = int(pos[0])
                    lam = -d[i - 1] / (d[i] - d[i - 1])
                    row.append(float(xs[i - 1]
                                     + lam * (xs[i] - xs[i - 1])))
            V_new[:, c] = w0 * np.where(ex, cp + Ec[:, c - 1], Ec[:, c])
        V_new[:, k + 1] = w0 * (cp + Ec[:, k + 1])        # full cap
        if not auto:
            boundaries.append(tuple([math.inf] + row))    # c = 0: never
        if j == 0 and k >= 1:
            profile = (tuple(float(v) for v in xs),
                       tuple(float(v) for v in (Ec[:, k] - Ec[:, k - 1])))
        Vn, xs_next = V_new, xs

    # integrate from 0 over the tilted unconditional law
    T0 = fixings[0]
    u0, w0v = U[T0], W[T0]
    v00 = sig * sig * float(u0 @ u0)
    vI0 = sig * sig * float(w0v @ w0v)
    c0 = sig * sig * float(u0 @ w0v)
    disc0 = math.exp(-i_det[T0] + 0.5 * vI0)
    mu0 = np.array([r_det[T0] - c0])
    top = disc0 * _kernel_avg(mu0, math.sqrt(v00), xs_next, Vn,
                              order="cubic")[0]
    return ChooserDP(price=float(top[k]), cap_price=float(top[k + 1]),
                     boundaries=tuple(reversed(boundaries)), k=k,
                     auto=bool(auto), profile_x=profile[0] if profile
                     else (), profile_marg=profile[1] if profile else ())


class ChooserResult(NamedTuple):
    price: jax.Array           # CV estimate (policy lower bound)
    std_error: jax.Array
    raw_price: jax.Array       # plain MC (no CV)
    raw_std_error: jax.Array
    beta: jax.Array            # fitted CV coefficient
    used_mean: jax.Array       # mean number of rights exercised
    n_paths: int


@lru_cache(maxsize=None)
def _chooser_fn(cfg: HWConfig, rate: float, start: float, n: int,
                tau: float, k: int, auto: bool, boundaries: tuple,
                cap_mean: float, n_paths: int, n_blocks: int,
                rqmc: bool, mesh):
    from .bermudan import _functional_chol, _functional_det

    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    fixings = tuple(o[0] for o in obs)
    specs = tuple([("r", t) for t in fixings]
                  + [("I", t) for t in bounds[1:]])
    LT = jnp.asarray(_functional_chol(cfg, specs))
    delta = tau
    if not auto:
        # (n, k+1) threshold table; c = 0 row is +inf (never exercise)
        bnd = jnp.asarray(np.asarray(boundaries, np.float64),
                          jnp.float32)

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        det = _functional_det(cfg, sigma, specs)
        r_det = det[:n]
        i_det = det[n:]
        lnA, B = (jnp.stack(v) for v in zip(
            *[_libor_terms(cfg, sigma, market, t, delta)
              for t in fixings]))

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 2 * n, rqmc)
            z = tables.sig_st * jnp.dot(x, LT,
                                        preferred_element_type=jnp.float32,
                                        precision=cfg.matmul_precision)

            def leg(sgn):
                ro = r_det[None, :] + sgn * z[:, :n]
                integral = i_det[None, :] + sgn * z[:, n:]
                L = (jnp.exp(B[None, :] * ro - lnA[None, :]) - 1.0) / delta
                cp = tau * jnp.maximum(L - rate, 0.0) * jnp.exp(-integral)
                c = jnp.full(ro.shape[0], k, jnp.int32)
                V = jnp.zeros(ro.shape[0], jnp.float32)
                for j in range(n):
                    if auto:
                        ex = (cp[:, j] > 0.0) & (c >= 1)
                    else:
                        # c >= 1 guard: the DP's c = 0 row is +inf, but
                        # user-supplied boundary tables need not be, and
                        # a negative c would wrap jnp.take.
                        thr = jnp.take(bnd[j], c, mode="clip")
                        ex = (ro[:, j] > thr) & (c >= 1)
                    exf = ex.astype(jnp.float32)
                    V = V + exf * cp[:, j]
                    c = c - ex.astype(jnp.int32)
                Y = jnp.sum(cp, axis=1)           # full cap (CV)
                return V, Y, jnp.float32(k) - c.astype(jnp.float32)

            Vp, Yp, Up = leg(1.0)
            Vm, Ym, Um = leg(-1.0)
            V, Y, Uc = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Up + Um)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y),
                              jnp.sum(Uc)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cap_mean)
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


def price_chooser_cap(cfg: HWConfig, key, market: MarketCurve, *,
                      rate: float, k: int, start: float | None = None,
                      tenor: float = 5.0, freq: float = 1.0,
                      auto: bool = False, sigma=None,
                      boundaries: tuple | None = None,
                      cap_mean: float | None = None,
                      n_paths: int | None = None, n_blocks: int = 1,
                      rqmc: bool = False, mesh=None) -> ChooserResult:
    """Monte Carlo chooser cap (or auto-cap) under the fixed DP threshold
    policy (default: read both the policy and the CV's exact full-cap
    mean off the fp64 DP oracle — the discrete-law mean, matching the
    law the sampler integrates).  For the chooser, any fixed policy is
    an unbiased LOWER bound on the holder-optimal value; the auto-cap's
    policy is intrinsic, so its estimate is exact up to MC noise.
    Blocks key on the global index; optionally sharded over ``mesh``."""
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if boundaries is None or cap_mean is None:
        dp = dp_oracle_chooser_cap(cfg, market, rate=rate, k=k,
                                   start=start, tenor=tenor, freq=freq,
                                   sigma=float(sigma), auto=auto)
        if boundaries is None:
            boundaries = dp.boundaries
        if cap_mean is None:
            cap_mean = dp.cap_price
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _chooser_fn(cfg, float(rate), float(start), n, float(tau),
                      int(k), bool(auto),
                      tuple(tuple(float(b) for b in row)
                            for row in boundaries),
                      float(cap_mean), int(n_paths), int(n_blocks),
                      bool(rqmc), mesh)(key, jnp.asarray(sigma, jnp.float32), market)
    return ChooserResult(price=out[0], std_error=out[1], raw_price=out[2],
                         raw_std_error=out[3], beta=out[4],
                         used_mean=out[5],
                         n_paths=int(n_paths) * int(n_blocks))


class ChooserVega(NamedTuple):
    vega: jax.Array            # CRN-FD vega of the CV estimate
    dp_vega: float             # fp64 DP central difference (oracle)
    price_minus: jax.Array
    price_plus: jax.Array
    epsilon: float


def vega_chooser_cap(cfg: HWConfig, key, market: MarketCurve, *,
                     rate: float, k: int, start: float | None = None,
                     tenor: float = 5.0, freq: float = 1.0,
                     auto: bool = False, eps: float = 1e-3,
                     n_paths: int | None = None, n_blocks: int = 1,
                     mesh=None) -> ChooserVega:
    """CRN central-difference vega with the exercise thresholds FROZEN
    at the base-sigma DP policy (envelope theorem at the holder-optimal
    thresholds).  Oracle: the central difference of the fp64 DP value,
    which re-optimizes per bump.  The CV's exact mean is recomputed per
    bump so each side stays unbiased."""
    if start is None:
        start = cfg.s1
    kw = dict(rate=rate, k=k, start=start, tenor=tenor, freq=freq,
              auto=auto)
    base = dp_oracle_chooser_cap(cfg, market, sigma=cfg.sigma, **kw)
    dp_m = dp_oracle_chooser_cap(cfg, market, sigma=cfg.sigma - eps, **kw)
    dp_p = dp_oracle_chooser_cap(cfg, market, sigma=cfg.sigma + eps, **kw)
    mc = dict(kw, boundaries=base.boundaries, n_paths=n_paths,
              n_blocks=n_blocks, mesh=mesh)
    p_m = price_chooser_cap(cfg, key, market, sigma=cfg.sigma - eps,
                            cap_mean=dp_m.cap_price, **mc).price
    p_p = price_chooser_cap(cfg, key, market, sigma=cfg.sigma + eps,
                            cap_mean=dp_p.cap_price, **mc).price
    return ChooserVega(vega=(p_p - p_m) / (2.0 * eps),
                       dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                       price_minus=p_m, price_plus=p_p, epsilon=eps)


# ---------------------------------------------------------------------------
# G2++ twin: the caplet cash is deterministic on the LIBOR strip
# projection u = Ba x + Bb y (date-independent direction), so the swing
# DP runs over (rights c, u, w) on rotated grids — the c-levels batch
# through one g2_note._expect_bilinear_multi call per date exactly like
# the TARN's lattice levels, the caplet kink is a u-grid node, and the
# exercise policy becomes a per-(date, rights) boundary CURVE u*(w)
# (exercise when u > u*), extracted per w-column the way the callable
# floater extracts its call curve.  Conditional laws project off
# g2pp._g2_functional_cov — the sampler's own matrix.
# ---------------------------------------------------------------------------


class G2ChooserDP(NamedTuple):
    price: float               # fp64 DP value with k rights
    cap_price: float           # full cap (all n caplets) from the same DP
    boundaries: tuple          # per date: (w-grid, (k+1, n_w) u*(w) rows)
    k: int
    auto: bool


def dp_oracle_chooser_cap_g2(cfg: HWConfig, g, market: MarketCurve, *,
                             rate: float, k: int,
                             start: float | None = None,
                             tenor: float = 5.0, freq: float = 1.0,
                             auto: bool = False, n_u: int = 161,
                             n_w: int = 61, width: float = 7.0,
                             n_quad: int = 16) -> G2ChooserDP:
    """fp64 value iteration for the G2++ chooser cap (or auto-cap) on a
    (rights-lattice, u-grid, w-grid) state space.  The full-cap side
    column is pinned against barrier.cap_closed_form_g2 (exact under
    the sampled functional law) up to the documented O(h^2) bilinear
    grid bias; chooser(k = n) == auto(k = n) == that column."""
    from .barrier import cap_closed_form_g2
    from .g2_note import (_expect_bilinear_multi, _kink_edge,
                          _period_machine, _strip_lnA_f64)
    from .models.g2pp import _B, _g2_functional_cov, _v_integral

    del cap_closed_form_g2      # documented pin target (tests)
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    delta = tau
    k = int(k)
    if not 0 <= k <= n:
        raise ValueError(f"need 0 <= k <= n caplets, got k={k}, n={n}")
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

    def grids(t):
        s_u = math.sqrt(_g2_functional_cov(g, (("u", t, Ba, Bb),))[0, 0])
        s_w = math.sqrt(_g2_functional_cov(g, (("u", t, ca, cb),))[0, 0])
        ug = np.linspace(-width * s_u, width * s_u, n_u)
        if ug[0] < uK[t] < ug[-1] and math.isfinite(uK[t]):
            # auto-cap: forced exercise of a worthless right makes the
            # value JUMP just above u_K — double node, the barrier-cliff
            # treatment.  chooser: the value is CONTINUOUS but KINKED at
            # u_K; since round 4's cubic surfaces the kink ALSO needs the
            # +-eps double node — the zero-width cell marks a segment
            # break so the Hermite slopes stay one-sided (a single kink
            # node fed central slopes into both neighbor cells and cost a
            # measured +2.5e-4 DP shift on the k=2 chooser)
            extra = ([uK[t], uK[t] + 1e-9] if auto
                     else [uK[t] - 1e-9, uK[t] + 1e-9])
            ug = np.unique(np.concatenate([ug, extra]))
        return ug, np.linspace(-width * s_w, width * s_w, n_w)

    nodes, wq = np.polynomial.hermite_e.hermegauss(n_quad)
    wq = wq / math.sqrt(2.0 * math.pi)
    gr = {t: grids(t) for t in bounds[:n]}

    xs_next = None
    Vs = None                    # list of k+2 surfaces (ug, wg)
    boundaries = []
    for j in range(n - 1, -1, -1):
        Tj, Tp = bounds[j], bounds[j + 1]
        ug, wg = gr[Tj]
        U, Wm = np.meshgrid(ug, wg, indexing="ij")
        uf, wf = U.ravel(), Wm.ravel()
        interior, kcoef, C = _period_machine(g, Tj, Tp, obs[j],
                                             Ba, Bb, ca, cb)
        assert not interior
        iu, iw = 1, 2
        m_d = kcoef[0, 0] * uf + kcoef[1, 0] * wf
        w0 = (dd[Tp] / dd[Tj]) * np.exp(-m_d + 0.5 * C[0, 0])
        L = (np.exp(uf - lnAs[Tj]) - 1.0) / delta
        cp = tau * np.maximum(L - rate, 0.0)
        if Vs is None:
            Ec = np.zeros((len(uf), k + 2))
        else:
            mu_u = kcoef[0, iu] * uf + kcoef[1, iu] * wf - C[iu, 0]
            mu_w = kcoef[0, iw] * uf + kcoef[1, iw] * wf - C[iw, 0]
            Ec = _expect_bilinear_multi(mu_u, mu_w, C[iu, iu],
                                        C[iu, iw], C[iw, iw],
                                        xs_next[0], xs_next[1], Vs,
                                        nodes, wq)
        sh = (len(ug), len(wg))
        span = ug[-1] - ug[0]
        lo_big, hi_big = ug[0] - span, ug[-1] + span
        V_new = [np.zeros(sh)]                        # c = 0: no rights
        rows = []
        for c in range(1, k + 1):
            d = (cp + Ec[:, c - 1] - Ec[:, c]).reshape(sh)
            if auto:
                ex = (cp > 0.0).reshape(sh)
            else:
                ex = d > 1e-14
                # boundary curve u*(w): first positive-crossing of the
                # marginal value per w-column (exercise when u > u*)
                ustar = []
                for col in range(len(wg)):
                    dc = d[:, col]
                    pos = np.nonzero(dc > 1e-14)[0]
                    if len(pos) == 0:
                        ustar.append(hi_big)          # never exercise
                    elif pos[0] == 0:
                        ustar.append(lo_big)          # always
                    else:
                        i = int(pos[0])
                        lam = -dc[i - 1] / (dc[i] - dc[i - 1])
                        ustar.append(float(ug[i - 1]
                                           + lam * (ug[i] - ug[i - 1])))
                rows.append(tuple(ustar))
            V_new.append((w0 * np.where(ex.ravel(), cp + Ec[:, c - 1],
                                        Ec[:, c])).reshape(sh))
        V_new.append((w0 * (cp + Ec[:, k + 1])).reshape(sh))  # full cap
        if not auto:
            boundaries.append((tuple(float(v) for v in wg),
                               (tuple([hi_big] * len(wg)),) + tuple(rows)))
        Vs, xs_next = V_new, (ug, wg)

    T0 = bounds[0]
    S0 = _g2_functional_cov(
        g, (("I", T0), ("u", T0, Ba, Bb), ("u", T0, ca, cb)))
    from .g2_note import _expect_bilinear_multi as _ebm
    top = float(np.interp(T0, Ts, P0)) * _ebm(
        np.array([-S0[1, 0]]), np.array([-S0[2, 0]]), S0[1, 1],
        S0[1, 2], S0[2, 2], xs_next[0], xs_next[1], Vs, nodes, wq)[0]
    return G2ChooserDP(price=float(top[k]), cap_price=float(top[k + 1]),
                       boundaries=tuple(reversed(boundaries)), k=k,
                       auto=bool(auto))


@lru_cache(maxsize=None)
def _chooser_g2_fn(cfg: HWConfig, g, rate: float, start: float, n: int,
                   tau: float, k: int, auto: bool, boundaries: tuple,
                   cap_mean: float, n_paths: int, n_blocks: int,
                   rqmc: bool, mesh):
    from .g2_note import _strip_lnA_traced
    from .models.g2pp import _B, _g2_functional_chol, _v_integral

    obs, bounds, dates = _note_dates(start, n, tau, 1)
    del dates
    fixes = tuple(o[0] for o in obs)
    pays = bounds[1:]
    delta = tau
    Ba, Bb = _B(g.a, delta), _B(g.b, delta)
    ca, cb = -Bb, Ba
    # sample u at the fixings (cash + policy), w there (the second
    # policy coordinate; the auto-cap's policy is intrinsic in u but the
    # shared Cholesky keeps the two estimators on common random numbers)
    specs = tuple([("u", t, Ba, Bb) for t in fixes]
                  + [("u", t, ca, cb) for t in fixes]
                  + [("I", p) for p in pays])
    LT = jnp.asarray(_g2_functional_chol(g, specs))
    v_half = jnp.asarray([0.5 * _v_integral(g, p) for p in pays],
                         jnp.float32)
    if not auto:
        bw = [jnp.asarray(b[0], jnp.float32) for b in boundaries]
        bu = [jnp.asarray(np.asarray(b[1], np.float64), jnp.float32)
              for b in boundaries]          # (k+1, n_w) per date

    def compute(key, market):
        lnA = jnp.stack([_strip_lnA_traced(cfg, g, market, t, delta)
                         for t in fixes])
        disc0 = jnp.stack(
            [hw.interp_curve(market.P, jnp.float32(p), cfg)
             for p in pays]) * jnp.exp(-v_half)

        def block(bi):
            x = pmesh.block_normals(key, bi, n_paths, 3 * n, rqmc)
            z = jnp.dot(x, LT, preferred_element_type=jnp.float32,
                        precision=cfg.matmul_precision)

            def leg(sgn):
                u = sgn * z[:, :n]                          # centered
                wv = sgn * z[:, n:2 * n]
                disc = disc0[None, :] * jnp.exp(-sgn * z[:, 2 * n:])
                L = (jnp.exp(u - lnA[None, :]) - 1.0) / delta
                cp = tau * jnp.maximum(L - rate, 0.0) * disc
                c = jnp.full(u.shape[0], k, jnp.int32)
                V = jnp.zeros(u.shape[0], jnp.float32)
                for j in range(n):
                    if auto:
                        ex = (cp[:, j] > 0.0) & (c >= 1)
                    else:
                        thr_all = jax.vmap(
                            lambda row: uinterp(bw[j], row,
                                                wv[:, j]))(bu[j])
                        thr = jnp.take_along_axis(
                            thr_all, c[None, :].astype(jnp.int32),
                            axis=0, mode="clip")[0]
                        ex = (u[:, j] > thr) & (c >= 1)
                    V = V + ex.astype(jnp.float32) * cp[:, j]
                    c = c - ex.astype(jnp.int32)
                Y = jnp.sum(cp, axis=1)             # full cap (CV)
                return V, Y, jnp.float32(k) - c.astype(jnp.float32)

            Vp, Yp, Up = leg(1.0)
            Vm, Ym, Um = leg(-1.0)
            V, Y, Uc = 0.5 * (Vp + Vm), 0.5 * (Yp + Ym), 0.5 * (Up + Um)
            return jnp.stack([jnp.sum(V), jnp.sum(V * V), jnp.sum(Y),
                              jnp.sum(Y * Y), jnp.sum(V * Y),
                              jnp.sum(Uc)])

        per_block = pmesh.map_blocks(block, n_blocks, mesh)
        s = jnp.sum(per_block, axis=0)
        n_tot = 1.0 * n_paths * n_blocks
        mv, my = s[0] / n_tot, s[2] / n_tot
        var_v = jnp.maximum(s[1] / n_tot - mv * mv, 0.0)
        var_y = jnp.maximum(s[3] / n_tot - my * my, 1e-30)
        cov = s[4] / n_tot - mv * my
        beta = cov / var_y
        price = mv - beta * (my - cap_mean)
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


def price_chooser_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                         rate: float, k: int, start: float | None = None,
                         tenor: float = 5.0, freq: float = 1.0,
                         auto: bool = False,
                         boundaries: tuple | None = None,
                         cap_mean: float | None = None,
                         n_paths: int | None = None, n_blocks: int = 1,
                         rqmc: bool = False, mesh=None) -> ChooserResult:
    """Monte Carlo G2++ chooser cap (or auto-cap) under the fixed DP
    boundary-curve policy (exercise right c at T_j when
    u_j > u*_{j,c}(w_j); default: curves and the CV's exact full-cap
    mean read off the fp64 (u, w) DP / the closed form).  Any fixed
    policy is an unbiased LOWER bound on the holder-optimal value; the
    auto-cap's intrinsic policy makes its estimate exact to MC noise."""
    from .barrier import cap_closed_form_g2

    if n_paths is None:
        n_paths = cfg.n_paths
    if start is None:
        start = cfg.s1
    n = int(round(tenor * freq))
    tau = 1.0 / freq
    if boundaries is None and not auto:
        dp = dp_oracle_chooser_cap_g2(cfg, g, market, rate=rate, k=k,
                                      start=start, tenor=tenor,
                                      freq=freq, auto=False)
        boundaries = dp.boundaries
    if cap_mean is None:
        # exact under the sampled functional law (no trapezoid gap)
        cap_mean, _ = cap_closed_form_g2(cfg, g, market, rate=rate,
                                         start=start, tenor=tenor,
                                         freq=freq)
    if rqmc and n_blocks < 2:
        raise ValueError("rqmc needs n_blocks >= 2 (the digital shifts "
                         "are the independent replicates)")
    out = _chooser_g2_fn(cfg, g, float(rate), float(start), n,
                         float(tau), int(k), bool(auto),
                         boundaries if auto else tuple(boundaries),
                         float(cap_mean), int(n_paths), int(n_blocks),
                         bool(rqmc), mesh)(key, market)
    return ChooserResult(price=out[0], std_error=out[1], raw_price=out[2],
                         raw_std_error=out[3], beta=out[4],
                         used_mean=out[5],
                         n_paths=int(n_paths) * int(n_blocks))


def vega_chooser_cap_g2(cfg: HWConfig, g, key, market: MarketCurve, *,
                        rate: float, k: int, start: float | None = None,
                        tenor: float = 5.0, freq: float = 1.0,
                        auto: bool = False, eps: float = 1e-3,
                        n_paths: int | None = None, n_blocks: int = 1,
                        mesh=None) -> ChooserVega:
    """CRN central-difference d price / d sigma (the x-factor vol) with
    the exercise curves FROZEN at the base-sigma DP policy (envelope
    theorem); oracle: the re-optimizing fp64 DP's own FD.  The CV's
    exact mean is recomputed per bump so each side stays unbiased."""
    from .models.g2pp import G2Params

    if start is None:
        start = cfg.s1
    kw = dict(rate=rate, k=k, start=start, tenor=tenor, freq=freq,
              auto=auto)
    gp = G2Params(a=g.a, b=g.b, sigma=g.sigma + eps, eta=g.eta, rho=g.rho)
    gm = G2Params(a=g.a, b=g.b, sigma=g.sigma - eps, eta=g.eta, rho=g.rho)
    base = (None if auto
            else dp_oracle_chooser_cap_g2(cfg, g, market, **kw).boundaries)
    dp_m = dp_oracle_chooser_cap_g2(cfg, gm, market, **kw)
    dp_p = dp_oracle_chooser_cap_g2(cfg, gp, market, **kw)
    mc = dict(kw, boundaries=base, n_paths=n_paths, n_blocks=n_blocks,
              mesh=mesh)
    p_m = price_chooser_cap_g2(cfg, gm, key, market, **mc).price
    p_p = price_chooser_cap_g2(cfg, gp, key, market, **mc).price
    return ChooserVega(vega=(p_p - p_m) / (2.0 * eps),
                       dp_vega=(dp_p.price - dp_m.price) / (2.0 * eps),
                       price_minus=p_m, price_plus=p_p, epsilon=eps)
