"""Coupon-bond options & swaptions: MC vs the exact Jamshidian
decomposition, plus payer/receiver parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import instruments, pricing
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(77)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def sched():
    # 4-year annual swap fixed leg starting at S1 = 5
    return instruments.swap_fixed_leg(CFG, rate=0.025, tenor=4.0, freq=1.0)


def test_degenerate_single_cashflow_equals_zbc(analytic_market):
    """A one-cashflow coupon bond option IS the ZBC of the reference."""
    sched1 = instruments.CouponSchedule(times=(CFG.s2,), coupons=(1.0,))
    est = instruments.price_coupon_bond_option(
        CFG, KEY, analytic_market, sched1, strike=CFG.strike)
    true = oracles.zbc_price(CFG,
                             float(analytic_market.P[CFG.n_mat // 2]),
                             float(analytic_market.P[-1]))
    assert abs(float(est.price) - true) < 1e-3
    jam = instruments.jamshidian_price(CFG, analytic_market, sched1,
                                       strike=CFG.strike)
    assert abs(jam - true) < 1e-6  # degenerate Jamshidian = the ZBC itself


@pytest.mark.parametrize("payer", [False, True])
def test_swaption_mc_matches_jamshidian(analytic_market, sched, payer):
    est = instruments.price_coupon_bond_option(
        CFG, KEY, analytic_market, sched, strike=1.0, payer=payer)
    jam = instruments.jamshidian_price(CFG, analytic_market, sched,
                                       strike=1.0, payer=payer)
    se = float(jnp.sqrt(est.var_x / est.n))
    assert jam > 0
    assert abs(float(est.price) - jam) < 5 * se + 2e-4, (
        payer, float(est.price), jam, se)


def test_payer_receiver_parity(analytic_market, sched):
    """receiver - payer = sum c_i P(0,T_i) - P(0,S1) (forward swap value)."""
    rec = instruments.price_coupon_bond_option(
        CFG, KEY, analytic_market, sched, 1.0, payer=False)
    pay = instruments.price_coupon_bond_option(
        CFG, KEY, analytic_market, sched, 1.0, payer=True)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.asarray(analytic_market.P, np.float64)
    fwd = sum(c * np.interp(t, Ts, P)
              for c, t in zip(sched.coupons, sched.times)) - np.interp(
                  CFG.s1, Ts, P)
    # same draws (same key): parity holds up to MC noise of the shared part
    assert abs((float(rec.price) - float(pay.price)) - fwd) < 5e-4


def test_swaption_wrapper(analytic_market):
    est = instruments.price_swaption(CFG, KEY, analytic_market, rate=0.025,
                                     tenor=4.0, payer=True)
    assert 0.0 < float(est.price) < 0.2


def test_swaption_qmc_nails_jamshidian(analytic_market, sched):
    """RQMC swaption price must land on the Jamshidian exact value with a
    tiny SE (QMC advantage carries over from the ZBC case)."""
    price, se = instruments.price_coupon_bond_option_qmc(
        CFG, KEY, analytic_market, sched, 1.0, payer=True,
        n_points=1 << 13, n_shifts=8)
    jam = instruments.jamshidian_price(CFG, analytic_market, sched,
                                       strike=1.0, payer=True)
    assert float(se) < 5e-5
    assert abs(float(price) - jam) < 6 * float(se) + 5e-5, (
        float(price), jam, float(se))


def test_swaption_vega_matches_fd(analytic_market, sched):
    """AD vega of the swaption must agree with a CRN central difference of
    the Jamshidian-validated MC pricer."""
    from hullwhite_tpu import greeks

    _, vega_ad = greeks.vega_swaption(CFG, KEY, analytic_market, sched,
                                      1.0, payer=True)
    eps = 1e-3
    ps = {}
    for s in (-1.0, 1.0):
        est = instruments.price_coupon_bond_option(
            CFG, KEY, analytic_market, sched, 1.0, payer=True,
            sigma=CFG.sigma + s * eps)
        ps[s] = float(est.price)
    fd = (ps[1.0] - ps[-1.0]) / (2 * eps)
    assert abs(float(vega_ad) - fd) < 0.03 * abs(fd) + 5e-4, (
        float(vega_ad), fd)


# ---------------------------------------------------------------------------
# Caps / floors (round 2)
# ---------------------------------------------------------------------------

def test_cap_mc_matches_closed_form(analytic_market):
    res = instruments.price_cap(CFG, KEY, analytic_market, rate=0.02,
                                tenor=4.0, n_paths=1 << 16)
    tot, per = instruments.cap_closed_form(CFG, analytic_market, rate=0.02,
                                           tenor=4.0)
    assert abs(float(res.price) - tot) < 5 * float(res.std_error) + 5e-5
    assert len(per) == len(res.reset_times) == 4


def test_cap_floor_parity(analytic_market):
    """cap - floor = sum_j [P(0,t_j) - (1 + tau K) P(0,t_{j+1})]
    (model-free); holds exactly for the closed forms and within noise
    for shared-path MC."""
    import numpy as np

    tot_c, _ = instruments.cap_closed_form(CFG, analytic_market, rate=0.02,
                                           tenor=4.0)
    tot_f, _ = instruments.cap_closed_form(CFG, analytic_market, rate=0.02,
                                           tenor=4.0, floor=True)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.asarray(analytic_market.P, np.float64)
    fwd = sum(float(np.interp(5.0 + j, Ts, P))
              - 1.02 * float(np.interp(6.0 + j, Ts, P)) for j in range(4))
    assert abs((tot_c - tot_f) - fwd) < 1e-9
    rc = instruments.price_cap(CFG, KEY, analytic_market, rate=0.02,
                               tenor=4.0, n_paths=1 << 15)
    rf = instruments.price_cap(CFG, KEY, analytic_market, rate=0.02,
                               tenor=4.0, floor=True, n_paths=1 << 15)
    se = (float(rc.std_error) ** 2 + float(rf.std_error) ** 2) ** 0.5
    assert abs((float(rc.price) - float(rf.price)) - fwd) < 5 * se + 5e-5


def test_caplet_is_scaled_zbp(analytic_market):
    """One caplet == (1 + tau K) ZBP struck at 1/(1 + tau K) — the static
    replication the closed form is built on, checked independently."""
    tau, K = 1.0, 0.02
    zbp = instruments._zbp_closed(CFG, analytic_market, 5.0, 6.0,
                                  1.0 / (1.0 + tau * K))
    tot, per = instruments.cap_closed_form(CFG, analytic_market, rate=K,
                                           start=5.0, tenor=1.0)
    assert abs(per[0] - (1.0 + tau * K) * zbp) < 1e-12


def test_cap_semiannual_freq(analytic_market):
    """freq=2: reset/payment grid at half-years still prices vs closed
    form (dates must sit on the step grid: tiny cfg has dt=0.1)."""
    res = instruments.price_cap(CFG, KEY, analytic_market, rate=0.02,
                                tenor=2.0, freq=2.0, n_paths=1 << 15)
    tot, per = instruments.cap_closed_form(CFG, analytic_market, rate=0.02,
                                           tenor=2.0, freq=2.0)
    assert len(per) == 4
    assert abs(float(res.price) - tot) < 5 * float(res.std_error) + 5e-5


def test_cap_vega_crn_matches_closed_form_fd(analytic_market):
    """CRN-FD cap/floor vega vs the fp64 FD of the per-caplet closed
    form; cap and floor vegas coincide (their difference is the
    sigma-independent forward value — put-call parity per period)."""
    from hullwhite_tpu import greeks
    from hullwhite_tpu.instruments import cap_closed_form

    e = 1e-5
    va = (cap_closed_form(CFG, analytic_market, rate=0.02, tenor=4.0,
                          sigma=CFG.sigma + e)[0]
          - cap_closed_form(CFG, analytic_market, rate=0.02, tenor=4.0,
                            sigma=CFG.sigma - e)[0]) / (2 * e)
    for floor in (False, True):
        v = greeks.fd_vega_cap(CFG, KEY, analytic_market, rate=0.02,
                               tenor=4.0, floor=floor, n_paths=1 << 16)
        assert abs(v - va) < 0.01 * abs(va) + 1e-3, (floor, v, va)


# ---------------------------------------------------------------------------
# CMS cap/floor leg (round 3)
# ---------------------------------------------------------------------------

def test_cms_mc_matches_quadrature(analytic_market):
    """CMS caplets (convexity-bearing payoff) vs the fp64 tilted
    Gauss-Legendre oracle under the same discrete trapezoid law."""
    res = instruments.price_cms(CFG, KEY, analytic_market, rate=0.02,
                                tenor=3.0, swap_tenor=4.0,
                                n_paths=1 << 15, n_blocks=2)
    orc, per = instruments.cms_quadrature(CFG, analytic_market, rate=0.02,
                                          tenor=3.0, swap_tenor=4.0)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc)
    import numpy as np

    np.testing.assert_allclose(np.asarray(res.periods), np.asarray(per),
                               atol=1e-4)


def test_cms_floor_matches_quadrature(analytic_market):
    res = instruments.price_cms(CFG, KEY, analytic_market, rate=0.03,
                                tenor=3.0, swap_tenor=4.0, floor=True,
                                n_paths=1 << 15, n_blocks=2)
    orc, _ = instruments.cms_quadrature(CFG, analytic_market, rate=0.03,
                                        tenor=3.0, swap_tenor=4.0,
                                        floor=True)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc)


def test_cms_convexity_is_positive(analytic_market):
    """The CMS convexity adjustment: caplet - floorlet at the same strike
    gives the CMS forward leg E[D tau (S - K)], whose implied forward
    rate must sit ABOVE the par forward swap rate (positive convexity:
    S is convex in the annuity-measure numeraire ratio)."""
    import numpy as np

    K = 0.025
    cap_, _ = instruments.cms_quadrature(CFG, analytic_market, rate=K,
                                         tenor=1.0, swap_tenor=4.0)
    flo_, _ = instruments.cms_quadrature(CFG, analytic_market, rate=K,
                                         tenor=1.0, swap_tenor=4.0,
                                         floor=True)
    # implied E^{Tp}[S] from the parity leg, vs the annuity-par forward
    t0 = CFG.s1
    Pp = instruments.curve_level(CFG, analytic_market, t0 + 1.0)
    ES = (cap_ - flo_) / Pp + K        # tau = 1
    Ts = [t0 + i + 1.0 for i in range(4)]
    Ps = np.array([instruments.curve_level(CFG, analytic_market, t)
                   for t in Ts])
    par = (instruments.curve_level(CFG, analytic_market, t0)
           - Ps[-1]) / np.sum(Ps)
    assert ES > par, (ES, par)
    assert ES - par < 5e-3             # adjustment is small but positive


# ---------------------------------------------------------------------------
# CMS spread option + range accrual (round 3 exotics)
# ---------------------------------------------------------------------------

def test_cms_spread_mc_matches_quadrature(analytic_market):
    """Spread caplets (S_4y - S_1y - K)^+ vs the root-located piecewise
    Gauss-Legendre fp64 oracle under the same discrete trapezoid law."""
    kw = dict(strike=0.002, tenor=2.0, long_tenor=4.0, short_tenor=1.0)
    res = instruments.price_cms_spread(CFG, KEY, analytic_market,
                                       n_paths=1 << 15, n_blocks=2, **kw)
    orc, per = instruments.cms_spread_quadrature(CFG, analytic_market, **kw)
    assert orc > 0
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc, float(res.std_error))
    np.testing.assert_allclose(np.asarray(res.periods), np.asarray(per),
                               atol=1e-4)


def test_cms_spread_floor_and_parity(analytic_market):
    """Floor vs oracle, and cap - floor = forward spread leg (parity is a
    pure-MC identity: same states, kinks cancel path by path)."""
    kw = dict(strike=0.004, tenor=2.0, long_tenor=4.0, short_tenor=1.0)
    cap = instruments.price_cms_spread(CFG, KEY, analytic_market,
                                       n_paths=1 << 14, n_blocks=2, **kw)
    flo = instruments.price_cms_spread(CFG, KEY, analytic_market,
                                       n_paths=1 << 14, n_blocks=2,
                                       floor=True, **kw)
    orc_c, _ = instruments.cms_spread_quadrature(CFG, analytic_market, **kw)
    orc_f, _ = instruments.cms_spread_quadrature(CFG, analytic_market,
                                                 floor=True, **kw)
    assert abs(float(flo.price) - orc_f) < 5 * float(flo.std_error) + 2e-5
    # MC parity against the ORACLE parity (same CRN states on the MC side)
    assert abs((float(cap.price) - float(flo.price))
               - (orc_c - orc_f)) < 5 * (float(cap.std_error)
                                         + float(flo.std_error)) + 2e-5


def test_range_accrual_mc_matches_closed_form(analytic_market):
    """Range accrual vs the EXACT closed form (tilted Phi differences) —
    the only instrument whose oracle needs no quadrature at all."""
    kw = dict(coupon=0.03, lo=0.010, hi=0.022, tenor=3.0, obs_per_period=5)
    res = instruments.price_range_accrual(CFG, KEY, analytic_market,
                                          n_paths=1 << 15, n_blocks=2, **kw)
    orc, per = instruments.range_accrual_closed_form(CFG, analytic_market,
                                                     **kw)
    assert 0 < orc < 0.03 * 3.0        # sane: below full accrual
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc, float(res.std_error))
    np.testing.assert_allclose(np.asarray(res.periods), np.asarray(per),
                               atol=2e-4)
    fr = np.asarray(res.mean_fraction)
    assert np.all(fr >= 0) and np.all(fr <= 1)


def test_range_accrual_band_limits(analytic_market):
    """An infinitely wide band accrues everything: the leg collapses to
    coupon * tau * sum_j P(0, T_{j+1}) exactly (closed form), and the MC
    fraction is 1 on every path; an empty band prices to zero."""
    wide, _ = instruments.range_accrual_closed_form(
        CFG, analytic_market, coupon=0.03, lo=-5.0, hi=5.0, tenor=3.0)
    Ts = [CFG.s1 + j + 1.0 for j in range(3)]
    bonds = sum(instruments.curve_level(CFG, analytic_market, t)
                for t in Ts)
    assert abs(wide - 0.03 * bonds) < 1e-5   # fp32 tables vs fp64 curve
    res = instruments.price_range_accrual(
        CFG, KEY, analytic_market, coupon=0.03, lo=-5.0, hi=5.0,
        tenor=3.0, n_paths=1 << 12)
    assert np.allclose(np.asarray(res.mean_fraction), 1.0)
    empty, _ = instruments.range_accrual_closed_form(
        CFG, analytic_market, coupon=0.03, lo=0.5, hi=0.6, tenor=3.0)
    assert empty < 1e-9
