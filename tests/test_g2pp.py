"""G2++ two-factor model: MC-vs-closed-form, martingale identities, and
the one-factor degeneracy against the Hull-White oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu.models import g2pp, hull_white as hw, oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(31)
G2 = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_state_covariance_psd_and_consistent():
    LT = g2pp._state_chol(G2, CFG.s1)
    C = LT.T @ LT
    # diagonal matches the closed forms
    a, s = G2.a, G2.sigma
    assert abs(C[0, 0] - s * s * (1 - math.exp(-2 * a * CFG.s1)) / (2 * a)) < 1e-9
    assert abs(C[2, 2] - g2pp._v_integral(G2, CFG.s1)) < 1e-7
    # symmetric PSD by construction
    assert np.all(np.linalg.eigvalsh(C) > 0)


def test_discount_martingale(analytic_market):
    """E[discount to S1] must equal P(0,S1) — pins phi handling + the law
    of I = int (x+y) ds.  Checked analytically: with I ~ N(0, V),
    E[e^{-I}] = e^{V/2}, so disc0 * E[e^{-I}] = P(0,S1) exactly; and by MC."""
    import math as m

    V = g2pp._v_integral(G2, CFG.s1)
    disc0_over_P1 = m.exp(-0.5 * V)   # module's d0 factor
    assert abs(disc0_over_P1 * m.exp(0.5 * V) - 1.0) < 1e-12
    # MC version: mean of disc0 * e^{-I} over sampled I
    LT = g2pp._state_chol(G2, CFG.s1)
    rng = np.random.default_rng(0)
    xn = rng.standard_normal((1 << 16, 3))
    I = (xn @ LT)[:, 2]
    got = disc0_over_P1 * 0.5 * (np.exp(-I).mean() + np.exp(I).mean())
    assert abs(got - 1.0) < 5e-4


def test_g2_mc_matches_closed_form(analytic_market):
    res = g2pp.price_zbc_g2(CFG, G2, KEY, analytic_market, n_paths=1 << 16)
    true = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    se = float(res.std_error_raw)
    assert abs(float(res.price) - true) < 5 * se + 1e-4, (
        float(res.price), true, se)


def test_one_factor_degeneracy(analytic_market):
    """eta -> 0 reduces G2++ to Hull-White with the same a, sigma: the
    closed forms and the MC price must match the HW oracles."""
    g1 = g2pp.G2Params(a=CFG.a, b=0.5, sigma=CFG.sigma, eta=0.0, rho=0.0)
    true_hw = oracles.zbc_price(
        CFG,
        P0_s1=float(analytic_market.P[CFG.n_mat // 2]),
        P0_s2=float(analytic_market.P[-1]),
    )
    true_g2 = g2pp.zbc_price_analytic(CFG, g1, analytic_market)
    assert abs(true_g2 - true_hw) < 1e-6
    res = g2pp.price_zbc_g2(CFG, g1, KEY, analytic_market, n_paths=1 << 16)
    assert abs(float(res.price) - true_hw) < 5 * float(res.std_error_raw) + 1e-4


def test_second_factor_changes_price(analytic_market):
    p1 = g2pp.zbc_price_analytic(
        CFG, g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.0), analytic_market)
    p2 = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    assert p2 != pytest.approx(p1, abs=1e-5)


def test_g2_curve_bootstrap_reproduces_target(analytic_market):
    """The G2++ Q1 analogue: MC curve must reproduce the calibration target
    within MC noise — validates the cross-checkpoint covariance law."""
    cfg = tiny_config(n_paths=1 << 15, path_block=1 << 15, n_mat=21,
                      n_steps=100)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    target = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(oracles.forward_rate(cfg, Ts),
                                          jnp.float32))
    mc = g2pp.bootstrap_curve_g2(cfg, G2, jax.random.key(6), target)
    got = np.asarray(mc.P)
    se = 0.15 * P / np.sqrt(2 * (1 << 15))   # G2 vol is larger than HW's
    assert got[0] == 1.0
    assert np.all(np.abs(got - P) < 6 * se + 5e-5), (
        np.abs(got - P) / np.maximum(se, 1e-9))


def test_g2_cov_integrals_diagonal_matches_v():
    for T in [1.0, 4.0, 10.0]:
        assert abs(g2pp._cov_integrals(G2, T, T)
                   - g2pp._v_integral(G2, T)) < 1e-12


# ---------------------------------------------------------------------------
# Round 2: coupon-bond options / swaptions, vega, 3-d RQMC
# ---------------------------------------------------------------------------

def test_swaption_oracle_degenerates_to_zbc(analytic_market):
    """A single-cashflow CBO with strike K is exactly the ZBC: the 1-d
    conditional-decomposition integral must match the closed form."""
    from hullwhite_tpu.instruments import CouponSchedule

    sched = CouponSchedule(times=(CFG.s2,), coupons=(1.0,))
    orc = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                    strike=CFG.strike, payer=False)
    zbc = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    assert abs(orc - zbc) < 1e-9


def test_swaption_mc_matches_oracle(analytic_market):
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    for payer in (False, True):
        orc = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                        payer=payer)
        est = g2pp.price_swaption_g2(CFG, G2, KEY, analytic_market, sched,
                                     payer=payer, n_paths=1 << 16)
        se = float(est.std_error_raw)
        assert abs(float(est.price) - orc) < 5 * se + 2e-4, (payer, orc)


def test_swaption_rqmc_matches_oracle(analytic_market):
    """RQMC at SE ~1e-7 pins the MC sampler AND the 1-d-integral oracle
    against each other far below single-draw MC noise (measured diff
    <1e-7 on both legs at 2^16 points on CPU)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    for payer in (False, True):
        orc = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                        payer=payer)
        q, se = g2pp.price_swaption_g2_qmc(CFG, G2, KEY, analytic_market,
                                           sched, payer=payer,
                                           n_points=1 << 14)
        assert float(se) < 5e-6
        assert abs(float(q) - orc) < 5 * float(se) + 3e-6, (payer, orc)


def test_swaption_vega_rqmc_matches_oracle_fd(analytic_market):
    """Paired-shift RQMC swaption vega vs the fp64 FD of the 1-d-integral
    oracle; also pins put-call parity in sigma (payer and receiver vegas
    are equal: their price difference is the sigma-independent forward
    swap value)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    vs = []
    for payer in (False, True):
        v, se = g2pp.vega_swaption_g2_rqmc(CFG, G2, KEY, analytic_market,
                                           sched, payer=payer,
                                           n_points=1 << 14)
        va = g2pp.vega_swaption_g2_analytic(CFG, G2, analytic_market,
                                            sched, payer=payer)
        assert abs(float(v) - va) < 4 * float(se) + 5e-5, (payer, va)
        vs.append(va)
    assert abs(vs[0] - vs[1]) < 1e-6


def test_swaption_payer_receiver_parity(analytic_market):
    """payer - receiver = K P(0,S1) - sum c_i P(0,T_i) (model-free)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    pay = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                    payer=True)
    rec = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                    payer=False)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.asarray(analytic_market.P, np.float64)
    fwd = (float(np.interp(CFG.s1, Ts, P))
           - sum(c * float(np.interp(t, Ts, P))
                 for t, c in zip(sched.times, sched.coupons)))
    assert abs((pay - rec) - fwd) < 2e-6


def test_g2_vega_crn_fd_matches_analytic(analytic_market):
    v = float(g2pp.vega_zbc_g2(CFG, G2, KEY, analytic_market, eps=1e-2,
                               n_paths=1 << 18))
    v_an = g2pp.vega_zbc_g2_analytic(CFG, G2, analytic_market)
    assert abs(v - v_an) < 0.10 * abs(v_an) + 5e-4, (v, v_an)


def test_g2_vega_rqmc_matches_analytic(analytic_market):
    """Paired CRN-FD over identical Sobol shifts: per-shift replicates
    difference exactly, so the vega lands within a few SE of the fp64
    closed-form FD (SE ~1e-5 at 2^14 points vs ~3e-4 for 2^18-path MC)."""
    v, se = g2pp.vega_zbc_g2_rqmc(CFG, G2, KEY, analytic_market,
                                  n_points=1 << 14)
    v_an = g2pp.vega_zbc_g2_analytic(CFG, G2, analytic_market)
    assert float(se) < 1e-4
    assert abs(float(v) - v_an) < 4 * float(se) + 5e-5, (float(v), v_an)


def test_g2_zbc_qmc_matches_analytic(analytic_market):
    q, qse = g2pp.price_zbc_g2_qmc(CFG, G2, KEY, analytic_market,
                                   n_points=1 << 12, n_shifts=8)
    true = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    assert abs(float(q) - true) < 6 * float(qse) + 1e-5
    # RQMC must beat plain MC SE at the same budget by a wide margin
    assert float(qse) < 2e-5


# ---------------------------------------------------------------------------
# Round 2b: G2++ Bermudan (exact multi-date states, 2-factor LSMC)
# ---------------------------------------------------------------------------

def test_g2_joint_chol_single_date_matches_state_chol():
    LT = g2pp._g2_joint_chol(G2, (CFG.s1,))
    C = LT.T @ LT
    Cs = g2pp._state_chol(G2, CFG.s1)
    np.testing.assert_allclose(C, Cs.T @ Cs, rtol=0, atol=1e-9)


def test_g2_joint_chol_blocks_match_closed_forms():
    ex = (3.0, 5.0, 8.0)
    LT = g2pp._g2_joint_chol(G2, ex)
    C = LT.T @ LT
    # I x I diagonal/off-diagonal blocks vs the curve-bootstrap formulas
    for i, t1 in enumerate(ex):
        for j, t2 in enumerate(ex):
            got = C[3 * i + 2, 3 * j + 2]
            want = g2pp._cov_integrals(G2, min(t1, t2), max(t1, t2))
            assert abs(got - want) < 1e-8, (t1, t2)


@pytest.mark.slow
def test_g2_bermudan_single_date_is_european(analytic_market):
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    res = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched,
                                 [5.0], n_paths=1 << 16)
    orc = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                    payer=False)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 1e-4


@pytest.mark.slow
def test_g2_bermudan_monotone_in_rights(analytic_market):
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    e1 = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched,
                                [5.0], n_paths=1 << 15)
    e3 = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched,
                                [5.0, 6.0, 7.0], n_paths=1 << 15)
    assert float(e3.price) >= float(e1.price) - 3 * float(e1.std_error)
    assert float(e3.price) <= float(e3.price_in_sample) + 3 * float(e3.std_error)


@pytest.mark.slow
def test_g2_bermudan_degenerates_to_hw_oracle(analytic_market):
    """Multi-date pin: with eta = 0 the G2++ Bermudan is the Hull-White
    Bermudan, so the 1-factor DP oracle must price it (the continuous-vs-
    trapezoid-I law gap is ~2e-5 at dt = 0.01, far below the LSMC SE)."""
    from hullwhite_tpu import bermudan as hw_bermudan
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)  # fine grid for the HW oracle
    g1 = g2pp.G2Params(a=CFG.a, b=0.5, sigma=CFG.sigma, eta=0.0, rho=0.0)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0, 7.0, 8.0]
    res = g2pp.price_bermudan_g2(cfg, g1, KEY, analytic_market, sched, ex,
                                 n_paths=1 << 16)
    orc = hw_bermudan.dp_oracle(cfg, analytic_market, sched, ex)
    # LSMC lower bound: below oracle within noise, and not far below
    assert float(res.price) - 4 * float(res.std_error) <= orc + 1e-4
    assert float(res.price) >= orc - 6 * float(res.std_error) - 3e-4, (
        float(res.price), orc)


def test_g2_cap_mc_matches_closed_form(analytic_market):
    p, se, caplets = g2pp.price_cap_g2(CFG, G2, KEY, analytic_market,
                                       rate=0.02, tenor=3.0,
                                       n_paths=1 << 16)
    tot, per = g2pp.cap_closed_form_g2(CFG, G2, analytic_market, rate=0.02,
                                       tenor=3.0)
    assert len(per) == 3
    assert abs(float(p) - tot) < 5 * float(se) + 1e-4, (float(p), tot)


def test_g2_cap_degenerates_to_hw(analytic_market):
    """eta -> 0: the G2++ cap closed form equals the Hull-White one."""
    from hullwhite_tpu import instruments

    g1 = g2pp.G2Params(a=CFG.a, b=0.5, sigma=CFG.sigma, eta=0.0, rho=0.0)
    tot_g2, _ = g2pp.cap_closed_form_g2(CFG, g1, analytic_market,
                                        rate=0.02, tenor=3.0)
    tot_hw, _ = instruments.cap_closed_form(CFG, analytic_market,
                                            rate=0.02, tenor=3.0)
    assert abs(tot_g2 - tot_hw) < 1e-10


def test_g2_dp_oracle_single_date_is_european(analytic_market):
    """The 2-d DP with one date must match the conditional-decomposition
    European oracle (totally different numerics; O(h^2) grid bias
    verified: 7.8e-5 -> 2.3e-5 -> 4.9e-6 over grid doublings)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    dp1 = g2pp.dp_oracle_g2(cfg, G2, analytic_market, sched, [5.0],
                            n_grid=481, n_quad=96)
    euro = g2pp.swaption_g2_analytic(cfg, G2, analytic_market, sched,
                                     payer=False)
    assert abs(dp1 - euro) < 2e-5, (dp1, euro)


@pytest.mark.slow
def test_g2_bermudan_bracketed_by_dp_oracle(analytic_market):
    """Multi-date: the two-factor LSMC lower bound sits below the 2-d DP
    oracle (within noise) and close to it (policy near-optimal), and the
    AB dual upper bound sits above it (within noise + grid bias) and
    TIGHT (the piecewise proxy's measured excess is ~1.2e-5)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0, 7.0]
    dp = g2pp.dp_oracle_g2(cfg, G2, analytic_market, sched, ex,
                           n_grid=121, n_quad=48)  # +~1.3e-4 grid bias
    res = g2pp.price_bermudan_g2(cfg, G2, KEY, analytic_market, sched, ex,
                                 n_paths=1 << 16)
    lo, up = float(res.price), float(res.upper)
    assert lo - 4 * float(res.std_error) <= dp, (lo, dp)
    assert dp - lo < 1.5e-3, (lo, dp)
    # upper above the converged oracle (coarse dp is biased +1.3e-4 high,
    # hence the allowance), and within 2e-4 of it
    assert up + 4 * float(res.upper_std_error) + 2e-4 >= dp, (up, dp)
    assert up - dp < 2e-4, (up, dp)
    # bracket self-consistency
    assert up >= lo - 4 * (float(res.std_error)
                           + float(res.upper_std_error)), (lo, up)


def test_g2_dual_single_date_is_european(analytic_market):
    """k = 1: the dual proxy is the exact payoff up to the line-boundary
    fit, so the upper bound reproduces the European conditional-
    decomposition oracle with ~zero variance (measured |err| ~1e-8)."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    euro = g2pp.swaption_g2_analytic(CFG, G2, analytic_market, sched,
                                     payer=False)
    res = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched,
                                 [5.0], n_paths=1 << 15)
    up = float(res.upper)
    assert abs(up - euro) < 5 * float(res.upper_std_error) + 5e-6, (
        up, euro)


@pytest.mark.slow
def test_g2_bermudan_rqmc_blocks(analytic_market):
    """Block-streamed RQMC evaluation: replicate guard, total-path
    accounting, and bracket agreement with the MC evaluation."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    ex = [5.0, 6.0]
    with pytest.raises(ValueError):
        g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched, ex,
                               rqmc=True, n_blocks=1)
    mc = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched, ex,
                                n_paths=1 << 14, n_blocks=2)
    rq = g2pp.price_bermudan_g2(CFG, G2, KEY, analytic_market, sched, ex,
                                n_paths=1 << 13, n_blocks=4, rqmc=True)
    assert mc.n_paths == rq.n_paths == 1 << 15
    tol = 5 * (float(mc.std_error) + float(rq.std_error)) + 1e-4
    assert abs(float(mc.price) - float(rq.price)) < tol
    tol_u = 5 * (float(mc.upper_std_error)
                 + float(rq.upper_std_error)) + 5e-5
    assert abs(float(mc.upper) - float(rq.upper)) < tol_u
    # RQMC genuinely reduces the lower bound's variance
    assert float(rq.std_error) < float(mc.std_error)


@pytest.mark.slow
def test_g2_dual_degenerates_to_hw_oracle(analytic_market):
    """eta -> 0 multi-date pin: the G2++ dual upper bound must sit just
    above the 1-factor DP oracle (the continuous-vs-trapezoid I-law gap
    is ~2e-5 at dt = 0.01, and the dual excess is ~1e-5)."""
    from hullwhite_tpu import bermudan as hw_bermudan
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)
    g1 = g2pp.G2Params(a=CFG.a, b=0.5, sigma=CFG.sigma, eta=0.0, rho=0.0)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0, 7.0, 8.0]
    res = g2pp.price_bermudan_g2(cfg, g1, KEY, analytic_market, sched, ex,
                                 n_paths=1 << 16)
    orc = hw_bermudan.dp_oracle(cfg, analytic_market, sched, ex)
    up = float(res.upper)
    assert up + 4 * float(res.upper_std_error) >= orc - 1e-4, (up, orc)
    assert up - orc < 3e-4, (up, orc)


@pytest.mark.slow
def test_g2_bermudan_vega_single_date(analytic_market):
    """k = 1 G2++ Bermudan vega vs the fp64 FD of the conditional-
    decomposition oracle: the dual tangent is stable to 2e-6 across
    seeds with a measured ~1e-4 proxy-misfit bias (the line-boundary fit
    is not exactly the optimal proxy, so dU/d(proxy) is not exactly 0);
    the LSMC lower tangent is MC-noise dominated at this scale."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    e = 1e-4
    gp = g2pp.G2Params(a=G2.a, b=G2.b, sigma=G2.sigma + e, eta=G2.eta,
                       rho=G2.rho)
    gm = g2pp.G2Params(a=G2.a, b=G2.b, sigma=G2.sigma - e, eta=G2.eta,
                       rho=G2.rho)
    vref = (g2pp.swaption_g2_analytic(CFG, gp, analytic_market, sched,
                                      payer=False)
            - g2pp.swaption_g2_analytic(CFG, gm, analytic_market, sched,
                                        payer=False)) / (2.0 * e)
    vlo, vup = g2pp.vega_bermudan_g2(CFG, G2, KEY, analytic_market,
                                     sched, [5.0], n_paths=1 << 16)
    assert abs(vup - vref) < 5e-4, (vup, vref)
    assert abs(vlo - vref) < 2e-2, (vlo, vref)


@pytest.mark.slow
def test_g2_bermudan_curve_delta_matches_dp_oracle(analytic_market):
    """d/dh of the G2++ bracket under a parallel forward-curve shift vs
    the FD of the 2-d DP oracle on the shifted curves (coarse-grid oracle
    bias amplified by /2h sets the ~1% tolerance; measured 0.2% at
    121/48)."""
    from hullwhite_tpu import greeks
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0, 7.0]
    h = 1e-3
    dl, du = g2pp.delta_bermudan_g2(cfg, G2, KEY, analytic_market, sched,
                                    ex, n_paths=1 << 15, h=h)
    dp = (g2pp.dp_oracle_g2(cfg, G2,
                            greeks.shift_curve(cfg, analytic_market, +h),
                            sched, ex, n_grid=121, n_quad=48)
          - g2pp.dp_oracle_g2(cfg, G2,
                              greeks.shift_curve(cfg, analytic_market,
                                                 -h),
                              sched, ex, n_grid=121, n_quad=48)) / (2 * h)
    assert abs(du - dp) < 1e-2 * abs(dp), (du, dp)
    assert abs(dl - dp) < 3e-2 * abs(dp), (dl, dp)


def test_g2_calibration_roundtrip(analytic_market):
    """calibrate_g2 recovers (sigma, eta, rho) from four closed-form
    quotes of distinct structure, starting far away (rho even flips
    sign); (a, b) held fixed per market practice."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched5 = swap_fixed_leg(CFG, 0.025, 5.0)
    sched3 = swap_fixed_leg(CFG, 0.03, 3.0)
    mkt = analytic_market
    pricers = [
        lambda g: g2pp.zbc_price_analytic(CFG, g, mkt),
        lambda g: g2pp.swaption_g2_analytic(CFG, g, mkt, sched5),
        lambda g: g2pp.swaption_g2_analytic(CFG, g, mkt, sched3,
                                            payer=True),
        lambda g: g2pp.cap_closed_form_g2(CFG, g, mkt, rate=0.02)[0],
    ]
    quotes = [(p, p(G2)) for p in pricers]
    g0 = g2pp.G2Params(a=G2.a, b=G2.b, sigma=0.15, eta=0.05, rho=0.2)
    res = g2pp.calibrate_g2(CFG, g0, quotes)
    assert abs(res.params.sigma - G2.sigma) < 1e-6, res
    assert abs(res.params.eta - G2.eta) < 1e-6, res
    assert abs(res.params.rho - G2.rho) < 1e-4, res
    assert res.rmse < 1e-8, res


def test_g2_zbc_surface_matches_per_cell_oracle(analytic_market):
    """Shared-state G2++ option surface vs the fp64 closed form cell by
    cell; the middle cell must also reproduce the single-option pricer's
    closed form (same strike/maturity)."""
    Ks = [CFG.strike * (1 + s) for s in (-0.03, 0.0, 0.03)]
    S2s = [7.0, 8.5, 10.0]
    res = g2pp.price_zbc_grid_g2(CFG, G2, KEY, analytic_market, Ks, S2s,
                                 n_paths=1 << 15)
    orc = g2pp.zbc_grid_analytic_g2(CFG, G2, analytic_market, Ks, S2s)
    err = np.abs(np.asarray(res.price) - orc)
    se = np.asarray(res.std_error_raw)
    assert np.all(err < 5 * se + 2e-4), err / np.maximum(se, 1e-9)
    # consistency with the dedicated ZBC closed form at (strike, s2)
    single = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    j = S2s.index(10.0)
    i = Ks.index(CFG.strike)
    assert abs(orc[i, j] - single) < 1e-9


def test_g2_vega_surface_matches_analytic_fd(analytic_market):
    """Paired-shift RQMC vega surface vs the fp64 closed-form FD surface
    cell by cell (round 3: the G2++ twin of grid.vega_zbc_grid)."""
    Ks = [CFG.strike * (1 + s) for s in (-0.03, 0.0, 0.03)]
    S2s = [7.0, 8.5, 10.0]
    v, se = g2pp.vega_zbc_grid_g2(CFG, G2, KEY, analytic_market, Ks, S2s,
                                  n_points=1 << 13, n_shifts=4)
    orc = g2pp.vega_zbc_grid_analytic_g2(CFG, G2, analytic_market, Ks,
                                         S2s)
    err = np.abs(np.asarray(v) - orc)
    assert np.all(err < 6 * np.asarray(se) + 5e-5), (
        err, np.asarray(se))
    # the middle cell must agree with the dedicated single-option RQMC
    # vega (same strike/maturity, same estimator design)
    v1, _ = g2pp.vega_zbc_g2_rqmc(CFG, G2, KEY, analytic_market,
                                  n_points=1 << 13, n_shifts=4)
    i, j = Ks.index(CFG.strike), S2s.index(10.0)
    assert abs(float(v[i, j]) - float(v1)) < 1e-4, (float(v[i, j]),
                                                    float(v1))


def test_exchange_option_oracle_limits(analytic_market):
    """Margrabe bond-exchange closed form: K -> 0 collapses to P(0,Ta)
    (martingale identity), Ta == Tb collapses to (1-K)^+ P(0,Tb), and
    the MC sampler matches the closed form within noise."""
    from hullwhite_tpu.instruments import curve_level

    v0 = g2pp.exchange_analytic_g2(CFG, G2, analytic_market, 8.0, 10.0,
                                   K=1e-12)
    assert abs(v0 - curve_level(CFG, analytic_market, 8.0)) < 1e-10
    same = g2pp.exchange_analytic_g2(CFG, G2, analytic_market, 9.0, 9.0,
                                     K=0.9)
    assert abs(same - 0.1 * curve_level(CFG, analytic_market, 9.0)) < 1e-12
    K = (curve_level(CFG, analytic_market, 8.0)
         / curve_level(CFG, analytic_market, 10.0)) * 0.98
    orc = g2pp.exchange_analytic_g2(CFG, G2, analytic_market, 8.0, 10.0,
                                    K=K)
    res = g2pp.price_exchange_g2(CFG, G2, KEY, analytic_market, 8.0, 10.0,
                                 K=K, n_paths=1 << 16)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error_raw) + 1e-4


def test_exchange_option_is_two_factor(analytic_market):
    """eta -> 0 changes the exchange price materially at fixed sigma: the
    spread loads the second factor through Bb(Ta) - Bb(Tb), which no
    one-factor calibration can mimic while keeping the single-bond
    options fixed."""
    from hullwhite_tpu.instruments import curve_level

    K = (curve_level(CFG, analytic_market, 8.0)
         / curve_level(CFG, analytic_market, 10.0))
    v2 = g2pp.exchange_analytic_g2(CFG, G2, analytic_market, 8.0, 10.0,
                                   K=K)
    g1 = g2pp.G2Params(a=G2.a, b=G2.b, sigma=G2.sigma, eta=0.0, rho=0.0)
    v1 = g2pp.exchange_analytic_g2(CFG, g1, analytic_market, 8.0, 10.0,
                                   K=K)
    assert abs(v2 - v1) > 0.1 * abs(v2), (v1, v2)


def test_g2_validate_runs_batched(analytic_market):
    """The batched N-run machinery (C32 for the second family): one
    device call, run i reproduces the single-run pricer at the same
    folded key bitwise."""
    runs = g2pp.validate_zbc_g2_runs(CFG, G2, KEY, analytic_market,
                                     n_runs=4, n_paths=1 << 14)
    assert runs.shape == (4, 4)
    single = g2pp.price_zbc_g2(CFG, G2, jax.random.fold_in(KEY, 4002),
                               analytic_market, n_paths=1 << 14)
    assert float(runs[2, 0]) == float(single.price)
    true = g2pp.zbc_price_analytic(CFG, G2, analytic_market)
    se = runs[:, 0].std(ddof=1) / 2.0
    assert abs(runs[:, 0].mean() - true) < 5 * se + 2e-4


@pytest.mark.slow
def test_g2_martingale_cv_lower_bound(analytic_market):
    """G2++ martingale-CV lower: SE collapsed >=10x vs the raw LSMC
    lower (measured ~30x), never above the dual upper within noise."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    cfg = CFG.replace(n_steps=1000)
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0, 7.0]
    r = g2pp.price_bermudan_g2(cfg, G2, KEY, analytic_market, sched, ex,
                               n_paths=1 << 15)
    cv, cv_se = float(r.price_cv), float(r.cv_std_error)
    assert cv_se < float(r.std_error) / 10.0, (cv_se, float(r.std_error))
    assert cv <= float(r.upper) + 4 * (cv_se + float(r.upper_std_error))
    assert abs(cv - float(r.price)) < 4 * float(r.std_error)


def test_g2_range_accrual_matches_closed_form(analytic_market):
    """Two-factor range accrual: the LIBOR band is a strip in (x, y), so
    the fp64 oracle is exact closed form (tilted Phi differences in the
    projected coordinate, covariances straight from _g2_joint_cov)."""
    kw = dict(coupon=0.03, lo=0.01, hi=0.022, tenor=3.0, obs_per_period=5)
    res = g2pp.price_range_accrual_g2(CFG, G2, KEY, analytic_market,
                                      n_paths=1 << 15, n_blocks=2, **kw)
    orc, per = g2pp.range_accrual_closed_form_g2(CFG, G2, analytic_market,
                                                 **kw)
    assert 0 < orc < 0.03 * 3.0
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc)
    np.testing.assert_allclose(np.asarray(res.periods), np.asarray(per),
                               atol=2e-4)


def test_g2_range_accrual_wide_band_and_mesh(analytic_market):
    """Wide band accrues everything: leg == coupon tau sum_j P(0,T_p)
    exactly; and sharded == single on the 8-device mesh."""
    from hullwhite_tpu.parallel import mesh as pmesh

    wide, _ = g2pp.range_accrual_closed_form_g2(
        CFG, G2, analytic_market, coupon=0.03, lo=-0.5, hi=5.0, tenor=3.0)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.asarray(analytic_market.P, np.float64)
    bonds = sum(float(np.interp(CFG.s1 + j + 1.0, Ts, P)) for j in range(3))
    assert abs(wide - 0.03 * bonds) < 1e-9      # fp64 end to end
    kw = dict(coupon=0.03, lo=0.01, hi=0.022, tenor=3.0, n_paths=512,
              n_blocks=8)
    r1 = g2pp.price_range_accrual_g2(CFG, G2, KEY, analytic_market, **kw)
    r8 = g2pp.price_range_accrual_g2(CFG, G2, KEY, analytic_market,
                                     mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6


def test_g2_cms_matches_quadrature(analytic_market):
    """Two-factor CMS caplets vs the tilted exact-in-x/GH-in-y fp64
    oracle (the same conditional decomposition as the Bermudan
    value-iteration targets)."""
    kw = dict(rate=0.02, tenor=3.0, swap_tenor=4.0)
    res = g2pp.price_cms_g2(CFG, G2, KEY, analytic_market,
                            n_paths=1 << 15, n_blocks=2, **kw)
    orc, per = g2pp.cms_quadrature_g2(CFG, G2, analytic_market, **kw)
    assert orc > 0
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 2e-5, (
        float(res.price), orc)
    np.testing.assert_allclose(np.asarray(res.periods), np.asarray(per),
                               atol=1e-4)


@pytest.mark.slow
def test_g2_cms_floor_parity_and_mesh(analytic_market):
    """cap - floor at the same strike equals the forward CMS leg (pure MC
    identity on shared states), and sharded == single."""
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(rate=0.025, tenor=2.0, swap_tenor=4.0, n_paths=1 << 14,
              n_blocks=2)
    cap = g2pp.price_cms_g2(CFG, G2, KEY, analytic_market, **kw)
    flo = g2pp.price_cms_g2(CFG, G2, KEY, analytic_market, floor=True,
                            **kw)
    oc, _ = g2pp.cms_quadrature_g2(CFG, G2, analytic_market, rate=0.025,
                                   tenor=2.0, swap_tenor=4.0)
    of, _ = g2pp.cms_quadrature_g2(CFG, G2, analytic_market, rate=0.025,
                                   tenor=2.0, swap_tenor=4.0, floor=True)
    assert abs((float(cap.price) - float(flo.price)) - (oc - of)) \
        < 5 * (float(cap.std_error) + float(flo.std_error)) + 2e-5
    kw8 = dict(rate=0.02, tenor=2.0, swap_tenor=4.0, n_paths=512,
               n_blocks=8)
    c1 = g2pp.price_cms_g2(CFG, G2, KEY, analytic_market, **kw8)
    c8 = g2pp.price_cms_g2(CFG, G2, KEY, analytic_market,
                           mesh=pmesh.path_mesh(), **kw8)
    assert abs(float(c1.price) - float(c8.price)) < 1e-6
