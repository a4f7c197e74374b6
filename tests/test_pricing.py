"""End-to-end product tests against float64 analytic oracles — stronger
than the reference's runtime range checks (1_bond_pricing.cu:98-104).
All on a small CPU config; statistical gates sized to its MC error.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles
from hullwhite_tpu import pricing, greeks

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(42)


@pytest.fixture(scope="module")
def market():
    return pricing.bootstrap_curve(CFG, KEY)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_q1_curve_against_analytic(market):
    """MC P(0,T) must sit within ~4 standard errors of the analytic curve."""
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P_true = np.array([oracles.bond_price(CFG, T) for T in Ts])
    P_mc = np.asarray(market.P)
    assert P_mc[0] == 1.0
    # rough SE of exp(-I): std < 0.1 * P; 2^15 legs
    se = 0.1 * P_true / math.sqrt(2 * CFG.n_paths)
    assert np.all(np.abs(P_mc - P_true) < 5 * se + 1e-4), (
        np.abs(P_mc - P_true) / se)


def test_q1_validation_gates(market):
    """The reference's runtime gates (1_bond_pricing.cu:98-104)."""
    P = np.asarray(market.P)
    f = np.asarray(market.f)
    assert 0.99 < P[0] < 1.01
    assert 0.3 < P[-1] < 0.9
    assert 0.005 < f[0] < 0.02  # f(0,0) = r0 = 1.2%


def test_q1_engines_agree():
    """Scan and linear engines consume identical shocks => identical curve
    up to fp32 reduction order."""
    m_lin = pricing.bootstrap_curve(CFG, KEY, engine="linear")
    m_scan = pricing.bootstrap_curve(CFG, KEY, engine="scan")
    np.testing.assert_allclose(np.asarray(m_lin.P), np.asarray(m_scan.P),
                               rtol=5e-5)


def test_q2a_theta_recovery(market):
    rec = pricing.theta_recovery(CFG, market)
    # MC forward-curve noise dominates; gate like the reference (<0.01)
    assert rec.max_error < 0.01
    assert rec.success


def test_q2b_zbc_price(analytic_market):
    """CV-adjusted ZBC on the analytic market curve vs closed form."""
    est = pricing.price_zbc(CFG, KEY, analytic_market)
    true = oracles.zbc_price(
        CFG,
        P0_s1=float(analytic_market.P[CFG.n_mat // 2]),
        P0_s2=float(analytic_market.P[-1]),
    )
    # SE of the raw estimator ~ 0.05/sqrt(2^15) ~ 3e-4; CV cuts it further
    assert abs(float(est.price) - true) < 1.5e-3
    assert 0.0 < float(est.beta) < 1.0
    assert 0.2 < float(est.correlation) < 1.0


def test_q2b_engines_agree(analytic_market):
    e_lin = pricing.price_zbc(CFG, KEY, analytic_market, engine="linear")
    e_scan = pricing.price_zbc(CFG, KEY, analytic_market, engine="scan")
    assert abs(float(e_lin.price) - float(e_scan.price)) < 1e-6
    assert abs(float(e_lin.beta) - float(e_scan.beta)) < 1e-3


def test_q3_pathwise_vega_against_analytic(analytic_market):
    vega = float(pricing.pathwise_vega(CFG, KEY, analytic_market))
    true = oracles.zbc_vega(
        CFG,
        P0_s1=float(analytic_market.P[CFG.n_mat // 2]),
        P0_s2=float(analytic_market.P[-1]),
    )
    assert abs(vega - true) < 0.03 * abs(true) + 5e-3


def test_q3_vega_engines_agree(analytic_market):
    v_lin = float(pricing.pathwise_vega(CFG, KEY, analytic_market, engine="linear"))
    v_scan = float(pricing.pathwise_vega(CFG, KEY, analytic_market, engine="scan"))
    assert abs(v_lin - v_scan) < 1e-5


def test_q3_fd_crn_matches_pathwise(analytic_market):
    """FD with CRN must agree with the pathwise tangent to second order in
    eps (the reference observes 0.18% at eps=1e-3, README.md:50)."""
    vega_pw = float(pricing.pathwise_vega(CFG, KEY, analytic_market))
    fd = greeks.fd_vega_crn(CFG, KEY, analytic_market, eps=1e-3)
    # CRN+same-legs: difference is convexity O(eps^2) + estimator noise
    # (pathwise is single-leg, FD is CV-adjusted antithetic) -> few %.
    assert abs(float(fd.vega) - vega_pw) < 0.05 * abs(vega_pw) + 5e-3


def test_q3_jvp_vega_matches_dual(analytic_market):
    """AD through the simulation must reproduce the hand-derived dual
    process (single +G leg, same shocks) to fp32 accuracy."""
    vega_pw = float(pricing.pathwise_vega(CFG, KEY, analytic_market))
    _, vega_ad = greeks.jvp_vega(CFG, KEY, analytic_market, antithetic=False)
    assert abs(float(vega_ad) - vega_pw) < 1e-4 * max(1.0, abs(vega_pw))


def test_q3_recalibrated_fd_runs(analytic_market):
    fd = greeks.fd_vega_recalibrated(CFG, KEY, jax.random.key(9), eps=1e-3)
    # recalibration injects curve-level MC noise: only sanity-check output
    assert np.isfinite(float(fd.vega))


def test_pathwise_delta_against_analytic(analytic_market):
    """d price / d r0 (beyond the reference's greeks) vs the closed form."""
    delta = float(pricing.pathwise_delta(CFG, KEY, analytic_market))
    true = oracles.zbc_delta(
        CFG,
        P0_s1=float(analytic_market.P[CFG.n_mat // 2]),
        P0_s2=float(analytic_market.P[-1]),
    )
    assert true < 0  # call on a bond loses value as rates rise
    assert abs(delta - true) < 0.03 * abs(true) + 5e-3, (delta, true)


def test_pathwise_delta_matches_fd(analytic_market):
    """Central difference of the raw price under an r0 bump (CRN) must
    agree with the pathwise estimator on the same draws."""
    eps = 1e-4
    vals = {}
    for s in (-1.0, 1.0):
        cfg_b = CFG.replace(r0=CFG.r0 + s * eps)
        est = pricing.price_zbc(cfg_b, KEY, analytic_market, engine="exact")
        vals[s] = float(est.price_raw)
    fd = (vals[1.0] - vals[-1.0]) / (2 * eps)
    delta = float(pricing.pathwise_delta(CFG, KEY, analytic_market))
    assert abs(delta - fd) < 0.02 * abs(delta) + 1e-3, (delta, fd)


def test_gamma_matches_analytic_fd(analytic_market):
    """CRN-FD gamma of the pathwise delta vs fp64 finite difference of the
    closed-form delta oracle."""
    gamma = float(greeks.gamma_zbc(CFG, KEY, analytic_market, eps=2e-4))
    P1 = float(analytic_market.P[CFG.n_mat // 2])
    P2 = float(analytic_market.P[-1])
    # oracle: the mean shifts scale P(S1,S2) by e^{-B dr} and the discount
    # by e^{-dI}; differentiate the closed-form delta numerically in fp64
    import math as m

    E = m.exp(-CFG.a * CFG.dt)
    n1 = CFG.n_steps_s1
    dr = E ** n1
    dI = CFG.dt * (0.5 + sum(E ** k for k in range(1, n1)) + 0.5 * E ** n1)
    B = (1 - m.exp(-CFG.a * (CFG.s2 - CFG.s1))) / CFG.a

    def delta_at(shift):
        # shifted effective curve points seen by the option
        P1s = P1 * m.exp(-dI * shift)  # discount shift folds into P(0,S1)
        P2s = P2 * m.exp(-(dI + B * dr) * shift)
        return oracles.zbc_delta(CFG, P0_s1=P1s, P0_s2=P2s,
                                 dr_dr0=dr, di_dr0=dI)

    h = 1e-5
    gamma_true = (delta_at(h) - delta_at(-h)) / (2 * h)
    assert abs(gamma - gamma_true) < 0.05 * abs(gamma_true) + 5e-3, (
        gamma, gamma_true)


def test_batched_validation_matches_host_loop(market):
    """validate_zbc_runs / validate_vega_runs (one lax.map device call)
    must reproduce the per-run host loop exactly (same folded keys)."""
    from hullwhite_tpu.ops.payoffs import cv_estimate

    n = 4
    est = pricing.validate_zbc_runs(CFG, KEY, market, n_runs=n,
                                    engine="linear", offset=1000)
    f = pricing._zbc_moments_fn(CFG, "linear", None)
    for run in range(n):
        k = jax.random.fold_in(KEY, 1000 + run)
        ref = cv_estimate(jnp.asarray(f(k, CFG.sigma, CFG.sigma, market)),
                          market.P[-1])
        assert abs(float(ref.price) - float(est.price[run])) < 1e-7
        assert abs(float(ref.beta) - float(est.beta[run])) < 1e-6

    v = pricing.validate_vega_runs(CFG, KEY, market, n_runs=n,
                                   engine="linear", offset=2000)
    fv = pricing._vega_sums_fn(CFG, "linear", None)
    for run in range(n):
        k = jax.random.fold_in(KEY, 2000 + run)
        s = fv(k, CFG.sigma, CFG.sigma, market)
        assert abs(float(s[0] / s[1]) - float(v[run])) < 1e-7


def test_implied_sigma_roundtrip(market):
    """Calibration closes the loop: implied_sigma(price(sigma)) == sigma."""
    from hullwhite_tpu.models import oracles

    for sig in (0.05, 0.1, 0.2):
        target = oracles.zbc_price(CFG, float(market.P[CFG.n_mat // 2]),
                                   float(market.P[-1]), sigma=sig)
        got = greeks.implied_sigma(CFG, market, target, sigma0=0.15)
        assert abs(got - sig) < 1e-8, (sig, got)


def test_public_pricer_facade_matches_composed_api(market):
    """curve_pricer/zbc_pricer split == the one-call API bit-for-bit."""
    pr = pricing.curve_pricer(CFG, engine="exact")
    prepared = pr.prepare(CFG.sigma, CFG.sigma)
    sums = pr.run(KEY, prepared)
    ref = pricing._curve_sums_fn(CFG, "exact", None)(KEY, CFG.sigma,
                                                     CFG.sigma)
    np.testing.assert_array_equal(np.asarray(sums), np.asarray(ref))

    zp = pricing.zbc_pricer(CFG, engine="exact")
    m = zp.run(KEY, zp.prepare(CFG.sigma, CFG.sigma, market), market)
    ref = pricing._zbc_moments_fn(CFG, "exact", None)(
        KEY, CFG.sigma, CFG.sigma, market)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref), rtol=1e-6)


def test_joint_calibration_roundtrip(market):
    """calibrate_hw recovers (a, sigma) from closed-form quotes of three
    structurally distinct instruments, from starts on either side — the
    multi-instrument generalization of implied_sigma."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    pricers = [greeks.zbc_quote(market),
               greeks.cap_quote(market, rate=0.02, tenor=4.0),
               greeks.swaption_quote(market, sched)]
    true_cfg = CFG.replace(a=0.8, sigma=0.12)
    quotes = [(p, p(true_cfg)) for p in pricers]
    for a0, s0 in ((0.4, 0.05), (2.0, 0.3)):
        res = greeks.calibrate_hw(CFG, quotes, a0=a0, sigma0=s0)
        assert abs(res.a - 0.8) < 1e-5, res
        assert abs(res.sigma - 0.12) < 1e-6, res
        assert res.rmse < 1e-7, res
