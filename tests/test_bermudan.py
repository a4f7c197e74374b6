"""Bermudan LSMC tests: European degeneracy, monotonicity in exercise
rights, and the two-pass bias direction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import bermudan, instruments
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(123)
N = 1 << 15


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def sched():
    # annual fixed leg paying at 6..9, notional at 9
    return instruments.CouponSchedule(times=(6.0, 7.0, 8.0, 9.0),
                                      coupons=(0.025, 0.025, 0.025, 1.025))


def test_single_date_reduces_to_european(analytic_market, sched):
    """One exercise date at S1 == the European option (Jamshidian exact)."""
    cfg = CFG  # s1 = 5.0
    res = bermudan.price_bermudan(cfg, KEY, analytic_market, sched,
                                  [cfg.s1], strike=1.0, payer=False,
                                  n_paths=N)
    jam = instruments.jamshidian_price(cfg, analytic_market, sched,
                                       strike=1.0, payer=False)
    assert abs(float(res.price) - jam) < 5 * float(res.std_error) + 2e-4, (
        float(res.price), jam, float(res.std_error))


@pytest.mark.slow
def test_more_exercise_rights_never_cheaper(analytic_market, sched):
    euro = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0], n_paths=N)
    berm = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0, 6.0, 7.0], n_paths=N)
    # the Bermudan out-of-sample price is a lower bound, so allow noise
    assert float(berm.price) >= float(euro.price) - 3 * float(euro.std_error)


@pytest.mark.slow
def test_bermudan_dominates_each_european(analytic_market, sched):
    """Bermudan >= the best of the individual Europeans at its dates."""
    berm = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0, 6.5, 8.0], payer=True, n_paths=N)
    best_euro = -1.0
    for t in [5.0, 6.5, 8.0]:
        cfg_t = CFG.replace(s1=t)
        alive = instruments.CouponSchedule(
            times=tuple(x for x in sched.times if x > t),
            coupons=tuple(c for x, c in zip(sched.times, sched.coupons)
                          if x > t))
        jam = instruments.jamshidian_price(cfg_t, analytic_market, alive,
                                           strike=1.0, payer=True)
        best_euro = max(best_euro, jam)
    tol = 3 * float(berm.std_error) + 2e-4
    assert float(berm.price) >= best_euro - tol, (float(berm.price), best_euro)


@pytest.mark.slow
def test_out_of_sample_not_above_in_sample(analytic_market, sched):
    """Foresight bias direction: in-sample >= out-of-sample in expectation;
    check it holds within noise on one run."""
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                  [5.0, 6.0, 7.0, 8.0], n_paths=N)
    assert float(res.price) <= float(res.price_in_sample) + 3 * float(res.std_error)


def test_exercise_after_last_cashflow_rejected(analytic_market, sched):
    with pytest.raises(ValueError, match="precede the last cashflow"):
        bermudan.price_bermudan(CFG, KEY, analytic_market, sched, [9.5],
                                n_paths=1024)


# ---------------------------------------------------------------------------
# Round 2: DP oracle, dual upper bound, RQMC, block streaming
# ---------------------------------------------------------------------------

def test_dp_oracle_single_date_is_european(analytic_market, sched):
    """The 1-d dynamic program with one date must equal Jamshidian."""
    jam = instruments.jamshidian_price(CFG, analytic_market, sched,
                                       strike=1.0, payer=False)
    orc = bermudan.dp_oracle(CFG, analytic_market, sched, [5.0])
    assert abs(orc - jam) < 3e-5, (orc, jam)


@pytest.mark.slow
def test_bracket_contains_dp_oracle(analytic_market, sched):
    """lower - 4 SE <= DP oracle <= upper + 4 SE, and the bracket is
    tight (< 1.5% of price)."""
    ex = [5.0, 6.0, 7.0, 8.0]
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched, ex,
                                  n_paths=N, n_blocks=2)
    orc = bermudan.dp_oracle(CFG, analytic_market, sched, ex)
    lo, up = float(res.price), float(res.upper)
    assert lo - 4 * float(res.std_error) <= orc, (lo, orc)
    assert orc <= up + 4 * float(res.upper_std_error), (orc, up)
    assert up - lo < 0.015 * orc + 4 * float(res.std_error), (lo, up, orc)


def test_upper_single_date_unbiased(analytic_market, sched):
    """With one exercise date the dual max is linear, so the upper bound
    is an UNBIASED European estimator (martingale increments cancel)."""
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched, [5.0],
                                  n_paths=N)
    jam = instruments.jamshidian_price(CFG, analytic_market, sched,
                                       strike=1.0, payer=False)
    assert abs(float(res.upper) - jam) < 5 * float(res.upper_std_error) + 5e-5


@pytest.mark.slow
def test_rqmc_and_streaming_consistent(analytic_market, sched):
    ex = [5.0, 6.0, 7.0]
    orc = bermudan.dp_oracle(CFG, analytic_market, sched, ex)
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched, ex,
                                  n_paths=1 << 13, n_blocks=4, rqmc=True)
    assert float(res.price) - 4 * float(res.std_error) <= orc
    assert orc <= float(res.upper) + 4 * float(res.upper_std_error)
    # streamed evaluation: total paths = n_paths * n_blocks
    assert res.n_paths == (1 << 13) * 4


def test_dense_dates_approach_american_limit(analytic_market, sched):
    """The DP oracle is monotone in exercise rights and converges as the
    date set densifies toward the American limit (quarterly < monthly
    increments shrink)."""
    cfg = CFG.replace(n_steps=1000)  # dt = 0.01 so quarter-dates sit on it
    annual = bermudan.dp_oracle(cfg, analytic_market, sched,
                                [5.0, 6.0, 7.0, 8.0])
    semi = bermudan.dp_oracle(cfg, analytic_market, sched,
                              [5.0 + 0.5 * j for j in range(8)])
    quarterly = bermudan.dp_oracle(cfg, analytic_market, sched,
                                   [5.0 + 0.25 * j for j in range(16)])
    assert annual <= semi + 1e-9 <= quarterly + 2e-9
    # increments shrink: the dense-date limit is being approached
    assert (quarterly - semi) < (semi - annual)


def test_rqmc_requires_replicates(analytic_market, sched):
    with pytest.raises(ValueError, match="n_blocks >= 2"):
        bermudan.price_bermudan(CFG, KEY, analytic_market, sched, [5.0],
                                n_paths=1024, rqmc=True)


@pytest.mark.slow
def test_payer_bermudan_bracket(analytic_market, sched):
    """Payer side: bracket still holds around the DP oracle."""
    ex = [5.0, 6.0, 7.0]
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched, ex,
                                  payer=True, n_paths=N, n_blocks=2)
    orc = bermudan.dp_oracle(CFG, analytic_market, sched, ex, payer=True)
    assert float(res.price) - 4 * float(res.std_error) <= orc
    assert orc <= float(res.upper) + 4 * float(res.upper_std_error)


@pytest.mark.slow
def test_bermudan_vega_single_date_matches_jamshidian(analytic_market,
                                                      sched):
    """k = 1 Bermudan vega == European vega.  The dual's tangent is a
    near-zero-variance estimator (measured |err| 6e-5 vs the fp64
    Jamshidian FD); the LSMC lower's pathwise tangent agrees within MC
    noise."""
    from hullwhite_tpu import greeks, instruments

    e = 1e-4
    jp = instruments.jamshidian_price(CFG.replace(sigma=CFG.sigma + e),
                                      analytic_market, sched)
    jm = instruments.jamshidian_price(CFG.replace(sigma=CFG.sigma - e),
                                      analytic_market, sched)
    vref = (jp - jm) / (2.0 * e)
    p, dp, u, du = greeks.bermudan_vega(CFG, KEY, analytic_market, sched,
                                        [5.0], n_paths=N)
    assert abs(float(du) - vref) < 3e-4, (float(du), vref)
    assert abs(float(dp) - vref) < 1e-2, (float(dp), vref)


@pytest.mark.slow
def test_bermudan_vega_jvp_matches_fd(analytic_market, sched):
    """Multi-date: forward-mode AD through the two-pass estimator agrees
    with central CRN differences — tightly on the smooth dual tangent
    (measured 2e-5), loosely on the lower (the exercise-flip term is
    sampled by FD but measure-zero under jvp)."""
    from hullwhite_tpu import greeks

    ex = [5.0, 6.0, 7.0]
    _, dp, _, du = greeks.bermudan_vega(CFG, KEY, analytic_market, sched,
                                        ex, n_paths=N)
    _, dpf, _, duf = greeks.bermudan_vega(CFG, KEY, analytic_market,
                                          sched, ex, n_paths=N, mode="fd")
    assert abs(float(du) - float(duf)) < 1e-3, (float(du), float(duf))
    assert abs(float(dp) - float(dpf)) < 5e-2, (float(dp), float(dpf))
    with pytest.raises(ValueError, match="jvp"):
        greeks.bermudan_vega(CFG, KEY, analytic_market, sched, ex,
                             n_paths=1024, mode="nope")


def test_bermudan_curve_delta_matches_dp_oracle(analytic_market, sched):
    """d/dh of the bracket under a parallel forward-curve shift vs the
    fp64 DP oracle on the shifted curves.  CRN makes the states identical
    on both legs (the curve enters only payoff coefficients), so the
    smooth dual delta lands within ~2e-3 of the oracle; the LSMC lower
    carries policy/MC effects (measured ~1%)."""
    from hullwhite_tpu import greeks

    ex = [5.0, 6.0, 7.0]
    h = 1e-3
    dl, du = greeks.bermudan_delta(CFG, KEY, analytic_market, sched, ex,
                                   n_paths=N, h=h)
    dp = (bermudan.dp_oracle(CFG, greeks.shift_curve(CFG, analytic_market,
                                                     +h), sched, ex)
          - bermudan.dp_oracle(CFG, greeks.shift_curve(CFG,
                                                       analytic_market,
                                                       -h), sched, ex)
          ) / (2.0 * h)
    assert abs(du - dp) < 2e-3 * abs(dp), (du, dp)
    assert abs(dl - dp) < 3e-2 * abs(dp), (dl, dp)


def test_bermudan_greeks_predict_bumped_price(analytic_market, sched):
    """Hedging integration: the dual-side curve-delta and vega predict
    the price under a joint (curve, sigma) bump to second order — the
    greeks compose into an actual hedge.  The truth leg is the CRN dual
    (same key) under the same calibration-consistent sigma convention
    the vega differentiates (theta rebuilt via step_tables(sigma,
    sigma0); dp_oracle's replace(sigma) bump lacks that adjustment and
    differs at first order — measured 2e-4 at e=2e-3)."""
    from hullwhite_tpu import greeks

    ex = [5.0, 6.0, 7.0]
    h, e = 5e-4, 2e-3
    base = float(bermudan.price_bermudan(CFG, KEY, analytic_market,
                                         sched, ex, n_paths=N).upper)
    _, du = greeks.bermudan_delta(CFG, KEY, analytic_market, sched, ex,
                                  n_paths=N, h=1e-3)
    _, _, _, dv = greeks.bermudan_vega(CFG, KEY, analytic_market, sched,
                                       ex, n_paths=N, mode="fd")
    bumped = float(bermudan.price_bermudan(
        CFG, KEY, greeks.shift_curve(CFG, analytic_market, h), sched, ex,
        sigma=CFG.sigma + e, n_paths=N).upper)
    predicted = base + du * h + float(dv) * e
    # CRN cancels the MC noise; what remains is the second-order
    # remainder (gamma h^2, volga e^2, vanna h e) + FD truncation
    assert abs(bumped - predicted) < 2e-5, (bumped, predicted, base)


def test_martingale_cv_lower_bound(analytic_market, sched):
    """The martingale-CV lower bound has the same expectation as the raw
    LSMC lower (E[M_tau] = 0 by optional stopping) with the SE collapsed
    >=20x (measured ~170x at this scale): across seeds it lands within a
    few SE of the DP oracle and never crosses the dual upper."""
    ex = [5.0, 6.0, 7.0]
    dp = bermudan.dp_oracle(CFG, analytic_market, sched, ex)
    for seed in (1, 2, 3):
        r = bermudan.price_bermudan(CFG, jax.random.key(seed),
                                    analytic_market, sched, ex,
                                    n_paths=N)
        cv, cv_se = float(r.price_cv), float(r.cv_std_error)
        assert cv_se < float(r.std_error) / 20.0, (cv_se, r.std_error)
        # unbiased for the POLICY value (<= dp); tight around it
        assert abs(cv - dp) < 5 * cv_se + 5e-6, (cv, dp)
        assert cv <= float(r.upper) + 4 * (cv_se
                                           + float(r.upper_std_error))
