"""Puttable range-accrual note: fp64 DP oracle internal consistency
(put-disabled DP == exact closed form), MC threshold-policy estimate vs
the DP value, control-variate effectiveness, and degenerate policies."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, instruments, range_note
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(99)
KW = dict(coupon=0.03, lo=0.010, hi=0.022, tenor=3.0, obs_per_period=5)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp(analytic_market):
    return range_note.dp_oracle_range_note(CFG, analytic_market, **KW)


def _p0_discrete(T):
    """Discrete-law P(0, T) = E[e^{-I(T)}] from the model tables."""
    from hullwhite_tpu.bermudan import _det_states, _step_index
    from hullwhite_tpu.models.hull_white import step_tables
    from hullwhite_tpu.ops.engine_linear import _shock_shapes

    tables = step_tables(CFG, CFG.sigma, CFG.sigma, jnp.float32)
    _, i_det = _det_states(CFG, tables, (T,))
    _, wn = (np.asarray(a, np.float64)
             for a in _shock_shapes(CFG, _step_index(CFG, T)))
    sig = float(tables.sig_st)
    return math.exp(-float(np.asarray(i_det, np.float64)[0])
                    + 0.5 * sig * sig * float(wn @ wn))


def test_dp_plain_matches_closed_form(analytic_market, dp):
    """The put-disabled DP must reproduce range_accrual_closed_form +
    discrete-law P(0,T_n) — this pins the whole conditional machinery
    (tilted coupon Phis, exact cell-kernel continuation) against an
    independent exact formula."""
    leg, _ = instruments.range_accrual_closed_form(CFG, analytic_market,
                                                   **KW)
    plain = leg + _p0_discrete(CFG.s1 + 3.0)
    assert abs(dp.plain_price - plain) < 1e-5, (dp.plain_price, plain)


def test_put_premium_positive_and_bounded(dp):
    assert dp.put_premium > 0
    # crude upper bound: putting at T_1 at the latest cannot be worth
    # more than par today
    assert dp.price < 1.0 + 0.03 * 3.0


def test_mc_reproduces_dp(analytic_market, dp):
    """The MC lower bound under the DP threshold policy equals the DP
    value to MC noise (the threshold policy is optimal for the Markov
    model the DP integrates)."""
    res = range_note.price_range_note(CFG, KEY, analytic_market,
                                      n_paths=1 << 14, n_blocks=2, **KW)
    se = float(res.std_error)
    diff = float(res.price) - dp.price
    assert abs(diff) < 5 * se + 2e-5, (float(res.price), dp.price, se)
    # control variate must actually collapse the common coupon noise
    assert float(res.std_error) < 0.8 * float(res.raw_std_error)
    assert 0.0 <= float(res.put_fraction) <= 1.0


def test_never_put_policy_is_plain_note(analytic_market):
    """boundaries=+inf disables the put: the MC must reproduce the
    non-callable closed form (and the CV becomes exact: SE ~ 0)."""
    n = int(KW["tenor"])
    res = range_note.price_range_note(
        CFG, KEY, analytic_market, boundaries=(math.inf,) * (n - 1),
        n_paths=1 << 12, **KW)
    leg, _ = instruments.range_accrual_closed_form(CFG, analytic_market,
                                                   **KW)
    plain = leg + _p0_discrete(CFG.s1 + 3.0)
    assert float(res.std_error) < 1e-6          # V == Y exactly, beta = 1
    assert abs(float(res.price) - plain) < 1e-5
    assert float(res.put_fraction) == 0.0


def test_always_put_policy(analytic_market):
    """boundaries=-inf puts at T_1 on every path: value = period-0 coupon
    + P(0, T_1) (par at the first put date)."""
    n = int(KW["tenor"])
    res = range_note.price_range_note(
        CFG, KEY, analytic_market, boundaries=(-math.inf,) * (n - 1),
        n_paths=1 << 14, n_blocks=2, **KW)
    kw1 = dict(KW, tenor=1.0)
    leg1, _ = instruments.range_accrual_closed_form(CFG, analytic_market,
                                                    **kw1)
    expect = leg1 + _p0_discrete(CFG.s1 + 1.0)
    assert float(res.put_fraction) == 1.0
    assert abs(float(res.price) - expect) < 5 * float(res.std_error) + 1e-4


def test_dp_boundary_policy_beats_heuristics(analytic_market, dp):
    """The DP boundary must dominate shifted boundaries (any fixed
    policy is a lower bound; the DP one is the argmax)."""
    base = range_note.price_range_note(CFG, KEY, analytic_market,
                                       n_paths=1 << 14, n_blocks=2, **KW)
    for shift in (-0.02, 0.02):
        b = tuple(x + shift for x in dp.boundaries)
        alt = range_note.price_range_note(CFG, KEY, analytic_market,
                                          boundaries=b, n_paths=1 << 14,
                                          n_blocks=2, **KW)
        # CRN (same key): the ordering holds pathwise up to policy noise
        assert float(alt.price) < float(base.price) + 3 * float(
            base.std_error), (shift, float(alt.price), float(base.price))


def test_vega_crn_matches_dp_fd(analytic_market):
    """Frozen-boundary CRN-FD vega vs the re-optimizing DP central
    difference — their agreement is a numerical check of the envelope
    theorem at the optimal threshold."""
    v = range_note.vega_range_note(CFG, KEY, analytic_market,
                                   n_paths=1 << 14, n_blocks=2, eps=2e-3,
                                   **KW)
    assert v.dp_vega > 0           # more vol -> the par put is worth more
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


# ---------------------------------------------------------------------------
# Range-accrual TARN (target redemption)
# ---------------------------------------------------------------------------

TARN_KW = dict(coupon=0.03, lo=0.005, hi=0.03, target=0.055, tenor=4.0)


def test_tarn_mc_matches_lattice_dp(analytic_market):
    """m=1 lattice case: the coupon indicator is deterministic at the
    decision state, so the (level, r) DP is exact — MC must reproduce
    both the price and the knockout probability."""
    dp = range_note.dp_oracle_tarn(CFG, analytic_market, **TARN_KW)
    res = range_note.price_tarn(CFG, KEY, analytic_market,
                                n_paths=1 << 15, n_blocks=2, **TARN_KW)
    assert abs(float(res.price) - dp.price) \
        < 5 * float(res.std_error) + 2e-5, (float(res.price), dp.price)
    n_tot = 2.0 * res.n_paths
    se_ko = math.sqrt(dp.ko_prob * (1 - dp.ko_prob) / n_tot)
    assert abs(float(res.ko_fraction) - dp.ko_prob) < 6 * se_ko + 1e-3
    assert 0.0 < float(res.mean_total) <= TARN_KW["target"] + 1e-9


def test_tarn_no_knockout_is_plain_note(analytic_market):
    """target above any attainable total: the TARN IS the plain note
    (closed form) and the knockout probability is zero."""
    kw = dict(coupon=0.03, lo=0.005, hi=0.03, target=1.0, tenor=3.0)
    dp = range_note.dp_oracle_tarn(CFG, analytic_market, **kw)
    leg, _ = instruments.range_accrual_closed_form(
        CFG, analytic_market, coupon=0.03, lo=0.005, hi=0.03, tenor=3.0,
        obs_per_period=1)
    assert dp.ko_prob == 0.0
    assert abs(dp.price - (leg + _p0_discrete(CFG.s1 + 3.0))) < 1e-5


def test_tarn_instant_knockout(analytic_market):
    """target below one coupon: the note dies at the first in-band
    payment with a capped coupon.  Price is NOT monotone in target
    (a full-coupon target beats both neighbors: full coupon AND early
    par), but the knockout probability IS non-increasing; pin that,
    plus MC agreement at a tiny target where the cap binds."""
    kw = dict(coupon=0.03, lo=0.005, hi=0.03, tenor=4.0)
    kos = [range_note.dp_oracle_tarn(CFG, analytic_market,
                                     target=t, **kw).ko_prob
           for t in (0.01, 0.055, 0.10)]
    assert kos[0] >= kos[1] >= kos[2]
    assert kos[0] > 0.5 > kos[2]
    dp = range_note.dp_oracle_tarn(CFG, analytic_market, target=0.01, **kw)
    res = range_note.price_tarn(CFG, KEY, analytic_market, target=0.01,
                                n_paths=1 << 14, n_blocks=2, **kw)
    assert abs(float(res.price) - dp.price) < 5 * float(res.std_error) \
        + 2e-5
    assert float(res.mean_total) <= 0.01 + 1e-9   # the cap binds


def test_tarn_sharded_matches_single(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, **TARN_KW)
    r1 = range_note.price_tarn(CFG, KEY, analytic_market, **kw)
    r8 = range_note.price_tarn(CFG, KEY, analytic_market,
                               mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6
