"""Callable capped floater: fp64 DP oracle internal consistency
(call-disabled DP == exact closed form), MC issuer-policy estimate vs
the DP value, policy dominance (issuer minimizes), and the frozen-
boundary CRN-FD vega vs the re-optimizing DP."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, floater
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(77)
KW = dict(cap=0.016, floor=0.0, spread=0.004, tenor=3.0)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp(analytic_market):
    return floater.dp_oracle_capped_floater(CFG, analytic_market, **KW)


def test_dp_plain_matches_closed_form(analytic_market, dp):
    """The call-disabled DP must reproduce capped_floater_closed_form +
    discrete-law P(0,T_n) — pins the tilted lognormal partial moments
    and the exact cell-kernel continuation against an independent
    formula."""
    leg, per = floater.capped_floater_closed_form(CFG, analytic_market,
                                                  **KW)
    assert len(per) == 3 and all(v > 0 for v in per)
    plain = leg + floater._p0_discrete(CFG, CFG.sigma, CFG.s1 + 3.0)
    assert abs(dp.plain_price - plain) < 1e-5, (dp.plain_price, plain)


def test_closed_form_branches(analytic_market):
    """cap -> inf and floor -> -inf-ish with spread 0 degenerates to the
    pure floater leg: each period is then P(T_j) - P(T_{j+1}) by
    no-arbitrage (discrete law), a branch-free anchor."""
    leg, per = floater.capped_floater_closed_form(
        CFG, analytic_market, cap=10.0, floor=-10.0, spread=0.0, tenor=3.0)
    for j, v in enumerate(per):
        p1 = floater._p0_discrete(CFG, CFG.sigma, CFG.s1 + j)
        p2 = floater._p0_discrete(CFG, CFG.sigma, CFG.s1 + j + 1.0)
        assert abs(v - (p1 - p2)) < 2e-6, (j, v, p1 - p2)


def test_call_premium_positive(dp):
    assert dp.call_premium > 0
    assert dp.price < dp.plain_price


def test_mc_reproduces_dp(analytic_market, dp):
    """The MC upper bound under the DP issuer threshold equals the DP
    value to MC noise."""
    res = floater.price_capped_floater(CFG, KEY, analytic_market,
                                       n_paths=1 << 14, n_blocks=2, **KW)
    se = float(res.std_error)
    diff = float(res.price) - dp.price
    assert abs(diff) < 5 * se + 2e-5, (float(res.price), dp.price, se)
    assert float(res.std_error) < float(res.raw_std_error)
    assert 0.0 <= float(res.call_fraction) <= 1.0


def test_never_call_policy_is_plain_note(analytic_market):
    """boundaries=-inf disables the call: the MC must reproduce the
    non-callable closed form (and the CV becomes exact: SE ~ 0)."""
    n = int(KW["tenor"])
    res = floater.price_capped_floater(
        CFG, KEY, analytic_market, boundaries=(-math.inf,) * (n - 1),
        n_paths=1 << 12, **KW)
    leg, _ = floater.capped_floater_closed_form(CFG, analytic_market, **KW)
    plain = leg + floater._p0_discrete(CFG, CFG.sigma, CFG.s1 + 3.0)
    assert float(res.std_error) < 1e-6          # V == Y exactly, beta = 1
    assert abs(float(res.price) - plain) < 1e-5
    assert float(res.call_fraction) == 0.0


def test_always_call_policy(analytic_market):
    """boundaries=+inf calls at T_1 on every path: value = period-0
    coupon + P(0, T_1) (par at the first call date)."""
    n = int(KW["tenor"])
    res = floater.price_capped_floater(
        CFG, KEY, analytic_market, boundaries=(math.inf,) * (n - 1),
        n_paths=1 << 14, n_blocks=2, **KW)
    leg1, _ = floater.capped_floater_closed_form(
        CFG, analytic_market, **dict(KW, tenor=1.0))
    expect = leg1 + floater._p0_discrete(CFG, CFG.sigma, CFG.s1 + 1.0)
    assert float(res.call_fraction) == 1.0
    assert abs(float(res.price) - expect) < 5 * float(res.std_error) + 1e-4


def test_dp_boundary_policy_dominates(analytic_market, dp):
    """The issuer MINIMIZES: the DP boundary must produce a LOWER note
    value than shifted boundaries (any fixed policy is an upper bound;
    the DP one is the argmin)."""
    base = floater.price_capped_floater(CFG, KEY, analytic_market,
                                        n_paths=1 << 14, n_blocks=2, **KW)
    for shift in (-0.02, 0.02):
        b = tuple(x + shift for x in dp.boundaries)
        alt = floater.price_capped_floater(CFG, KEY, analytic_market,
                                           boundaries=b, n_paths=1 << 14,
                                           n_blocks=2, **KW)
        # CRN (same key): the ordering holds pathwise up to policy noise
        assert float(alt.price) > float(base.price) - 3 * float(
            base.std_error), (shift, float(alt.price), float(base.price))


def test_vega_crn_matches_dp_fd(analytic_market):
    """Frozen-boundary CRN-FD vega vs the re-optimizing DP central
    difference (envelope theorem at the issuer-optimal threshold)."""
    v = floater.vega_capped_floater(CFG, KEY, analytic_market,
                                    n_paths=1 << 14, n_blocks=2, eps=2e-3,
                                    **KW)
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


def test_sharded_matches_single(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, **KW)
    r1 = floater.price_capped_floater(CFG, KEY, analytic_market, **kw)
    r8 = floater.price_capped_floater(CFG, KEY, analytic_market,
                                      mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6
