"""Snowball note: the clip-inactive 2-d DP must reproduce the linear
closed form, the MC (unbiased, no policy) must reproduce the DP, the
control variate must collapse the linear component's noise, and the
CRN-FD vega must match the DP central difference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, snowball
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(55)
KW = dict(initial=0.02, spread=0.013, cap=0.06, floor=0.0, tenor=4.0)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp(analytic_market):
    return snowball.dp_oracle_snowball(CFG, analytic_market, **KW)


def test_unclipped_dp_matches_linear_closed_form(analytic_market):
    """With clip bounds the paths cannot reach, the 2-d DP must collapse
    to the UNCLIPPED linear snowball, whose value is exact closed form —
    this pins the whole (r, c) machinery (tilted kernel continuation +
    c-interpolation) against an independent formula."""
    kw = dict(KW, cap=3.0, floor=-3.0)
    dp2 = snowball.dp_oracle_snowball(CFG, analytic_market, n_cgrid=161,
                                      **kw)
    assert abs(dp2.price - dp2.linear_price) < 1e-5, (
        dp2.price, dp2.linear_price)


def test_clips_add_value(dp):
    """floor=0 truncates the coupon's downside only -> the clipped note
    is worth MORE than the linear one when the floor dominates the cap
    (cap far above the reachable coupon range)."""
    assert dp.price > dp.linear_price
    assert 0.0 <= dp.mean_final_coupon <= KW["cap"]


def test_mc_reproduces_dp(analytic_market, dp):
    res = snowball.price_snowball(CFG, KEY, analytic_market,
                                  n_paths=1 << 15, n_blocks=2, **KW)
    se = float(res.std_error)
    assert abs(float(res.price) - dp.price) < 5 * se + 2e-5, (
        float(res.price), dp.price, se)
    # the linear CV must absorb most of the variance
    assert float(res.std_error) < 0.5 * float(res.raw_std_error)
    # E[c_{n-1}] cross-observable (untilted measure)
    n_tot = 4.0 * res.n_paths
    assert abs(float(res.mean_final_coupon) - dp.mean_final_coupon) \
        < 6 * 0.01 / np.sqrt(n_tot) + 2e-4


def test_degenerate_spread_is_fixed_coupon(analytic_market):
    """spread == 0 with floor == cap == initial freezes the coupon: the
    note is a fixed-coupon bond, closed form from discrete-law P."""
    from hullwhite_tpu.floater import _p0_discrete

    kw = dict(initial=0.02, spread=0.0, cap=0.02, floor=0.02, tenor=3.0)
    dp3 = snowball.dp_oracle_snowball(CFG, analytic_market, **kw)
    expect = sum(0.02 * _p0_discrete(CFG, CFG.sigma, CFG.s1 + j + 1.0)
                 for j in range(3)) \
        + _p0_discrete(CFG, CFG.sigma, CFG.s1 + 3.0)
    assert abs(dp3.price - expect) < 1e-6, (dp3.price, expect)
    res = snowball.price_snowball(CFG, KEY, analytic_market,
                                  n_paths=1 << 12, **kw)
    assert abs(float(res.price) - expect) < 5 * float(res.std_error) + 1e-5


def test_vega_crn_matches_dp_fd(analytic_market):
    v = snowball.vega_snowball(CFG, KEY, analytic_market,
                               n_paths=1 << 15, n_blocks=2, eps=2e-3, **KW)
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


@pytest.mark.slow
def test_sharded_matches_single(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, **KW)
    r1 = snowball.price_snowball(CFG, KEY, analytic_market, **kw)
    r8 = snowball.price_snowball(CFG, KEY, analytic_market,
                                 mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6


@pytest.fixture(scope="module")
def cdp(analytic_market):
    return snowball.dp_oracle_callable_snowball(CFG, analytic_market, **KW)


def test_callable_dp_below_plain(dp, cdp):
    """The issuer's call right can only cheapen the note, the plain legs
    of both oracles must agree exactly (same backward pass), and the
    boundary curves must rise with the running coupon (a richer coupon
    is called at higher rates)."""
    assert cdp.price < cdp.plain_price
    assert cdp.call_premium > 1e-3
    assert abs(cdp.plain_price - dp.price) < 1e-14
    b = np.array(cdp.boundaries)
    assert b.shape == (3, len(cdp.c_grid))
    assert np.all(np.diff(b, axis=1) > -1e-9)


def test_callable_mc_reproduces_dp(analytic_market, cdp):
    res = snowball.price_callable_snowball(
        CFG, KEY, analytic_market, n_paths=1 << 15, n_blocks=2,
        boundaries=cdp.boundaries, c_grid=cdp.c_grid,
        plain_mean=cdp.plain_price, **KW)
    se = float(res.std_error)
    assert abs(float(res.price) - cdp.price) < 5 * se + 3e-5, (
        float(res.price), cdp.price, se)
    assert 0.0 < float(res.call_fraction) < 1.0
    # the 2-CV (plain note + call-at-T_1 leg) must not inflate the SE
    assert float(res.std_error) < float(res.raw_std_error)


def test_callable_policy_is_upper_bound(analytic_market, cdp):
    """A deliberately WRONG fixed policy (boundaries shifted down by
    25 bp: the issuer calls too late) must price ABOVE the DP optimum —
    the fixed-policy MC is an upper bound for the minimizer."""
    shifted = tuple(tuple(v - 0.0025 for v in row)
                    for row in cdp.boundaries)
    res = snowball.price_callable_snowball(
        CFG, KEY, analytic_market, n_paths=1 << 15, n_blocks=2,
        boundaries=shifted, c_grid=cdp.c_grid,
        plain_mean=cdp.plain_price, **KW)
    assert float(res.price) > cdp.price - 3 * float(res.std_error)


@pytest.mark.slow
def test_callable_vega_envelope(analytic_market):
    v = snowball.vega_callable_snowball(CFG, KEY, analytic_market,
                                        n_paths=1 << 15, n_blocks=2,
                                        eps=2e-3, **KW)
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


@pytest.mark.slow
def test_callable_sharded_matches_single(analytic_market, cdp):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, boundaries=cdp.boundaries,
              c_grid=cdp.c_grid, plain_mean=cdp.plain_price, **KW)
    r1 = snowball.price_callable_snowball(CFG, KEY, analytic_market, **kw)
    r8 = snowball.price_callable_snowball(CFG, KEY, analytic_market,
                                          mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6


def test_rqmc_agrees_and_tightens(analytic_market, dp):
    kw = dict(n_paths=1 << 12, n_blocks=8, **KW)
    rq = snowball.price_snowball(CFG, KEY, analytic_market, rqmc=True,
                                 **kw)
    mc = snowball.price_snowball(CFG, KEY, analytic_market, **kw)
    assert abs(float(rq.price) - dp.price) \
        < 6 * float(rq.std_error) + 1e-5
    # piecewise-linear coupon recursion: measured ~15x
    assert float(rq.std_error) < 0.25 * float(mc.std_error)
