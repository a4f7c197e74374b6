"""Chooser (flexi) cap / auto-cap: fp64 lattice-DP oracle internal pins
(k = n collapses to the plain cap closed form; the side full-cap column
equals it exactly), rights monotonicity, MC threshold-policy estimate vs
the DP value, degenerate policies, and the frozen-policy CRN-FD vega."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, chooser, instruments
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(31)
KW = dict(rate=0.013, tenor=3.0, freq=1.0)
N = int(round(KW["tenor"] * KW["freq"]))


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp2(analytic_market):
    return chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=2, **KW)


def test_full_rights_collapse_to_cap(analytic_market):
    """k = n removes the budget: chooser == auto == the side full-cap
    column == the caplet-replication closed form (up to the discrete-
    trapezoid-law vs continuous-law gap) — pins the whole tilted kernel
    machinery against an independent exact formula."""
    cap_cf, per = instruments.cap_closed_form(CFG, analytic_market, **KW)
    assert len(per) == N
    ch = chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=N, **KW)
    au = chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=N,
                                       auto=True, **KW)
    # k = n never skips a positive caplet, but the max branch and the
    # always-add side column associate differently: ~1 ulp apart.
    assert abs(ch.price - ch.cap_price) < 1e-14
    assert abs(ch.price - au.price) < 1e-12
    assert abs(ch.price - cap_cf) < 2e-5, (ch.price, cap_cf)


def test_rights_monotone_concave(analytic_market):
    """Value increases in the budget k with DECREASING marginal right
    values (more rights -> each one worth less), chooser >= auto per k,
    and k = 0 is worthless."""
    ch = [chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=k,
                                        **KW).price
          for k in range(N + 1)]
    au = [chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=k,
                                        auto=True, **KW).price
          for k in range(N + 1)]
    assert ch[0] == 0.0 and au[0] == 0.0
    for k in range(N):
        assert ch[k + 1] > ch[k] - 1e-15
        assert au[k + 1] > au[k] - 1e-15
        assert ch[k + 1] >= au[k + 1] - 1e-12, (k, ch, au)
    marg = np.diff(ch)
    assert np.all(np.diff(marg) < 1e-12), marg  # concave in k
    assert abs(ch[N] - au[N]) < 1e-12


def test_boundaries_monotone_in_rights(dp2):
    """More remaining rights -> exercise more eagerly (lower threshold):
    each date's thresholds decrease in c (c = 0 row is +inf: never)."""
    for row in dp2.boundaries:
        assert row[0] == math.inf
        finite = [b for b in row[1:] if math.isfinite(b)]
        assert np.all(np.diff(row[1:]) <= 1e-12), row
        assert len(finite) >= 1


def test_mc_reproduces_dp(analytic_market, dp2):
    """The MC lower bound under the DP thresholds equals the DP value to
    MC noise, and the full-cap CV tightens the estimate."""
    res = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                    n_paths=1 << 14, n_blocks=2, **KW)
    se = float(res.std_error)
    assert abs(float(res.price) - dp2.price) < 5 * se + 2e-5, (
        float(res.price), dp2.price, se)
    assert se < float(res.raw_std_error)
    assert 0.0 <= float(res.used_mean) <= 2.0


def test_auto_mc_reproduces_dp(analytic_market):
    """The auto-cap policy is intrinsic (no optimization), so the MC is
    exact-policy: it must hit the auto DP value to noise."""
    dpa = chooser.dp_oracle_chooser_cap(CFG, analytic_market, k=2,
                                        auto=True, **KW)
    res = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                    auto=True, n_paths=1 << 14,
                                    n_blocks=2, **KW)
    se = float(res.std_error)
    assert abs(float(res.price) - dpa.price) < 5 * se + 2e-5, (
        float(res.price), dpa.price, se)


def test_chooser_dominates_auto_mc(analytic_market):
    """Optimal choice beats first-come-first-served under CRN."""
    ch = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=1,
                                   n_paths=1 << 14, **KW)
    au = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=1,
                                   auto=True, n_paths=1 << 14, **KW)
    assert float(ch.price) > float(au.price) - 3 * float(ch.std_error)


def test_never_exercise_policy_is_zero(analytic_market, dp2):
    """boundaries=+inf never exercises: V = 0 on every path, the CV
    covariance vanishes, and the estimate is exactly zero."""
    b = ((math.inf,) * 3,) * N
    res = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                    boundaries=b,
                                    cap_mean=dp2.cap_price,
                                    n_paths=1 << 12, **KW)
    assert abs(float(res.price)) < 1e-7
    assert float(res.used_mean) == 0.0


def test_always_exercise_policy_is_first_k_caplets(analytic_market, dp2):
    """boundaries=-inf burns the k rights on the FIRST k fixings whatever
    the moneyness: value = sum of the first k caplet closed forms."""
    _, per = instruments.cap_closed_form(CFG, analytic_market, **KW)
    b = ((-math.inf,) * 3,) * N
    res = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                    boundaries=b,
                                    cap_mean=dp2.cap_price,
                                    n_paths=1 << 14, n_blocks=2, **KW)
    expect = per[0] + per[1]
    assert float(res.used_mean) == 2.0
    assert abs(float(res.price) - expect) < 5 * float(res.std_error) + 2e-5


def test_dp_policy_dominates_shifts(analytic_market, dp2):
    """Any fixed policy lower-bounds the chooser value; the DP thresholds
    are the argmax, so shifting them can only lose value (CRN)."""
    base = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                     n_paths=1 << 14, n_blocks=2, **KW)
    for shift in (-0.02, 0.02):
        b = tuple(tuple(x + shift for x in row) for row in dp2.boundaries)
        alt = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                        boundaries=b,
                                        cap_mean=dp2.cap_price,
                                        n_paths=1 << 14, n_blocks=2, **KW)
        assert float(alt.price) < float(base.price) + 3 * float(
            base.std_error), (shift, float(alt.price), float(base.price))


def test_vega_matches_dp_fd(analytic_market):
    """Frozen-policy CRN-FD vega vs the re-optimizing fp64 DP central
    difference (envelope theorem at the optimal thresholds)."""
    v = chooser.vega_chooser_cap(CFG, KEY, analytic_market, k=2,
                                 n_paths=1 << 14, n_blocks=2, **KW)
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 5e-4, (
        float(v.vega), v.dp_vega)


def test_mesh_matches_single(analytic_market):
    """Sharded == single-device per block (global-block-index keying)."""
    from hullwhite_tpu.parallel.mesh import path_mesh
    single = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                       n_paths=1 << 12, n_blocks=8, **KW)
    mesh = path_mesh()
    shard = chooser.price_chooser_cap(CFG, KEY, analytic_market, k=2,
                                      n_paths=1 << 12, n_blocks=8,
                                      mesh=mesh, **KW)
    np.testing.assert_allclose(float(shard.price), float(single.price),
                               rtol=0, atol=2e-6)


# --- G2++ twin ---------------------------------------------------------

from hullwhite_tpu.models.g2pp import G2Params

G2 = G2Params()


@pytest.fixture(scope="module")
def dp2_g2(analytic_market):
    return chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market,
                                            k=2, **KW)


@pytest.mark.slow
def test_g2_full_rights_collapse_to_cap(analytic_market):
    from hullwhite_tpu.barrier import cap_closed_form_g2

    cf, _ = cap_closed_form_g2(CFG, G2, analytic_market, rate=KW["rate"],
                               tenor=KW["tenor"])
    ch = chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market, k=N,
                                          **KW)
    au = chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market, k=N,
                                          auto=True, **KW)
    assert abs(ch.price - ch.cap_price) < 1e-12
    assert abs(au.price - au.cap_price) < 1e-12
    # the (u, w) bilinear surface's documented O(h^2) convexity bias
    assert abs(ch.cap_price - cf) < 2e-4


@pytest.mark.slow
def test_g2_rights_monotone_concave(analytic_market):
    vals = [chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market,
                                             k=k, **KW).price
            for k in range(N + 1)]
    assert vals[0] == 0.0
    marg = np.diff(vals)
    assert (marg > 0).all()
    assert (np.diff(marg) < 1e-12).all()     # diminishing marginal right
    # auto <= chooser for every interior budget (choice premium >= 0)
    for k in (1, 2):
        a = chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market,
                                             k=k, auto=True, **KW).price
        assert a <= vals[k] + 1e-12


@pytest.mark.slow
def test_g2_mc_reproduces_dp(analytic_market, dp2_g2):
    res = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market,
                                       k=2, n_paths=1 << 14, n_blocks=4,
                                       **KW)
    # the default-grid DP carries the documented O(h^2) bias (~1e-4);
    # the MC is policy-insensitive, so pin on the absolute gap
    assert abs(float(res.price) - dp2_g2.price) < 2.5e-4
    assert float(res.std_error) < 0.8 * float(res.raw_std_error)
    assert 0.0 < float(res.used_mean) <= 2.0


@pytest.mark.slow
def test_g2_auto_mc_reproduces_dp(analytic_market):
    dp = chooser.dp_oracle_chooser_cap_g2(CFG, G2, analytic_market, k=2,
                                          auto=True, **KW)
    res = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market,
                                       k=2, auto=True, n_paths=1 << 14,
                                       n_blocks=4, **KW)
    z = (float(res.price) - dp.price) / max(float(res.std_error), 1e-12)
    assert abs(z) < 4.0 or abs(float(res.price) - dp.price) < 2e-4


@pytest.mark.slow
def test_g2_chooser_dominates_auto_mc(analytic_market):
    kw = dict(k=2, n_paths=1 << 14, n_blocks=2, **KW)
    ch = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market, **kw)
    au = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market,
                                      auto=True, **kw)
    assert float(ch.price) > float(au.price)


@pytest.mark.slow
def test_g2_vega_matches_dp_fd(analytic_market):
    v = chooser.vega_chooser_cap_g2(CFG, G2, KEY, analytic_market, k=2,
                                    n_paths=1 << 14, n_blocks=2, **KW)
    assert abs(float(v.vega) - v.dp_vega) < 0.03 * abs(v.dp_vega) + 1e-3


@pytest.mark.slow
def test_g2_mesh_matches_single(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(k=2, n_paths=1 << 12, n_blocks=8, **KW)
    single = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market,
                                          **kw)
    shard = chooser.price_chooser_cap_g2(CFG, G2, KEY, analytic_market,
                                         mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.price) - float(shard.price)) < 1e-6


def test_rqmc_agrees_and_tightens(analytic_market, dp2):
    kw = dict(k=2, n_paths=1 << 12, n_blocks=8, **KW)
    rq = chooser.price_chooser_cap(CFG, KEY, analytic_market, rqmc=True,
                                   **kw)
    mc = chooser.price_chooser_cap(CFG, KEY, analytic_market, **kw)
    assert abs(float(rq.price) - dp2.price) \
        < 6 * float(rq.std_error) + 1e-5
    assert float(rq.std_error) < 0.5 * float(mc.std_error)
