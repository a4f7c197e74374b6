"""Credit curve layer: CDS bootstrap roundtrip, survival dispatch, and
term-structure hazards flowing through the XVA weight builders."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import credit, xva, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(321)
QUOTES = ((1.0, 0.006), (3.0, 0.009), (5.0, 0.013), (7.0, 0.011))


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def curve(market):
    return credit.bootstrap_cds(credit.market_df(CFG, market), QUOTES)


def test_bootstrap_roundtrip(market, curve):
    """par_spread of the bootstrapped curve reproduces every quote to
    root-solver precision."""
    df = credit.market_df(CFG, market)
    for mat, spr in QUOTES:
        assert abs(credit.par_spread(df, curve, mat) - spr) < 1e-12
    # hazards positive; the inverted 5y->7y quote gives a LOWER forward
    # hazard in the last bucket (term-structure shape preserved)
    assert all(h > 0 for h in curve.hazards)
    assert curve.hazards[3] < curve.hazards[2]


def test_credit_triangle(market, curve):
    """h ~ s / (1 - R) within the accrual correction (the credit
    triangle), bucket by bucket not just on average."""
    for h, (mat, spr) in zip(curve.hazards[:1], QUOTES[:1]):
        assert abs(h - spr / (1.0 - curve.recovery)) < 0.1 * h


def test_survival_dispatch_flat_equivalence():
    """A one-bucket curve extending flat equals the float path
    exactly."""
    c = credit.CreditCurve(knots=(1.0,), hazards=(0.02,))
    for t in (0.0, 0.5, 1.0, 4.7, 9.0):
        assert abs(credit.survival(c, t)
                   - credit.survival(0.02, t)) < 2e-16   # one ulp
    assert abs(credit.cum_hazard(c, 9.0) - 0.18) < 1e-15


LEGS = ((0.02, 4.0, False), (0.012, 3.0, True), (0.03, 2.0, False))


def test_flat_curve_matches_flat_float(market):
    """Every weight builder gives IDENTICAL results for a flat curve
    and the equivalent float — oracle and MC paths both."""
    c = credit.CreditCurve(knots=(50.0,), hazards=(0.02,))
    of = xva.netting_oracle(CFG, market, LEGS, hazard=0.02)
    oc = xva.netting_oracle(CFG, market, LEGS, hazard=c)
    assert abs(of.cva - oc.cva) < 1e-15
    rf = xva.price_netting(CFG, KEY, market, LEGS, hazard=0.02,
                           n_paths=1 << 12)
    rc = xva.price_netting(CFG, KEY, market, LEGS, hazard=c,
                           n_paths=1 << 12)
    assert abs(float(rf.cva) - float(rc.cva)) < 1e-12
    bf = xva.bilateral_oracle(CFG, market, LEGS, hazard=0.02,
                              hazard_own=0.01)
    bc = xva.bilateral_oracle(CFG, market, LEGS, hazard=c,
                              hazard_own=0.01)
    assert abs(bf.bcva - bc.bcva) < 1e-16
    kf = xva.kva_oracle(CFG, market, LEGS, hazard=0.02)
    kc = xva.kva_oracle(CFG, market, LEGS, hazard=c)
    assert abs(kf.kva - kc.kva) < 1e-16


def test_netting_mc_matches_oracle_under_curve(market, curve):
    """Term-structure pd weights flow through the netted CVA: MC vs
    oracle within 5 SE, and the curve CVA differs from the flat one
    (the weights really moved)."""
    o = xva.netting_oracle(CFG, market, LEGS, hazard=curve)
    r = xva.price_netting(CFG, KEY, market, LEGS, hazard=curve,
                          n_blocks=4)
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    of = xva.netting_oracle(CFG, market, LEGS, hazard=0.02)
    assert abs(o.cva - of.cva) > 1e-5


@pytest.mark.slow
def test_exposure_and_bermudan_accept_curves(market, curve):
    """The single-swap exposure pricer and the Bermudan exposure layer
    take curves end to end."""
    o = xva.exposure_oracle(CFG, market, hazard=curve)
    r = xva.price_exposure(CFG, KEY, market, hazard=curve, n_blocks=2)
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    from hullwhite_tpu.instruments import swap_fixed_leg

    sched = swap_fixed_leg(CFG, 0.025, 4.0)
    rb, ob = xva.price_bermudan_xva(CFG, KEY, market, sched,
                                    (5.0, 6.0, 7.0), hazard=curve,
                                    n_blocks=2)
    assert abs(float(rb.cva) - ob.cva) < 5.0 * float(rb.std_error) + 1e-9


def test_mva_kva_curve_weights(market, curve):
    """MVA/KVA survival weights under a curve: MC equals its own oracle
    (static weights -> the identity carries over)."""
    legs = ((0.02, 2.0, True), (0.0, 4.0, False))
    om = xva.mva_oracle(CFG, market, legs, hazard=curve)
    rm = xva.price_mva(CFG, KEY, market, legs, hazard=curve,
                       n_blocks=2)
    assert abs(float(rm.mva) - om.mva) \
        < 5.0 * float(rm.std_error) + 1e-9
    ok = xva.kva_oracle(CFG, market, legs, hazard=curve)
    rk = xva.price_kva(CFG, KEY, market, legs, hazard=curve, n_blocks=2)
    assert abs(float(rk.kva) - ok.kva) \
        < 5.0 * float(rk.std_error) + 1e-9


def test_cs01_oracle_is_exact_recompute(market, curve):
    """The re-dot CS01 equals the brute recompute (bootstrap with the
    bumped quote, full netting_oracle) EXACTLY — the EE profile is
    hazard-independent, so the two routes are the same fp64 sum."""
    df = credit.market_df(CFG, market)
    r = xva.cva_cs01(CFG, KEY, market, LEGS, quotes=QUOTES,
                     n_paths=1 << 12)
    for k, (mat, spr) in enumerate(QUOTES):
        q2 = [(m, s + (1e-4 if i == k else 0.0))
              for i, (m, s) in enumerate(QUOTES)]
        c2 = credit.bootstrap_cds(df, q2)
        brute = (xva.netting_oracle(CFG, market, LEGS, hazard=c2).cva
                 - r.cva)
        assert abs(r.deltas[k] - brute) < 1e-15


def test_cs01_mc_matches_oracle(market):
    r = xva.cva_cs01(CFG, KEY, market, LEGS, quotes=QUOTES, n_blocks=4)
    assert abs(float(r.cva_mc) - r.cva) < 5.0 * float(r.cva_se) + 1e-9
    for k in range(len(QUOTES)):
        assert abs(r.deltas_mc[k] - r.deltas[k]) \
            < 5.0 * r.delta_bounds[k] + 1e-12
    # a parallel 1bp bump raises the default leg: the bucket deltas
    # sum to a positive total for this positive-EE book
    assert sum(r.deltas) > 0.0
    # the exposure window (5-8y) sits beyond the early knots: bumping
    # the 1y/3y spreads front-loads default probability BEFORE the
    # window (negative delta), while the 5y/7y quotes — whose hazards
    # cover the window and its flat extrapolation — carry the risk
    assert r.deltas[0] < 0.0 and r.deltas[1] < 0.0
    assert r.deltas[2] > 0.0 and r.deltas[3] > 0.0
    assert r.deltas[3] == max(r.deltas)
