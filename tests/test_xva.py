"""XVA layer: closed-form exposure oracle vs split-domain quadrature vs
MC, PFE exceedance calibration, CVA + hazard delta, jvp/CRN-FD/oracle
vega agreement, sharding invariance, rqmc."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import xva, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(808)


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.mark.parametrize("payer", [False, True])
def test_oracle_matches_split_quadrature(market, payer):
    """Strike-root closed form == Gauss-Legendre over the paying side
    (independent integration route), to fp64 quadrature precision."""
    o = xva.exposure_oracle(CFG, market, payer=payer)
    for j, t in enumerate(o.dates):
        q = xva.ee_quadrature(CFG, market, t, payer=payer)
        assert abs(o.ee[j] - q) < 1e-14
        q48 = xva.ee_quadrature(CFG, market, t, payer=payer, n_quad=48)
        assert abs(q - q48) < 1e-14     # spectral: the kink is excluded


def test_first_date_is_a_swaption(market):
    """EE(T_0) is a European swaption expiring at the swap start —
    pinned against the continuous-law Jamshidian price (the discrete
    trapezoid law differs by the documented ~1e-5 discretization gap)."""
    from hullwhite_tpu.instruments import jamshidian_price, swap_fixed_leg

    o = xva.exposure_oracle(CFG, market, rate=0.02, tenor=4.0)
    sched = swap_fixed_leg(CFG, 0.02, 4.0)
    assert abs(o.ee[0] - jamshidian_price(CFG, market, sched, 1.0)) < 2e-5
    op = xva.exposure_oracle(CFG, market, rate=0.02, tenor=4.0, payer=True)
    assert abs(op.ee[0] - jamshidian_price(CFG, market, sched, 1.0,
                                           payer=True)) < 2e-5


@pytest.mark.parametrize("payer", [False, True])
def test_mc_matches_oracle(market, payer):
    o = xva.exposure_oracle(CFG, market, payer=payer)
    r = xva.price_exposure(CFG, KEY, market, payer=payer, n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)  # CV helps
    assert abs(float(r.hazard_delta) - o.hazard_delta) \
        < 0.01 * abs(o.hazard_delta)
    assert abs(float(r.profile.epe) - o.epe) < 5e-4


def test_pfe_exceedance_calibration(market):
    """The closed-form PFE level must be exceeded by ~(1 - q) of the
    sampled paths — the MC validates the monotone quantile map."""
    q = 0.95
    r = xva.price_exposure(CFG, KEY, market, quantile=q, n_blocks=4)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(q * (1 - q) / n) + 2e-3  # antithetic pairing
    exceed = np.asarray(r.profile.exceed)
    assert np.all(np.abs(exceed - (1 - q)) < tol)
    o = xva.exposure_oracle(CFG, market, quantile=q)
    assert np.allclose(np.asarray(r.profile.pfe), o.pfe, atol=1e-6)
    # PFE dominates EE (a quantile of the positive part vs its
    # discounted mean at these maturities)
    assert np.all(np.asarray(r.profile.pfe) > np.asarray(r.profile.ee))


def test_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_exposure(CFG, KEY, market, **kw)
    shard = xva.price_exposure(CFG, KEY, market, mesh=pmesh.path_mesh(),
                               **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)


def test_rqmc_runs_and_guards(market):
    with pytest.raises(ValueError):
        xva.price_exposure(CFG, KEY, market, rqmc=True, n_blocks=1)
    r = xva.price_exposure(CFG, KEY, market, rqmc=True, n_blocks=4,
                           n_paths=1 << 12)
    o = xva.exposure_oracle(CFG, market)
    assert np.isfinite(float(r.std_error))
    assert abs(float(r.cva) - o.cva) < 6.0 * float(r.std_error) + 1e-8


def test_vega_three_ways(market):
    v = xva.vega_cva(CFG, KEY, market, n_blocks=2)
    # jvp and CRN-FD differentiate the same kernel: tight agreement
    assert abs(float(v.vega) - float(v.fd_vega)) \
        < 1e-3 * abs(v.oracle_vega) + 1e-7
    # both sit on the fp64 closed-form FD within MC noise
    assert abs(float(v.vega) - v.oracle_vega) < 0.02 * abs(v.oracle_vega)


def test_hazard_and_recovery_scaling(market):
    """CVA scales linearly in LGD and the hazard delta is the actual
    derivative of the closed-form CVA in the hazard rate."""
    o = xva.exposure_oracle(CFG, market, recovery=0.4)
    o0 = xva.exposure_oracle(CFG, market, recovery=0.0)
    assert abs(o.cva - 0.6 * o0.cva) < 1e-15
    eps = 1e-6
    up = xva.exposure_oracle(CFG, market, hazard=0.02 + eps).cva
    dn = xva.exposure_oracle(CFG, market, hazard=0.02 - eps).cva
    assert abs(o.hazard_delta - (up - dn) / (2 * eps)) < 1e-8


# ---------------------------------------------------------------------------
# G2++ twin
# ---------------------------------------------------------------------------

from hullwhite_tpu.models import g2pp  # noqa: E402

G2 = g2pp.G2Params()


def test_g2_first_date_is_the_g2_swaption(market):
    """EE(T_0) must reproduce swaption_g2_analytic exactly (same
    decomposition, same quadrature) — a code-path identity."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    o = xva.exposure_oracle_g2(CFG, G2, market)
    sched = swap_fixed_leg(CFG, 0.02, 4.0)
    assert abs(o.ee[0] - g2pp.swaption_g2_analytic(CFG, G2, market,
                                                   sched, 1.0)) < 1e-14
    op = xva.exposure_oracle_g2(CFG, G2, market, payer=True)
    assert abs(op.ee[0] - g2pp.swaption_g2_analytic(
        CFG, G2, market, sched, 1.0, payer=True)) < 1e-14


@pytest.mark.parametrize("payer", [False, True])
def test_g2_mc_matches_oracle(market, payer):
    o = xva.exposure_oracle_g2(CFG, G2, market, payer=payer)
    r = xva.price_exposure_g2(CFG, G2, KEY, market, payer=payer,
                              n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)


def test_g2_pfe_exceedance(market):
    """The bisected conditional-CDF PFE level must be exceeded by
    ~(1 - q) of the sampled paths."""
    r = xva.price_exposure_g2(CFG, G2, KEY, market, n_blocks=4)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


def test_g2_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_exposure_g2(CFG, G2, KEY, market, **kw)
    shard = xva.price_exposure_g2(CFG, G2, KEY, market,
                                  mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)


def test_g2_vega_matches_oracle(market):
    v = xva.vega_cva_g2(CFG, G2, KEY, market, n_blocks=2)
    assert abs(float(v.vega) - v.oracle_vega) < 0.05 * abs(v.oracle_vega)
