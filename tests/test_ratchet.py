"""Ratchet cap: GH-outer/closed-inner fp64 oracle vs the Rao-Blackwell
MC, always-ITM closed-form pin, sharding invariance, CRN-FD vega."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import ratchet, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(501)


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_oracle_gh_convergence(market):
    t96, per = ratchet.ratchet_cap_quadrature(CFG, market, spread=0.0)
    t48, _ = ratchet.ratchet_cap_quadrature(CFG, market, spread=0.0,
                                            n_quad=48)
    assert len(per) == 4 and all(v > 0 for v in per)
    # the outer integrand is smooth (the kink is integrated out in
    # closed form), so GH converges spectrally here
    assert abs(t96 - t48) < 1e-12


def test_oracle_always_itm_pin(market):
    """With a deeply negative spread the positive part never binds and
    the leg is a difference of closed-form tilted lognormal means —
    checked from first principles off the shock-shape dot products."""
    from hullwhite_tpu.bermudan import _det_states
    from hullwhite_tpu.floater import _libor_terms

    spread = -0.5
    tot, _ = ratchet.ratchet_cap_quadrature(CFG, market, spread=spread,
                                            strike0=-0.45)
    n, tau, delta = 4, 1.0, 1.0
    start = CFG.s1
    fixes, pays = ratchet._ratchet_dates(start, n, tau)
    var_r, var_I, cov_rI, cov_ab, cov_aI = ratchet._ratchet_stats(
        CFG, start, n, tau)
    tables = hw.step_tables(CFG, CFG.sigma, CFG.sigma, jnp.float32)
    sig2 = float(tables.sig_st) ** 2
    dates = tuple(sorted(set(fixes) | set(pays)))
    idx = {t: q for q, t in enumerate(dates)}
    r_det, i_det = (np.asarray(a, np.float64)
                    for a in _det_states(CFG, tables, dates))
    terms = [tuple(float(np.asarray(v, np.float64)) for v in _libor_terms(
        CFG, jnp.float32(CFG.sigma), market, t, delta)) for t in fixes]

    def F(j_fix, j_pay, cov_fix_pay):
        lnA, B = terms[j_fix]
        m = r_det[idx[fixes[j_fix]]] - sig2 * cov_fix_pay
        return (math.exp(B * m - lnA
                         + 0.5 * B * B * sig2 * var_r[j_fix]) - 1.0) / delta

    ref = 0.0
    for j in range(n):
        w0 = math.exp(-i_det[idx[pays[j]]] + 0.5 * sig2 * var_I[j])
        if j == 0:
            ref += tau * w0 * (F(0, 0, cov_rI[0]) - (-0.45))
        else:
            ref += tau * w0 * (F(j, j, cov_rI[j]) - F(j - 1, j, cov_aI[j])
                               - spread)
    assert abs(tot - ref) < 1e-10


def test_mc_matches_oracle(market):
    tot, _ = ratchet.ratchet_cap_quadrature(CFG, market, spread=0.0)
    res = ratchet.price_ratchet_cap(CFG, KEY, market, spread=0.0,
                                    n_paths=1 << 14, n_blocks=4)
    z = (float(res.price) - tot) / max(float(res.std_error), 1e-12)
    assert abs(z) < 4.0 or abs(float(res.price) - tot) < 2e-4
    # the Rao-Blackwell estimator must beat the raw kinked payoff
    assert float(res.std_error) < 0.75 * float(res.raw_std_error)
    # raw (kinked-payoff) estimator agrees with the oracle too
    zr = (float(res.raw_price) - tot) / max(float(res.raw_std_error),
                                            1e-12)
    assert abs(zr) < 4.0
    # per-period values line up with the oracle's
    _, per = ratchet.ratchet_cap_quadrature(CFG, market, spread=0.0)
    assert np.allclose(np.asarray(res.periods), per, atol=3e-4)


def test_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(spread=0.005, n_paths=1 << 12, n_blocks=8)
    single = ratchet.price_ratchet_cap(CFG, KEY, market, **kw)
    mesh = pmesh.path_mesh()
    shard = ratchet.price_ratchet_cap(CFG, KEY, market, mesh=mesh, **kw)
    assert abs(float(single.price) - float(shard.price)) < 1e-6


def test_vega_crn_matches_oracle_fd(market):
    v = ratchet.vega_ratchet_cap(CFG, KEY, market, spread=0.0,
                                 n_paths=1 << 14, n_blocks=4)
    # CRN collapses the FD noise; the Rao-Blackwell value is smooth in
    # sigma, so the MC vega sits on the fp64 quadrature FD
    assert abs(float(v.vega) - v.oracle_vega) < 0.02 * abs(v.oracle_vega)


# --- G2++ twin ---------------------------------------------------------

from hullwhite_tpu.models.g2pp import G2Params

G2 = G2Params()


def test_g2_oracle_gh_convergence(market):
    t96, per = ratchet.ratchet_cap_quadrature_g2(CFG, G2, market,
                                                 spread=0.0)
    t48, _ = ratchet.ratchet_cap_quadrature_g2(CFG, G2, market,
                                               spread=0.0, n_quad=48)
    assert len(per) == 4 and all(v > 0 for v in per)
    assert abs(t96 - t48) < 1e-12


def test_g2_mc_matches_oracle(market):
    tot, per = ratchet.ratchet_cap_quadrature_g2(CFG, G2, market,
                                                 spread=0.0)
    res = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market, spread=0.0,
                                       n_paths=1 << 14, n_blocks=4)
    z = (float(res.price) - tot) / max(float(res.std_error), 1e-12)
    assert abs(z) < 4.0 or abs(float(res.price) - tot) < 2e-4
    assert float(res.std_error) < 0.75 * float(res.raw_std_error)
    zr = (float(res.raw_price) - tot) / max(float(res.raw_std_error),
                                            1e-12)
    assert abs(zr) < 4.0
    assert np.allclose(np.asarray(res.periods), per, atol=3e-4)


def test_g2_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(spread=0.002, n_paths=1 << 12, n_blocks=8)
    single = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market, **kw)
    shard = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market,
                                         mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.price) - float(shard.price)) < 1e-6


def test_g2_vega_crn_matches_oracle_fd(market):
    v = ratchet.vega_ratchet_cap_g2(CFG, G2, KEY, market, spread=0.0,
                                    n_paths=1 << 14, n_blocks=2)
    assert abs(float(v.vega) - v.oracle_vega) < 0.02 * abs(v.oracle_vega)


# --- RQMC (the Rao-Blackwell payoff is smooth: ideal Sobol regime) ----


def test_rqmc_collapses_se(market):
    q, _ = ratchet.ratchet_cap_quadrature(CFG, market, spread=0.0)
    kw = dict(spread=0.0, n_paths=1 << 12, n_blocks=8)
    rq = ratchet.price_ratchet_cap(CFG, KEY, market, rqmc=True, **kw)
    mc = ratchet.price_ratchet_cap(CFG, KEY, market, **kw)
    assert abs(float(rq.price) - q) < 6 * float(rq.std_error) + 2e-6
    # the smooth RB integrand gives RQMC an order of magnitude, not
    # a constant factor (measured ~50-60x at 2^12 x 16)
    assert float(rq.std_error) < 0.1 * float(mc.std_error)
    with pytest.raises(ValueError):
        ratchet.price_ratchet_cap(CFG, KEY, market, rqmc=True,
                                  n_blocks=1)


@pytest.mark.slow
def test_g2_rqmc_collapses_se(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    q, _ = ratchet.ratchet_cap_quadrature_g2(CFG, G2, market, spread=0.0)
    kw = dict(spread=0.0, n_paths=1 << 12, n_blocks=8)
    rq = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market, rqmc=True,
                                      **kw)
    mc = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market, **kw)
    assert abs(float(rq.price) - q) < 6 * float(rq.std_error) + 2e-6
    assert float(rq.std_error) < 0.1 * float(mc.std_error)
    # blocks key on the GLOBAL index: sharded RQMC == single-device
    r8 = ratchet.price_ratchet_cap_g2(CFG, G2, KEY, market, rqmc=True,
                                      mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r8.price) - float(rq.price)) < 1e-6
