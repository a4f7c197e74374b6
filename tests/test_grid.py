"""Strike/maturity option-grid tests: each grid cell must agree with the
single-option pricer and the analytic surface."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import grid, pricing
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(21)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_grid_matches_single_option(analytic_market):
    """The (cfg.strike, cfg.s2) cell must reproduce price_zbc on the same
    key (same engine, same draws)."""
    g = grid.price_zbc_grid(CFG, KEY, analytic_market,
                            strikes=[CFG.strike, 0.95],
                            maturities=[8.0, CFG.s2])
    single = pricing.price_zbc(CFG, KEY, analytic_market, engine="exact")
    assert abs(float(g.price[0, 1]) - float(single.price)) < 2e-6
    assert abs(float(g.beta[0, 1]) - float(single.beta)) < 1e-3


def test_grid_against_analytic_surface(analytic_market):
    Ks = [0.88, CFG.strike, 0.93]
    S2s = [7.0, 8.5, CFG.s2]
    g = grid.price_zbc_grid(CFG, KEY, analytic_market, Ks, S2s)
    P = np.asarray(analytic_market.P)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    for i, K in enumerate(Ks):
        for j, S2 in enumerate(S2s):
            cfg_ij = CFG.replace(strike=K, s2=S2)
            P_s1 = float(np.interp(CFG.s1, Ts, P))
            P_s2 = float(np.interp(S2, Ts, P))
            true = oracles.zbc_price(cfg_ij, P_s1, P_s2)
            se = max(float(g.std_error_raw[i, j]), 1e-6)
            assert abs(float(g.price[i, j]) - true) < 6 * se + 2e-4, (
                K, S2, float(g.price[i, j]), true)


def test_grid_monotonicity(analytic_market):
    """Prices decrease in strike and the surface is positive."""
    Ks = [0.85, 0.90, 0.95]
    g = grid.price_zbc_grid(CFG, KEY, analytic_market, Ks, [8.0, 10.0])
    p = np.asarray(g.price)
    assert np.all(p >= 0)
    assert np.all(np.diff(p, axis=0) < 0)


def test_grid_sharded(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    cfg = tiny_config(n_paths=1 << 14, path_block=1 << 11)
    mesh = pmesh.path_mesh()
    g1 = grid.price_zbc_grid(cfg, KEY, analytic_market, [0.9], [10.0])
    g8 = grid.price_zbc_grid(cfg, KEY, analytic_market, [0.9], [10.0],
                             mesh=mesh)
    assert abs(float(g1.price[0, 0]) - float(g8.price[0, 0])) < 1e-6


def test_grid_vega_matches_analytic(analytic_market):
    from hullwhite_tpu.grid import vega_zbc_grid

    Ks = [0.88, CFG.strike]
    S2s = [8.0, CFG.s2]
    prices, vegas = vega_zbc_grid(CFG, KEY, analytic_market, Ks, S2s)
    P = np.asarray(analytic_market.P)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    for i, K in enumerate(Ks):
        for j, S2 in enumerate(S2s):
            cfg_ij = CFG.replace(strike=K, s2=S2)
            true = oracles.zbc_vega(cfg_ij, float(np.interp(CFG.s1, Ts, P)),
                                    float(np.interp(S2, Ts, P)))
            got = float(vegas[i, j])
            assert abs(got - true) < 0.06 * abs(true) + 5e-3, (K, S2, got, true)


def test_grid_vega_cell_matches_single_jvp(analytic_market):
    """The (cfg.strike, cfg.s2) cell of the vega surface must equal the
    single-option AD vega on the same key (same draws, antithetic)."""
    from hullwhite_tpu import greeks
    from hullwhite_tpu.grid import vega_zbc_grid

    _, vegas = vega_zbc_grid(CFG, KEY, analytic_market,
                             [CFG.strike], [CFG.s2])
    # note: greeks.jvp_vega uses the linear engine; grid uses exact ->
    # different draws, so compare statistically (both ~0.23 +- MC noise)
    _, v_single = greeks.jvp_vega(CFG, KEY, analytic_market, antithetic=True)
    assert abs(float(vegas[0, 0]) - float(v_single)) < 0.03
