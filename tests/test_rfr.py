"""Backward-looking RFR caplet/floorlet family vs exact fp64 oracles.

The compounded style is the e^{-I} ZBC payoff family generalized to two
integral dates (reference anchor: /root/reference/src/2_option_pricing.cu
:14-35); the averaged style adds the arithmetic short-rate average.  All
oracles are closed form (Black / Bachelier after the Gaussian tilt), so
the MC gates are straight z-tests like the reference's analytic ZBC gate
(2_option_pricing.cu:498-516)."""

import jax
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import pricing, rfr
from hullwhite_tpu.models.g2pp import G2Params
from hullwhite_tpu.parallel import mesh as pmesh

CFG = tiny_config(n_paths=1 << 13)
KEY = jax.random.key(11)
K = 0.02
DATES = dict(start=5.0, end=6.0, n_obs=10)


@pytest.fixture(scope="module")
def market():
    return pricing.bootstrap_curve(CFG, jax.random.key(0))


@pytest.mark.parametrize("style", ["compounded", "averaged"])
@pytest.mark.parametrize("floor", [False, True])
def test_hw_vs_oracle(market, style, floor):
    res = rfr.price_rfr_caplet(CFG, KEY, market, strike=K, style=style,
                               floor=floor, n_blocks=4, **DATES)
    orc = rfr.rfr_caplet_closed_form(CFG, strike=K, style=style,
                                     floor=floor, **DATES)
    z = (float(res.price) - orc) / float(res.std_error)
    assert abs(z) < 4.0, (float(res.price), orc, z)
    assert float(res.std_error) < 2e-4


@pytest.mark.parametrize("style", ["compounded", "averaged"])
@pytest.mark.parametrize("floor", [False, True])
def test_g2_vs_oracle(market, style, floor):
    g = G2Params()
    res = rfr.price_rfr_caplet_g2(CFG, g, KEY, market, strike=K,
                                  style=style, floor=floor, n_blocks=4,
                                  **DATES)
    orc = rfr.rfr_caplet_closed_form_g2(CFG, g, market, strike=K,
                                        style=style, floor=floor, **DATES)
    z = (float(res.price) - orc) / float(res.std_error)
    assert abs(z) < 4.0, (float(res.price), orc, z)


def test_cap_floor_parity_closed_form():
    """cap - floor = P_s - Kb P_e (compounded) — the oracle must satisfy
    the model-bond parity to fp64 precision."""
    import math

    from hullwhite_tpu.bermudan import _det_affine, _step_index

    cap = rfr.rfr_caplet_closed_form(CFG, strike=K, **DATES)
    flo = rfr.rfr_caplet_closed_form(CFG, strike=K, floor=True, **DATES)
    rA, rB, iA, iB = _det_affine(CFG)
    C = rfr._cov_np(CFG, (("I", 5.0), ("I", 6.0)))
    from hullwhite_tpu.models import hull_white as hw
    import jax.numpy as jnp

    sig = float(hw.step_tables(CFG, CFG.sigma, CFG.sigma,
                               jnp.float32).sig_st)
    P_s = math.exp(-iA[_step_index(CFG, 5.0) - 1]
                   + 0.5 * sig * sig * C[0, 0])
    P_e = math.exp(-iA[_step_index(CFG, 6.0) - 1]
                   + 0.5 * sig * sig * C[1, 1])
    kb = 1.0 + (6.0 - 5.0) * K
    assert abs((cap - flo) - (P_s - kb * P_e)) < 1e-12


def test_cap_floor_parity_g2(market):
    """G2++ compounded parity: cap - floor = P_s - Kb P_e off the market
    curve (market-consistent discounting)."""
    g = G2Params()
    cap = rfr.rfr_caplet_closed_form_g2(CFG, g, market, strike=K, **DATES)
    flo = rfr.rfr_caplet_closed_form_g2(CFG, g, market, strike=K,
                                        floor=True, **DATES)
    Ts = np.linspace(0.0, CFG.t_final, CFG.n_mat)
    P0 = np.asarray(market.P, np.float64)
    kb = 1.0 + K
    expect = np.interp(5.0, Ts, P0) - kb * np.interp(6.0, Ts, P0)
    assert abs((cap - flo) - expect) < 1e-12


def test_mc_parity_antithetic(market):
    """Under one key, MC(cap) - MC(floor) estimates the linear forward
    payoff — a much tighter quantity than either leg."""
    import math

    res_c = rfr.price_rfr_caplet(CFG, KEY, market, strike=K, n_blocks=4,
                                 **DATES)
    res_f = rfr.price_rfr_caplet(CFG, KEY, market, strike=K, floor=True,
                                 n_blocks=4, **DATES)
    cap = rfr.rfr_caplet_closed_form(CFG, strike=K, **DATES)
    flo = rfr.rfr_caplet_closed_form(CFG, strike=K, floor=True, **DATES)
    mc_diff = float(res_c.price) - float(res_f.price)
    assert abs(mc_diff - (cap - flo)) < 5e-4


@pytest.mark.slow
def test_sharded_matches_single(market):
    cfg = tiny_config(n_paths=1 << 11)
    mesh = pmesh.path_mesh()
    for style in ("compounded", "averaged"):
        r1 = rfr.price_rfr_caplet(cfg, KEY, market, strike=K, style=style,
                                  n_blocks=8, **DATES)
        r8 = rfr.price_rfr_caplet(cfg, KEY, market, strike=K, style=style,
                                  n_blocks=8, mesh=mesh, **DATES)
        assert abs(float(r1.price) - float(r8.price)) < 1e-6
        g = G2Params()
        g1 = rfr.price_rfr_caplet_g2(cfg, g, KEY, market, strike=K,
                                     style=style, n_blocks=8, **DATES)
        g8 = rfr.price_rfr_caplet_g2(cfg, g, KEY, market, strike=K,
                                     style=style, n_blocks=8, mesh=mesh,
                                     **DATES)
        assert abs(float(g1.price) - float(g8.price)) < 1e-6


def test_vega_jvp_vs_oracle_fd(market):
    """One-jvp vega through the sigma-scalar form vs oracle central FD."""
    _, v = rfr.vega_rfr_caplet(CFG, KEY, strike=K, n_blocks=4, **DATES)
    eps = 1e-4
    fd = (rfr.rfr_caplet_closed_form(CFG, strike=K, sigma=CFG.sigma + eps,
                                     **DATES)
          - rfr.rfr_caplet_closed_form(CFG, strike=K,
                                       sigma=CFG.sigma - eps, **DATES)
          ) / (2 * eps)
    assert abs(float(v) - fd) / abs(fd) < 5e-3


def test_vega_caplet_default_is_single_period():
    """With end omitted, vega_rfr_caplet must price the same SINGLE
    period [s1, s1 + decade] as price_rfr_caplet — not vega_rfr_cap's
    multi-period strip default (round-3 advisor finding)."""
    cfg = tiny_config(n_mat=41, n_steps=200, n_paths=1 << 12)
    p1, v1 = rfr.vega_rfr_caplet(cfg, KEY, strike=K, n_blocks=2)
    end = cfg.s1 + 10 * cfg.mat_spacing
    p2, v2 = rfr.vega_rfr_cap(cfg, KEY, strike=K, end=end, n_blocks=2)
    assert float(p1) == float(p2) and float(v1) == float(v2)
    ps, _ = rfr.vega_rfr_cap(cfg, KEY, strike=K, n_blocks=2)
    assert float(ps) != float(p1)  # the strip is a different instrument


def test_averaged_converges_to_compounded_limit():
    """As K -> deep ITM both styles converge to the discounted forward
    of their own rate; sanity-pin ATM levels are within ~20% of each
    other (the average sits below the compound by convexity/timing)."""
    cap_c = rfr.rfr_caplet_closed_form(CFG, strike=0.0, **DATES)
    cap_a = rfr.rfr_caplet_closed_form(CFG, strike=0.0, style="averaged",
                                       **DATES)
    assert cap_c > 0 and cap_a > 0
    assert abs(cap_c - cap_a) / cap_c < 0.25


def test_grid_validation():
    with pytest.raises(ValueError):
        rfr.price_rfr_caplet(CFG, KEY, strike=K, start=5.03, end=6.0)
    with pytest.raises(ValueError):
        rfr.price_rfr_caplet(CFG, KEY, strike=K, start=5.0, end=6.0,
                             style="averaged", n_obs=7)
    with pytest.raises(ValueError):
        rfr.price_rfr_caplet(CFG, KEY, strike=K, start=6.0, end=5.0)
    with pytest.raises(ValueError):
        rfr.price_rfr_caplet(CFG, KEY, strike=K, style="geometric")


def test_cap_strip_vs_oracle(market):
    """3-period strip, both styles, HW + G2: MC z-gate vs the per-period
    closed-form sum; per-caplet MC rows match their own oracles."""
    res = rfr.price_rfr_cap(CFG, KEY, market, strike=K, start=5.0,
                            tenor=3.0, freq=1.0, n_obs=5, n_blocks=4,
                            style="averaged")
    tot, per = rfr.rfr_cap_closed_form(CFG, strike=K, start=5.0,
                                       tenor=3.0, freq=1.0, n_obs=5,
                                       style="averaged")
    z = (float(res.price) - tot) / float(res.std_error)
    assert abs(z) < 4.0
    assert res.caplets.shape == (3,)
    for j in range(3):
        assert abs(float(res.caplets[j]) - per[j]) < 6 * float(
            res.std_error)
    g = G2Params()
    gres = rfr.price_rfr_cap_g2(CFG, g, KEY, market, strike=K, start=5.0,
                                tenor=3.0, freq=1.0, n_blocks=4)
    gtot, _ = rfr.rfr_cap_closed_form_g2(CFG, g, market, strike=K,
                                         start=5.0, tenor=3.0, freq=1.0)
    gz = (float(gres.price) - gtot) / float(gres.std_error)
    assert abs(gz) < 4.0


def test_rqmc_tightens_se(market):
    """Digitally-shifted Sobol through the joint Cholesky: the RQMC SE
    must beat iid MC at equal path count (smooth-ish payoff, small
    dimension) and stay unbiased (z-gate vs the oracle)."""
    kw = dict(strike=K, start=5.0, tenor=3.0, freq=1.0, n_blocks=8,
              n_paths=1 << 9)
    mc = rfr.price_rfr_cap(CFG, KEY, market, **kw)
    qm = rfr.price_rfr_cap(CFG, KEY, market, rqmc=True, **kw)
    tot, _ = rfr.rfr_cap_closed_form(CFG, strike=K, start=5.0, tenor=3.0,
                                     freq=1.0)
    assert abs(float(qm.price) - tot) / max(float(qm.std_error),
                                            1e-9) < 5.0
    assert float(qm.std_error) < float(mc.std_error)
    with pytest.raises(ValueError):
        rfr.price_rfr_cap(CFG, KEY, market, strike=K, rqmc=True,
                          n_blocks=1)
