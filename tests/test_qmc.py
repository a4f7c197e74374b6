"""RQMC tests: equidistribution of the Sobol points, unbiasedness against
the analytic price, and the variance-reduction claim vs plain MC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles
from hullwhite_tpu.ops import qmc
from hullwhite_tpu import pricing

CFG = tiny_config(n_paths=1 << 13, path_block=1 << 12)
KEY = jax.random.key(99)


def test_sobol_equidistribution():
    """First 2^k points hit every dyadic box exactly once (net property)."""
    n = 1 << 10
    pts = np.asarray(qmc.sobol2(n, jnp.zeros(2, jnp.uint32)))
    assert pts.shape == (n, 2)
    assert np.all((pts > 0) & (pts < 1))
    # 32x32 stratification: each cell gets exactly one point
    cells = (pts * 32).astype(int)
    idx = cells[:, 0] * 32 + cells[:, 1]
    counts = np.bincount(idx, minlength=1024)
    assert counts.max() == 1 and counts.min() == 1
    # 1-d projections: each of n bins hits exactly once
    for d in range(2):
        b = np.bincount((pts[:, d] * n).astype(int), minlength=n)
        assert b.max() == 1


def test_digital_shift_changes_points_preserves_marginals():
    s = jax.random.bits(KEY, (2,), jnp.uint32)
    p0 = np.asarray(qmc.sobol2(256, jnp.zeros(2, jnp.uint32)))
    p1 = np.asarray(qmc.sobol2(256, s))
    assert np.abs(p0 - p1).max() > 0.01
    assert abs(p1.mean() - 0.5) < 0.05


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_qmc_price_unbiased(analytic_market):
    res = qmc.price_zbc_qmc(CFG, KEY, analytic_market,
                            n_points=1 << 12, n_shifts=8)
    true = oracles.zbc_price(CFG, float(analytic_market.P[CFG.n_mat // 2]),
                             float(analytic_market.P[-1]))
    assert abs(float(res.value) - true) < 5 * float(res.std_error) + 5e-5, (
        float(res.value), true, float(res.std_error))


def test_qmc_beats_mc_variance(analytic_market):
    """RQMC SE at N points must be well below the MC SE at the same N."""
    n = 1 << 12
    res = qmc.price_zbc_qmc(CFG, KEY, analytic_market, n_points=n,
                            n_shifts=8)
    # MC standard error at 2n legs, estimated from the moments
    est = pricing.price_zbc(
        CFG.replace(n_paths=n, path_block=n), KEY, analytic_market,
        engine="exact")
    mc_se = float(jnp.sqrt(est.var_x / (2 * n)))
    # per-replicate QMC SE (std over shifts) vs MC SE at the same budget
    qmc_se_single = float(res.std_error) * np.sqrt(res.n_shifts)
    assert qmc_se_single < 0.35 * mc_se, (qmc_se_single, mc_se)


def test_qmc_vega(analytic_market):
    res = qmc.vega_zbc_qmc(CFG, KEY, analytic_market,
                           n_points=1 << 12, n_shifts=8)
    true = oracles.zbc_vega(CFG, float(analytic_market.P[CFG.n_mat // 2]),
                            float(analytic_market.P[-1]))
    assert abs(float(res.value) - true) < 5 * float(res.std_error) + 1e-3


def test_curve_qmc_unbiased_and_tighter():
    """PCA-ordered hybrid RQMC curve: unbiased vs analytic, and its
    per-replicate SE beats plain-MC SE at the same point budget."""
    from hullwhite_tpu import HWConfig
    from hullwhite_tpu.ops.qmc import bootstrap_curve_qmc

    cfg = HWConfig(n_paths=1 << 12, path_block=1 << 12)  # full 101-mat grid
    res = bootstrap_curve_qmc(cfg, KEY, n_points=1 << 12, n_shifts=8)
    P = np.asarray(res.market.P)
    se = np.asarray(res.std_error)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    true = np.array([oracles.bond_price(cfg, T) for T in Ts])
    assert P[0] == 1.0
    # unbiasedness: every maturity within 5 SE (+fp32 slack)
    assert np.all(np.abs(P[1:] - true[1:]) < 5 * se[1:] + 3e-5)
    # variance: per-replicate SE at T=10 well under the MC SE at 2*N legs
    mc_se = 0.07 * true[-1] / np.sqrt(2 * (1 << 12))
    assert float(se[-1]) * np.sqrt(8) < 0.5 * mc_se
