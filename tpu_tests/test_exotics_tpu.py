"""Exotic layer on the real chip: CMS spread, range accrual and the
puttable note priced on TPU against their fp64 oracles (the CPU suite
already pins these; this lane catches TPU-only compile/precision
regressions — cf. the documented fp32 exp/Phi ulp floor)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pytest

if jax.devices()[0].platform == "cpu":
    pytest.skip("requires TPU hardware", allow_module_level=True)

import jax.numpy as jnp

from hullwhite_tpu import instruments, range_note, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 15, path_block=1 << 13, n_steps=1000)
KEY = jax.random.key(21)


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


def test_cms_spread_on_tpu(market):
    kw = dict(strike=0.002, tenor=2.0, long_tenor=4.0, short_tenor=1.0)
    res = instruments.price_cms_spread(CFG, KEY, market, n_blocks=2, **kw)
    orc, _ = instruments.cms_spread_quadrature(CFG, market, **kw)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 1e-5, (
        float(res.price), orc)


def test_range_accrual_on_tpu(market):
    kw = dict(coupon=0.03, lo=0.01, hi=0.022, tenor=3.0, obs_per_period=5)
    res = instruments.price_range_accrual(CFG, KEY, market, n_blocks=2, **kw)
    orc, _ = instruments.range_accrual_closed_form(CFG, market, **kw)
    assert abs(float(res.price) - orc) < 5 * float(res.std_error) + 1e-5, (
        float(res.price), orc)


def test_range_note_on_tpu(market):
    """DP (host fp64) + MC policy run on chip; allow the documented
    ~e-6-scale TPU fp32 exp ulp floor on top of MC noise."""
    kw = dict(coupon=0.03, lo=0.01, hi=0.022, tenor=3.0, obs_per_period=5)
    dp = range_note.dp_oracle_range_note(CFG, market, **kw)
    res = range_note.price_range_note(CFG, KEY, market, n_blocks=2,
                                      boundaries=dp.boundaries, **kw)
    assert abs(float(res.price) - dp.price) < 5 * float(res.std_error) + 1e-5
    assert float(res.std_error) < float(res.raw_std_error)
