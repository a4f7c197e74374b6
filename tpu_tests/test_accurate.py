"""On-chip accuracy of the software transcendentals and the Bermudan
bracket floor removal (round-5, VERDICT r4 #3).

Measured context: the native TPU fp32 exp is up to 40 ulp wrong with a
-8.4e-7 mean relative bias; composed through the bracket estimators and
the prep-time bond-term coefficients it produced the documented -2e-6
on-chip floor (and a common -8.5e-7 platform shift of estimator AND
oracle).  With ops/accurate.exp32 on the Bermudan eval paths and the
_bond_value_terms prep, the TPU bracket matches the CPU fp32 twin to
~1.5e-8 and the fp64 DP oracle to ~3e-7 — no quote padding."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pytest

if jax.devices()[0].platform == "cpu":
    pytest.skip("requires TPU hardware", allow_module_level=True)

import jax.numpy as jnp

from hullwhite_tpu import HWConfig, bermudan
from hullwhite_tpu.instruments import swap_fixed_leg
from hullwhite_tpu.models import hull_white as hw, oracles
from hullwhite_tpu.ops.accurate import exp32, npdf


def test_exp32_on_chip_accuracy():
    """exp32 must be ~1 ulp and unbiased ON THE CHIP (the native exp
    measured 40 ulp / -8.4e-7 mean bias over this range)."""
    x = np.random.default_rng(1).uniform(-12, 6, 8192).astype(np.float32)
    e = np.asarray(jax.jit(exp32)(jnp.asarray(x))).astype(np.float64)
    ref = np.exp(x.astype(np.float64))
    rel = (e - ref) / ref
    assert np.abs(rel).max() < 3e-7, np.abs(rel).max()   # ~2.5 ulp cap
    assert abs(rel.mean()) < 2e-8, rel.mean()            # unbiased


def test_npdf_on_chip_accuracy():
    x = np.random.default_rng(2).uniform(-8, 8, 8192).astype(np.float32)
    p = np.asarray(jax.jit(npdf)(jnp.asarray(x))).astype(np.float64)
    ref = np.exp(-0.5 * x.astype(np.float64) ** 2) / np.sqrt(2 * np.pi)
    assert np.abs(p - ref).max() < 2e-7


def test_hw_bracket_floor_removed_on_chip():
    """The on-chip HW Bermudan bracket sits within 1e-6 of the fp64 DP
    oracle on BOTH sides with no device allowance (round-4 state: both
    sides -2e-6 below, quoted +3e-6).  Measured at this seed/config:
    lower gap -3.1e-7, upper gap -1.3e-7, and TPU == CPU fp32 to
    1.5e-8."""
    cfg = HWConfig(path_block=1 << 16)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f = oracles.forward_rate(cfg, Ts)
    market = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(f, jnp.float32))
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0 + j for j in range(5)]
    res = bermudan.price_bermudan(cfg, jax.random.key(cfg.seed), market,
                                  sched, ex, n_paths=1 << 17, n_blocks=8)
    orc = bermudan.dp_oracle(cfg, market, sched, ex, n_grid=6001)
    lo, up = float(res.price_cv), float(res.upper)
    assert abs(lo - orc) < 1e-6, (lo, orc, lo - orc)
    assert abs(up - orc) < 1e-6, (up, orc, up - orc)
    # bracket still ordered up to its own SE
    assert lo <= up + 3 * (float(res.cv_std_error)
                           + float(res.upper_std_error))


def test_g2_bracket_platform_consistency():
    """G2++ Bermudan bracket: the on-chip fp32 evaluation must match the
    in-process CPU fp32 twin (same fn, same key) within ~1e-6 on both
    sides — the G2 analogue of the HW floor removal (CPU fp32 was
    already pinned vs the fp64 2-d DP oracle in the CPU suite)."""
    from hullwhite_tpu.models import g2pp

    cfg = HWConfig(path_block=1 << 16)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f = oracles.forward_rate(cfg, Ts)
    market = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(f, jnp.float32))
    sched = swap_fixed_leg(cfg, 0.025, 5.0)
    ex = [5.0, 6.0]
    g = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)
    key = jax.random.key(cfg.seed)
    kw = dict(n_paths=1 << 15, n_blocks=4)
    res_t = g2pp.price_bermudan_g2(cfg, g, key, market, sched, ex, **kw)
    lo_t, up_t = float(res_t.price_cv), float(res_t.upper)
    with jax.default_device(jax.devices("cpu")[0]):
        res_c = g2pp.price_bermudan_g2(cfg, g, key, market, sched, ex,
                                       **kw)
        lo_c, up_c = float(res_c.price_cv), float(res_c.upper)
    assert abs(lo_t - lo_c) < 1.5e-6, (lo_t, lo_c)
    assert abs(up_t - up_c) < 1.5e-6, (up_t, up_c)
