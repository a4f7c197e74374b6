"""Bermudan LSMC tests: European degeneracy, monotonicity in exercise
rights, and the two-pass bias direction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import bermudan, instruments
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(123)
N = 1 << 15


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def sched():
    # annual fixed leg paying at 6..9, notional at 9
    return instruments.CouponSchedule(times=(6.0, 7.0, 8.0, 9.0),
                                      coupons=(0.025, 0.025, 0.025, 1.025))


def test_single_date_reduces_to_european(analytic_market, sched):
    """One exercise date at S1 == the European option (Jamshidian exact)."""
    cfg = CFG  # s1 = 5.0
    res = bermudan.price_bermudan(cfg, KEY, analytic_market, sched,
                                  [cfg.s1], strike=1.0, payer=False,
                                  n_paths=N)
    jam = instruments.jamshidian_price(cfg, analytic_market, sched,
                                       strike=1.0, payer=False)
    assert abs(float(res.price) - jam) < 5 * float(res.std_error) + 2e-4, (
        float(res.price), jam, float(res.std_error))


def test_more_exercise_rights_never_cheaper(analytic_market, sched):
    euro = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0], n_paths=N)
    berm = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0, 6.0, 7.0], n_paths=N)
    # the Bermudan out-of-sample price is a lower bound, so allow noise
    assert float(berm.price) >= float(euro.price) - 3 * float(euro.std_error)


def test_bermudan_dominates_each_european(analytic_market, sched):
    """Bermudan >= the best of the individual Europeans at its dates."""
    berm = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                   [5.0, 6.5, 8.0], payer=True, n_paths=N)
    best_euro = -1.0
    for t in [5.0, 6.5, 8.0]:
        cfg_t = CFG.replace(s1=t)
        alive = instruments.CouponSchedule(
            times=tuple(x for x in sched.times if x > t),
            coupons=tuple(c for x, c in zip(sched.times, sched.coupons)
                          if x > t))
        jam = instruments.jamshidian_price(cfg_t, analytic_market, alive,
                                           strike=1.0, payer=True)
        best_euro = max(best_euro, jam)
    tol = 3 * float(berm.std_error) + 2e-4
    assert float(berm.price) >= best_euro - tol, (float(berm.price), best_euro)


def test_out_of_sample_not_above_in_sample(analytic_market, sched):
    """Foresight bias direction: in-sample >= out-of-sample in expectation;
    check it holds within noise on one run."""
    res = bermudan.price_bermudan(CFG, KEY, analytic_market, sched,
                                  [5.0, 6.0, 7.0, 8.0], n_paths=N)
    assert float(res.price) <= float(res.price_in_sample) + 3 * float(res.std_error)


def test_exercise_after_last_cashflow_rejected(analytic_market, sched):
    with pytest.raises(ValueError, match="precede the last cashflow"):
        bermudan.price_bermudan(CFG, KEY, analytic_market, sched, [9.5],
                                n_paths=1024)
