"""Up-and-out cap: DP oracle internal pins (full-cap column vs closed
form, grid convergence, huge-barrier degeneracy), MC agreement,
survival bookkeeping, sharding invariance, CRN-FD vega envelope."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import barrier, instruments, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(907)
KW = dict(rate=0.013, barrier=0.05, tenor=4.0)


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp(market):
    return barrier.dp_oracle_ko_cap(CFG, market, **KW)


def test_dp_full_cap_column_matches_closed_form(market, dp):
    cap_cf, _ = instruments.cap_closed_form(CFG, market, rate=KW["rate"],
                                            tenor=KW["tenor"])
    # discrete-trapezoid-law vs continuous-law gap only
    assert abs(dp.cap_price - cap_cf) < 2e-5
    assert 0.0 < dp.price < dp.cap_price
    assert abs(dp.barrier_premium - (dp.cap_price - dp.price)) < 1e-12
    assert 0.0 < dp.survival < 1.0


def test_dp_grid_convergence(market, dp):
    fine = barrier.dp_oracle_ko_cap(CFG, market, n_grid=1601, **KW)
    assert abs(dp.price - fine.price) < 1e-7


def test_dp_huge_barrier_degenerates_to_cap(market):
    wide = barrier.dp_oracle_ko_cap(CFG, market, rate=KW["rate"],
                                    barrier=5.0, tenor=KW["tenor"])
    assert abs(wide.price - wide.cap_price) < 1e-12
    assert wide.survival > 1.0 - 1e-9


def test_mc_matches_dp(market, dp):
    res = barrier.price_ko_cap(CFG, KEY, market, n_paths=1 << 14,
                               n_blocks=4, **KW)
    z = (float(res.price) - dp.price) / max(float(res.std_error), 1e-12)
    assert abs(z) < 4.0 or abs(float(res.price) - dp.price) < 2e-4
    # the truncated-caplet CV must actually reduce variance
    assert float(res.std_error) < 0.8 * float(res.raw_std_error)
    # MC knock-out fraction vs the DP's survival probability
    assert abs(float(res.ko_fraction) - (1.0 - dp.survival)) < 0.02


def test_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    ekw = dict(n_paths=1 << 12, n_blocks=8)
    single = barrier.price_ko_cap(CFG, KEY, market, **KW, **ekw)
    shard = barrier.price_ko_cap(CFG, KEY, market,
                                 mesh=pmesh.path_mesh(), **KW, **ekw)
    assert abs(float(single.price) - float(shard.price)) < 1e-6


def test_vega_crn_envelope(market):
    # the survival indicator makes CRN-FD noisy (paths near the barrier
    # flip sides under the sigma shift), so this is an envelope check
    v = barrier.vega_ko_cap(CFG, KEY, market, n_paths=1 << 14,
                            n_blocks=4, **KW)
    assert abs(float(v.vega) - v.dp_vega) < max(0.25 * abs(v.dp_vega),
                                                0.03)


# --- G2++ twin ---------------------------------------------------------

from hullwhite_tpu.models.g2pp import G2Params

G2 = G2Params()


@pytest.fixture(scope="module")
def dp_g2(market):
    return barrier.dp_oracle_ko_cap_g2(CFG, G2, market, **KW)


@pytest.mark.slow
def test_g2_dp_full_cap_column_matches_closed_form(market, dp_g2):
    cap_cf, per = barrier.cap_closed_form_g2(CFG, G2, market,
                                             rate=KW["rate"],
                                             tenor=KW["tenor"])
    assert len(per) == 4 and all(v > 0 for v in per)
    # the (u, w) bilinear surface's documented O(h^2) convexity bias
    assert abs(dp_g2.cap_price - cap_cf) < 2e-4
    fine = barrier.dp_oracle_ko_cap_g2(CFG, G2, market, n_u=241, n_w=91,
                                       n_quad=24, **KW)
    assert abs(fine.cap_price - cap_cf) < 1e-4
    assert abs(dp_g2.price - fine.price) < 3e-5
    assert 0.0 < dp_g2.price < dp_g2.cap_price
    assert 0.0 < dp_g2.survival < 1.0


@pytest.mark.slow
def test_g2_dp_huge_barrier_degenerates_to_cap(market):
    wide = barrier.dp_oracle_ko_cap_g2(CFG, G2, market, rate=KW["rate"],
                                       barrier=5.0, tenor=KW["tenor"])
    assert abs(wide.price - wide.cap_price) < 1e-12
    assert wide.survival > 1.0 - 1e-9


def test_g2_mc_matches_dp(market, dp_g2):
    res = barrier.price_ko_cap_g2(CFG, G2, KEY, market, n_paths=1 << 14,
                                  n_blocks=4, **KW)
    z = (float(res.price) - dp_g2.price) / max(float(res.std_error),
                                               1e-12)
    assert abs(z) < 4.0 or abs(float(res.price) - dp_g2.price) < 2e-4
    assert float(res.std_error) < 0.8 * float(res.raw_std_error)
    assert abs(float(res.ko_fraction) - (1.0 - dp_g2.survival)) < 0.02


def test_g2_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    ekw = dict(n_paths=1 << 12, n_blocks=8)
    single = barrier.price_ko_cap_g2(CFG, G2, KEY, market, **KW, **ekw)
    shard = barrier.price_ko_cap_g2(CFG, G2, KEY, market,
                                    mesh=pmesh.path_mesh(), **KW, **ekw)
    assert abs(float(single.price) - float(shard.price)) < 1e-6


@pytest.mark.slow
def test_g2_vega_crn_envelope(market):
    v = barrier.vega_ko_cap_g2(CFG, G2, KEY, market, n_paths=1 << 14,
                               n_blocks=4, **KW)
    assert abs(float(v.vega) - v.dp_vega) < max(0.25 * abs(v.dp_vega),
                                                0.03)


def test_rqmc_agrees_and_tightens(market, dp):
    kw = dict(n_paths=1 << 12, n_blocks=8, **KW)
    rq = barrier.price_ko_cap(CFG, KEY, market, rqmc=True, **kw)
    mc = barrier.price_ko_cap(CFG, KEY, market, **kw)
    assert abs(float(rq.price) - dp.price) < 6 * float(rq.std_error) + 1e-5
    # the survival indicator caps the gain (~2-3x measured) but RQMC
    # must never be worse
    assert float(rq.std_error) < float(mc.std_error)
    with pytest.raises(ValueError):
        barrier.price_ko_cap(CFG, KEY, market, rqmc=True, n_blocks=1,
                             **KW)
