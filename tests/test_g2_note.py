"""G2++ puttable range-accrual note: 2-d (u, w) DP oracle internal
consistency (put-disabled DP == exact closed form + P(0, T_n)), the MC
boundary-curve policy vs the DP value, control-variate effectiveness,
and the mesh-sharding invariant."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, g2_note
from hullwhite_tpu.models import g2pp, hull_white as hw, oracles

CFG = tiny_config(n_paths=1 << 13, path_block=1 << 11)
KEY = jax.random.key(17)
G2 = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)
KW = dict(coupon=0.03, lo=0.010, hi=0.022, tenor=2.0, obs_per_period=4)
DPKW = dict(n_u=121, n_w=41, n_quad=12)


@pytest.fixture(scope="module")
def analytic_market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.fixture(scope="module")
def dp(analytic_market):
    return g2_note.dp_oracle_range_note_g2(CFG, G2, analytic_market,
                                           **KW, **DPKW)


def test_dp_plain_matches_closed_form(analytic_market, dp):
    """The put-disabled DP must reproduce range_accrual_closed_form_g2 +
    P(0, T_n) — one number pinning the whole conditional machinery:
    rotated-coordinate projection, tilted coupon Phis, and the
    exact-in-u / Gauss-Hermite-in-w continuation."""
    leg, _ = g2pp.range_accrual_closed_form_g2(CFG, G2, analytic_market,
                                               **KW)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0n = float(np.interp(CFG.s1 + KW["tenor"], Ts,
                          np.asarray(analytic_market.P, np.float64)))
    assert abs(dp.plain_price - (leg + P0n)) < 4e-5, \
        (dp.plain_price, leg + P0n)


def test_put_premium_and_boundaries(dp):
    """Premium nonnegative; boundary curves exist per put date and are
    finite somewhere (the put is live, not degenerate)."""
    assert dp.put_premium >= -1e-12
    n = int(round(KW["tenor"]))
    assert len(dp.boundaries) == n - 1
    for wg, ustar in dp.boundaries:
        assert len(wg) == len(ustar)
        assert all(math.isfinite(u) for u in ustar)


def test_mc_reproduces_dp(analytic_market, dp):
    """The fixed DP-policy MC must agree with the DP value within noise
    plus the DP's own grid error (the plain-DP residual bounds it)."""
    res = g2_note.price_range_note_g2(CFG, G2, KEY, analytic_market,
                                      boundaries=dp.boundaries,
                                      n_blocks=4, **KW)
    tol = 4.0 * float(res.std_error) + 5e-5
    assert abs(float(res.price) - dp.price) < tol, \
        (float(res.price), dp.price, float(res.std_error))
    assert 0.0 <= float(res.put_fraction) <= 1.0


def test_cv_collapses_noise(analytic_market, dp):
    res = g2_note.price_range_note_g2(CFG, G2, KEY, analytic_market,
                                      boundaries=dp.boundaries,
                                      n_blocks=2, **KW)
    assert float(res.std_error) < float(res.raw_std_error)
    assert float(res.beta) > 0.0


def test_mesh_matches_single_device(analytic_market, dp):
    """Sharded == single-device per the global-block-index invariant."""
    from hullwhite_tpu.parallel import mesh as pmesh
    mesh = pmesh.path_mesh()
    kw = dict(boundaries=dp.boundaries, n_blocks=8, **KW)
    single = g2_note.price_range_note_g2(CFG, G2, KEY, analytic_market,
                                         **kw)
    sharded = g2_note.price_range_note_g2(CFG, G2, KEY, analytic_market,
                                          mesh=mesh, **kw)
    np.testing.assert_allclose(float(sharded.price), float(single.price),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(float(sharded.put_fraction),
                               float(single.put_fraction), atol=1e-6)


def test_degenerate_policy_is_plain_note(analytic_market):
    """A never-put boundary (+big) must reproduce the closed-form plain
    note to MC noise — and with the CV the residual collapses to ~0
    because V == Y pathwise."""
    n = int(round(KW["tenor"]))
    never = tuple(((-1.0, 1.0), (10.0, 10.0)) for _ in range(n - 1))
    res = g2_note.price_range_note_g2(CFG, G2, KEY, analytic_market,
                                      boundaries=never, n_blocks=2, **KW)
    leg, _ = g2pp.range_accrual_closed_form_g2(CFG, G2, analytic_market,
                                               **KW)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0n = float(np.interp(CFG.s1 + KW["tenor"], Ts,
                          np.asarray(analytic_market.P, np.float64)))
    assert float(res.put_fraction) == 0.0
    # V == Y pathwise -> CV estimator returns the exact mean
    assert abs(float(res.price) - (leg + P0n)) < 1e-5


# --------------------------- G2++ TARN twin ---------------------------

TKW = dict(coupon=0.03, lo=0.010, hi=0.022, tenor=2.0, freq=1.0)


@pytest.fixture(scope="module")
def tarn_dp(analytic_market):
    return g2_note.dp_oracle_tarn_g2(CFG, G2, analytic_market,
                                     target=0.045, n_u=121, n_w=41,
                                     n_quad=12, **TKW)


def test_tarn_mc_matches_lattice_dp(analytic_market, tarn_dp):
    res = g2_note.price_tarn_g2(CFG, G2, KEY, analytic_market,
                                target=0.045, n_blocks=4, **TKW)
    tol = 4.0 * float(res.std_error) + 5e-5
    assert abs(float(res.price) - tarn_dp.price) < tol, \
        (float(res.price), tarn_dp.price)
    n_tot = res.n_paths * 2
    ko_se = math.sqrt(max(tarn_dp.ko_prob * (1 - tarn_dp.ko_prob), 1e-9)
                      / n_tot)
    assert abs(float(res.ko_fraction) - tarn_dp.ko_prob) \
        < 5.0 * ko_se + 1e-3


def test_tarn_infinite_target_is_plain_note(analytic_market):
    """target -> infinity disables the knockout: the lattice DP must
    collapse to the m=1 closed-form leg + P(0, T_n)."""
    dp = g2_note.dp_oracle_tarn_g2(CFG, G2, analytic_market, target=1e9,
                                   n_u=121, n_w=41, n_quad=12, **TKW)
    leg, _ = g2pp.range_accrual_closed_form_g2(CFG, G2, analytic_market,
                                               obs_per_period=1, **TKW)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0n = float(np.interp(CFG.s1 + TKW["tenor"], Ts,
                          np.asarray(analytic_market.P, np.float64)))
    assert dp.ko_prob == 0.0
    assert abs(dp.price - (leg + P0n)) < 2e-5


def test_tarn_mesh_matches_single_device(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh
    mesh = pmesh.path_mesh()
    kw = dict(target=0.045, n_blocks=8, **TKW)
    single = g2_note.price_tarn_g2(CFG, G2, KEY, analytic_market, **kw)
    sharded = g2_note.price_tarn_g2(CFG, G2, KEY, analytic_market,
                                    mesh=mesh, **kw)
    np.testing.assert_allclose(float(sharded.price), float(single.price),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(float(sharded.ko_fraction),
                               float(single.ko_fraction), atol=1e-6)


def test_vega_envelope_check(analytic_market):
    """Frozen-boundary CRN-FD vega must match the re-optimizing DP
    central difference (envelope theorem for the curved 2-d boundary)."""
    nv = g2_note.vega_range_note_g2(CFG, G2, KEY, analytic_market,
                                    n_blocks=4, dp_kwargs=dict(
                                        n_u=121, n_w=41, n_quad=12), **KW)
    # CRN collapses the FD noise; the DP re-optimization differs from
    # the frozen policy only at second order in eps
    assert abs(float(nv.vega) - nv.dp_vega) < 0.05 * max(
        abs(nv.dp_vega), 1.0), (float(nv.vega), nv.dp_vega)


# --------------------- G2++ callable capped floater ---------------------

FKW = dict(cap=0.016, spread=0.004, tenor=3.0, freq=1.0)


@pytest.fixture(scope="module")
def floater_dp(analytic_market):
    return g2_note.dp_oracle_capped_floater_g2(CFG, G2, analytic_market,
                                               **FKW, **DPKW)


def test_floater_dp_plain_matches_closed_form(analytic_market, floater_dp):
    """The call-disabled DP must reproduce capped_floater_closed_form_g2
    + P(0, T_n) — pins the kinked-coupon grid and the conditional
    machinery with no MC noise."""
    leg, _ = g2_note.capped_floater_closed_form_g2(CFG, G2,
                                                   analytic_market, **FKW)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0n = float(np.interp(CFG.s1 + FKW["tenor"], Ts,
                          np.asarray(analytic_market.P, np.float64)))
    assert abs(floater_dp.plain_price - (leg + P0n)) < 4e-5, \
        (floater_dp.plain_price, leg + P0n)


def test_floater_call_premium_and_boundaries(floater_dp):
    assert floater_dp.call_premium >= -1e-12
    n = int(round(FKW["tenor"]))
    assert len(floater_dp.boundaries) == n - 1
    for wg, ustar in floater_dp.boundaries:
        assert len(wg) == len(ustar)
        assert all(math.isfinite(u) for u in ustar)


def test_floater_mc_reproduces_dp(analytic_market, floater_dp):
    res = g2_note.price_capped_floater_g2(CFG, G2, KEY, analytic_market,
                                          boundaries=floater_dp.boundaries,
                                          n_blocks=4, **FKW)
    tol = 4.0 * float(res.std_error) + 5e-5
    assert abs(float(res.price) - floater_dp.price) < tol, \
        (float(res.price), floater_dp.price, float(res.std_error))
    assert 0.0 < float(res.call_fraction) < 1.0


def test_floater_mesh_matches_single_device(analytic_market, floater_dp):
    from hullwhite_tpu.parallel import mesh as pmesh
    mesh = pmesh.path_mesh()
    kw = dict(boundaries=floater_dp.boundaries, n_blocks=8, **FKW)
    single = g2_note.price_capped_floater_g2(CFG, G2, KEY,
                                             analytic_market, **kw)
    sharded = g2_note.price_capped_floater_g2(CFG, G2, KEY,
                                              analytic_market, mesh=mesh,
                                              **kw)
    np.testing.assert_allclose(float(sharded.price), float(single.price),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(float(sharded.call_fraction),
                               float(single.call_fraction), atol=1e-6)


def test_floater_never_call_is_plain_note(analytic_market):
    """A never-call boundary (u* far below the grid) must reproduce the
    closed-form plain floater; with the CV the residual is ~exact
    because V == Y pathwise."""
    n = int(round(FKW["tenor"]))
    never = tuple(((-1.0, 1.0), (-10.0, -10.0)) for _ in range(n - 1))
    res = g2_note.price_capped_floater_g2(CFG, G2, KEY, analytic_market,
                                          boundaries=never, n_blocks=2,
                                          **FKW)
    leg, _ = g2_note.capped_floater_closed_form_g2(CFG, G2,
                                                   analytic_market, **FKW)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0n = float(np.interp(CFG.s1 + FKW["tenor"], Ts,
                          np.asarray(analytic_market.P, np.float64)))
    assert float(res.call_fraction) == 0.0
    assert abs(float(res.price) - (leg + P0n)) < 1e-5


def test_floater_vega_envelope_check(analytic_market):
    nv = g2_note.vega_capped_floater_g2(CFG, G2, KEY, analytic_market,
                                        n_blocks=4,
                                        dp_kwargs=DPKW, **FKW)
    assert abs(float(nv.vega) - nv.dp_vega) < 0.05 * max(
        abs(nv.dp_vega), 1.0), (float(nv.vega), nv.dp_vega)
