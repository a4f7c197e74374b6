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
    # round-4 cubic surfaces: the old bilinear bound here was 4e-5
    assert abs(dp.plain_price - (leg + P0n)) < 2e-6, \
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
    # round 5: the put crease gets per-column +-eps double nodes at the
    # secant-refined crossing u*(w_j) (this config: bias +1.2e-6 ->
    # +4.3e-7 vs the (241,91,20) grid; full-scale +5e-6 -> +2.15e-6),
    # so the allowance tightens 1e-5 -> 4e-6
    tol = 4.0 * float(res.std_error) + 4e-6
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_floater_vega_envelope_check(analytic_market):
    nv = g2_note.vega_capped_floater_g2(CFG, G2, KEY, analytic_market,
                                        n_blocks=4,
                                        dp_kwargs=DPKW, **FKW)
    assert abs(float(nv.vega) - nv.dp_vega) < 0.05 * max(
        abs(nv.dp_vega), 1.0), (float(nv.vega), nv.dp_vega)


# --------------------------- G2++ snowball twin ---------------------------

SKW = dict(initial=0.02, spread=0.013, cap=0.06, floor=0.0, tenor=3.0)
SDPKW = dict(n_u=81, n_w=31, n_c=41, n_quad=10)


@pytest.fixture(scope="module")
def snow_dp(analytic_market):
    return g2_note.dp_oracle_snowball_g2(CFG, G2, analytic_market,
                                         **SKW, **SDPKW)


@pytest.mark.slow
def test_snowball_unclipped_dp_matches_linear_closed_form(analytic_market):
    """With clip bounds the paths cannot reach, the (u, w, c) DP must
    collapse to the unclipped linear snowball's exact closed form —
    pins the surface-batched continuation + c-interpolation (which is
    EXACT here: the unclipped value is linear in c).  Round 4's cubic
    (u, w) surfaces (exact-integrated cubic Hermite in u, Catmull-Rom
    in w) kill the old bilinear convexity bias on this smooth surface:
    measured +1.2e-4 / +7.8e-5 / +3.9e-5 bilinear at (81,31,10) /
    (121,41,12) / (161,61,16) -> -9.3e-8 / +5.9e-9 cubic at the two
    smaller grids."""
    kw = dict(SKW, cap=3.0, floor=-3.0)
    dp2 = g2_note.dp_oracle_snowball_g2(CFG, G2, analytic_market,
                                        **kw, n_u=121, n_w=41, n_c=41,
                                        n_quad=12)
    assert abs(dp2.price - dp2.linear_price) < 1e-6, (
        dp2.price, dp2.linear_price)


def test_snowball_clips_add_value(snow_dp):
    """floor=0 truncates the coupon's downside only -> the clipped note
    is worth MORE than the linear one."""
    assert snow_dp.price > snow_dp.linear_price
    assert 0.0 <= snow_dp.mean_final_coupon <= SKW["cap"]


def test_snowball_mc_reproduces_dp(analytic_market, snow_dp):
    res = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market,
                                    n_blocks=4, **SKW)
    se = float(res.std_error)
    assert abs(float(res.price) - snow_dp.price) < 5 * se + 5e-5, (
        float(res.price), snow_dp.price, se)
    assert float(res.std_error) < 0.5 * float(res.raw_std_error)
    n_tot = 4.0 * res.n_paths
    assert abs(float(res.mean_final_coupon) - snow_dp.mean_final_coupon) \
        < 6 * 0.01 / math.sqrt(n_tot) + 2e-4


@pytest.mark.slow
def test_snowball_degenerate_is_fixed_coupon(analytic_market):
    """spread == 0 with floor == cap == initial freezes the coupon: the
    note is a fixed-coupon bond, closed form from the exact curve
    (E[e^{-I}] = P(0, T) exactly under the functional law)."""
    kw = dict(initial=0.02, spread=0.0, cap=0.02, floor=0.02, tenor=3.0)
    dp3 = g2_note.dp_oracle_snowball_g2(CFG, G2, analytic_market,
                                        **kw, n_u=121, n_w=41, n_c=11,
                                        n_quad=12)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P0 = np.asarray(analytic_market.P, np.float64)
    expect = sum(0.02 * float(np.interp(CFG.s1 + j + 1.0, Ts, P0))
                 for j in range(3)) \
        + float(np.interp(CFG.s1 + 3.0, Ts, P0))
    # residual under the round-3 bilinear surfaces was the discount
    # surface's own convexity bias: +4.9e-5 / +3.1e-5 / +1.6e-5 at
    # (81,31,10) / (121,41,12) / (161,61,16), O(h^2); the round-4
    # cubic surfaces take it to -3.5e-8 / -9.2e-11 / -2.2e-9
    assert abs(dp3.price - expect) < 1e-6, (dp3.price, expect)
    res = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market,
                                    n_paths=1 << 12, **kw)
    assert abs(float(res.price) - expect) < 5 * float(res.std_error) + 1e-5


@pytest.mark.slow
def test_snowball_vega_crn_matches_dp_fd(analytic_market):
    v = g2_note.vega_snowball_g2(CFG, G2, KEY, analytic_market,
                                 n_blocks=2, eps=2e-3,
                                 dp_kwargs=SDPKW, **SKW)
    assert abs(float(v.vega) - v.dp_vega) < 0.05 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


def test_snowball_sharded_matches_single(analytic_market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, **SKW)
    r1 = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market, **kw)
    r8 = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market,
                                   mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6
    assert abs(float(r1.mean_final_coupon)
               - float(r8.mean_final_coupon)) < 1e-6


# --- issuer-callable snowball (boundary SURFACES u*(w, c)) -------------


@pytest.fixture(scope="module")
def csnow_dp(analytic_market):
    return g2_note.dp_oracle_callable_snowball_g2(CFG, G2,
                                                  analytic_market,
                                                  **SKW, **SDPKW)


def test_callable_snowball_dp_below_plain(snow_dp, csnow_dp):
    """The issuer's call right can only cheapen the note, the plain
    legs of both oracles must agree exactly (same backward pass), and
    the boundary surfaces must rise with the running coupon (a richer
    coupon is called at higher rates, i.e. larger u)."""
    assert csnow_dp.price < csnow_dp.plain_price
    assert csnow_dp.call_premium > 1e-3
    assert abs(csnow_dp.plain_price - snow_dp.price) < 1e-14
    b = np.array([rows for _, rows in csnow_dp.boundaries])
    assert b.shape == (2, len(csnow_dp.c_grid), SDPKW["n_w"])
    assert np.all(np.diff(b, axis=1) > -1e-9)


def test_callable_snowball_mc_reproduces_dp(analytic_market, csnow_dp):
    res = g2_note.price_callable_snowball_g2(
        CFG, G2, KEY, analytic_market, n_paths=1 << 14, n_blocks=2,
        boundaries=csnow_dp.boundaries, c_grid=csnow_dp.c_grid,
        plain_mean=csnow_dp.plain_price, **SKW)
    se = float(res.std_error)
    # the (u, w) bilinear DP carries the documented O(h^2) bias
    assert abs(float(res.price) - csnow_dp.price) < 5 * se + 3e-4, (
        float(res.price), csnow_dp.price, se)
    assert 0.0 < float(res.call_fraction) < 1.0
    assert float(res.std_error) < float(res.raw_std_error)


def test_callable_snowball_policy_is_upper_bound(analytic_market,
                                                 csnow_dp):
    """A deliberately WRONG fixed policy (surfaces shifted down in u:
    the issuer calls too late) must price ABOVE the DP optimum — the
    fixed-policy MC is an upper bound for the minimizer."""
    shifted = tuple((wg, tuple(tuple(v - 0.01 for v in row)
                               for row in rows))
                    for wg, rows in csnow_dp.boundaries)
    res = g2_note.price_callable_snowball_g2(
        CFG, G2, KEY, analytic_market, n_paths=1 << 14, n_blocks=2,
        boundaries=shifted, c_grid=csnow_dp.c_grid,
        plain_mean=csnow_dp.plain_price, **SKW)
    assert float(res.price) > csnow_dp.price - 3 * float(res.std_error)


@pytest.mark.slow
def test_callable_snowball_vega_envelope(analytic_market):
    v = g2_note.vega_callable_snowball_g2(CFG, G2, KEY, analytic_market,
                                          n_blocks=2, eps=2e-3,
                                          dp_kwargs=SDPKW, **SKW)
    assert abs(float(v.vega) - v.dp_vega) < 0.08 * abs(v.dp_vega) + 1e-3, (
        float(v.vega), v.dp_vega)


@pytest.mark.slow
def test_callable_snowball_sharded_matches_single(analytic_market,
                                                  csnow_dp):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=512, n_blocks=8, boundaries=csnow_dp.boundaries,
              c_grid=csnow_dp.c_grid, plain_mean=csnow_dp.plain_price,
              **SKW)
    r1 = g2_note.price_callable_snowball_g2(CFG, G2, KEY,
                                            analytic_market, **kw)
    r8 = g2_note.price_callable_snowball_g2(CFG, G2, KEY,
                                            analytic_market,
                                            mesh=pmesh.path_mesh(), **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6


def test_snowball_rqmc_agrees_and_tightens(analytic_market, snow_dp):
    kw = dict(n_paths=1 << 12, n_blocks=8, **SKW)
    rq = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market,
                                   rqmc=True, **kw)
    mc = g2_note.price_snowball_g2(CFG, G2, KEY, analytic_market, **kw)
    assert abs(float(rq.price) - snow_dp.price) \
        < 6 * float(rq.std_error) + 1e-4
    assert float(rq.std_error) < 0.25 * float(mc.std_error)
