"""Unit tests for the closed-form layer against float64 NumPy re-derivations."""

import numpy as np
import jax.numpy as jnp

from hullwhite_tpu import tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles


def _np_drift_tables(cfg, sigma):
    """Independent float64 recomputation of the reference drift tables
    (common.cuh:60-84 semantics)."""
    a, dt = cfg.a, cfg.dt
    spec = cfg.theta
    E = np.exp(-a * dt)
    one_m = (1 - E) / a
    i = np.arange(cfg.n_steps)
    s = i * dt
    t = (i + 1) * dt
    first = ((s + dt) - E * s) / a - one_m / a
    base = np.where(s < spec.t_break,
                    spec.beta0 * first + spec.alpha0 * one_m,
                    spec.beta1 * first + spec.alpha1 * one_m)
    # reference sigma-drift table: 2 sigma e^{-a t}(cosh(a t)-cosh(a s))/a^2
    sig_drift = 2.0 * sigma * np.exp(-a * t) * (np.cosh(a * t) - np.cosh(a * s)) / a**2
    return base, sig_drift


def test_drift_table_matches_reference_form():
    cfg = tiny_config()
    t = hw.step_tables(cfg, cfg.sigma)
    base, sig_drift = _np_drift_tables(cfg, cfg.sigma)
    np.testing.assert_allclose(np.asarray(t.drift), base, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(t.drift_sigma), sig_drift, rtol=1e-4, atol=1e-9)


def test_shifted_drift_is_sigma_derivative():
    """drift(sigma0 + eps) - drift(sigma0 - eps) ~ 2 eps * drift_sigma:
    the calibration-consistent shifted table (3_sensitivity_analysis.cu:374-398)
    and the tangent drift (common.cuh:79-80) come from one parameterization."""
    cfg = tiny_config()
    eps = 1e-2
    tp = hw.step_tables(cfg, cfg.sigma + eps)
    tm = hw.step_tables(cfg, cfg.sigma - eps)
    t0 = hw.step_tables(cfg, cfg.sigma)
    fd = (np.asarray(tp.drift) - np.asarray(tm.drift)) / (2 * eps)
    np.testing.assert_allclose(fd, np.asarray(t0.drift_sigma), rtol=1e-3,
                               atol=1e-8)


def test_sig_st():
    cfg = tiny_config()
    expected = cfg.sigma * np.sqrt((1 - np.exp(-2 * cfg.a * cfg.dt)) / (2 * cfg.a))
    assert abs(float(hw.sig_st_fn(cfg, cfg.sigma)) - expected) < 1e-7


def test_bond_reconstruction_at_exact_market():
    """P(t,T) reconstruction: with the analytic market curve, P(0,T) must
    reproduce the curve itself at r = f(0,0)... sanity: A(0,T)e^{-B r0}."""
    cfg = tiny_config()
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f = oracles.forward_rate(cfg, Ts)
    market = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(f, jnp.float32))
    # At t=0: A(0,T) = P(0,T) e^{B f(0,0)}... direct check: P_HW(0,T,r0)
    got = hw.p_bond(cfg, cfg.sigma, market, 0.0, cfg.t_final, cfg.r0)
    # f(0,0) = r0 for Hull-White, so P(0,T) = A e^{-B r0} should equal market.
    np.testing.assert_allclose(float(got), P[-1], rtol=5e-6)


def test_theta_recovery_analytic_curve():
    """Feeding the *analytic* forward curve into the theta-recovery formula
    must return theta to grid-discretization accuracy."""
    cfg = tiny_config(n_mat=101, n_steps=1000)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    f = oracles.forward_rate(cfg, Ts)
    rec, true, _ = hw.recover_theta(cfg, cfg.sigma, jnp.asarray(f, jnp.float32))
    err = np.abs(np.asarray(rec) - np.asarray(true))
    # interior error is O(h^2); the theta kink at t=5 and the one-sided
    # boundary stencils dominate the max (reference sees 1.56e-3 at T=0).
    assert err.max() < 5e-3
    assert err.mean() < 5e-4


def test_forward_from_p_roundtrip():
    cfg = tiny_config(n_mat=101, n_steps=1000)
    Ts = np.linspace(0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f_true = oracles.forward_rate(cfg, Ts)
    f_got = np.asarray(hw.forward_from_p(cfg, jnp.asarray(P)))
    assert np.abs(f_got[1:-1] - f_true[1:-1]).max() < 2e-4


def test_market_theta_reprices_curve_at_shifted_params():
    """ThetaFromCurve (round-5): with the drift refit to an observed
    curve, the MODEL discount curve reproduces the market P(0, T) at
    NON-default (a, sigma) — the calibrate->reprice consistency
    requirement.  Closed form: P_model(0,T_m) = exp(-c_m + var_m/2)
    off the linear engine's deterministic I and shock shapes."""
    import numpy as np

    from hullwhite_tpu import tiny_config
    from hullwhite_tpu.models import hull_white as hw, oracles
    from hullwhite_tpu.ops import engine_linear

    cfg = tiny_config(n_steps=500, n_mat=101)
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f = oracles.forward_rate(cfg, Ts)
    market = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(f, jnp.float32))
    for a, s in [(0.8, 0.08), (1.3, 0.12)]:
        cal = cfg.replace(a=a, sigma=s,
                          theta=hw.market_theta(cfg, market))
        tables = hw.step_tables(cal, cal.sigma, cal.sigma)
        cw = engine_linear.curve_weights(cal, tables)
        var = np.sum(np.asarray(cw.W, np.float64) ** 2, axis=0)
        P_model = np.exp(-np.asarray(cw.c, np.float64) + 0.5 * var)
        # discrete trapezoid I-law vs the continuous curve: the
        # documented ~2e-5 class at dt=0.02, plus fp32 curve storage
        np.testing.assert_allclose(P_model, P, rtol=0, atol=8e-5)
    # and the hard-coded default spec does NOT reprice the curve at
    # shifted parameters (the gap this feature closes)
    bad = cfg.replace(a=0.8, sigma=0.08)
    tables = hw.step_tables(bad, bad.sigma, bad.sigma)
    cw = engine_linear.curve_weights(bad, tables)
    var = np.sum(np.asarray(cw.W, np.float64) ** 2, axis=0)
    P_bad = np.exp(-np.asarray(cw.c, np.float64) + 0.5 * var)
    assert np.max(np.abs(P_bad - P)) > 1e-3


def test_market_theta_cap_agrees_with_closed_form():
    """The measured pipeline failure case: a 4y cap at (a, sigma) =
    (0.85, 0.093) was +1.8e-3 off its closed form under the default
    ThetaSpec; with market_theta the MC and the curve-based closed form
    agree within MC noise."""
    import numpy as np

    import jax

    from hullwhite_tpu import tiny_config, instruments
    from hullwhite_tpu.models import hull_white as hw, oracles

    cfg = tiny_config(n_paths=1 << 14, path_block=1 << 12)
    Ts = np.linspace(0.0, cfg.t_final, cfg.n_mat)
    P = np.array([oracles.bond_price(cfg, T) for T in Ts])
    f = oracles.forward_rate(cfg, Ts)
    market = hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                            f=jnp.asarray(f, jnp.float32))
    cal = cfg.replace(a=0.85, sigma=0.093,
                      theta=hw.market_theta(cfg, market))
    cap = instruments.price_cap(cal, jax.random.key(5), market,
                                rate=0.02, tenor=4.0, n_blocks=2)
    cf, _ = instruments.cap_closed_form(cal, market, rate=0.02,
                                        tenor=4.0)
    assert abs(float(cap.price) - cf) < 5 * float(cap.std_error) + 3e-5, (
        float(cap.price), cf)
