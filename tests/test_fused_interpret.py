"""Fused Pallas kernels on CPU via interpret mode.

``pltpu.prng_random_bits`` returns all zeros under ``InterpretParams``, so
round 1 could not test the fused engines off-hardware at all.  With the
counter-hash fallback in ``fused._tile_rng`` the full moment/payoff/
reduction logic of every fused kernel now runs in the CPU suite — including
under an 8-device mesh — closing the "flagship tier is untested code" gap
(the reference's analogue is its reduction-correctness gate,
benchmark_reductions.cu:158-169).
"""

import math

import jax
import numpy as np
import pytest

from hullwhite_tpu import tiny_config, pricing, greeks
from hullwhite_tpu.models import oracles
from hullwhite_tpu.parallel import mesh as pmesh

# exact option kernels need path_block % (TILE_OPT * PAD) == 0 -> 2^15
# (which also covers curve exact % (2*TILE_EXACT) = 8192 and fullstep
# % TILE_FULL_OPT = 4096; see pallas/fused.py tile constants).
CFG = tiny_config(n_paths=1 << 16, path_block=1 << 15, n_steps=100,
                  n_mat=11, pallas_interpret=True)
KEY = jax.random.key(7)


@pytest.fixture(scope="module")
def market():
    # XLA exact engine bootstrap (tight, engine-independent market data)
    return pricing.bootstrap_curve(CFG, KEY, engine="exact")


def _price_se(market):
    # payoff sd ~ 0.05 like the reference's; conservative
    return 0.05 / math.sqrt(2 * CFG.n_paths)


def test_fused_curve_both_tiers():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P_true = np.array([oracles.bond_price(CFG, T) for T in Ts])
    for engine in ("pallas", "pallas_exact"):
        m = pricing.bootstrap_curve(CFG, KEY, engine=engine)
        P = np.asarray(m.P)
        assert P[0] == 1.0
        se = 0.1 * P_true / math.sqrt(2 * CFG.n_paths)
        assert np.all(np.abs(P - P_true) < 5 * se + 1e-4), (
            engine, np.abs(P - P_true))


def test_fused_zbc_price_vs_xla(market):
    ref = pricing.price_zbc(CFG, KEY, market, engine="exact")
    for engine in ("pallas", "pallas_exact"):
        est = pricing.price_zbc(CFG, KEY, market, engine=engine)
        tol = 5 * _price_se(market)
        assert abs(float(est.price) - float(ref.price)) < tol, engine
        # CV machinery produces a sane beta and correlation
        assert 0.05 < float(est.beta) < 0.4, engine
        assert 0.3 < float(est.correlation) < 0.95, engine


def test_fused_vega_vs_xla(market):
    ref = float(pricing.pathwise_vega(CFG, KEY, market, engine="exact"))
    for engine in ("pallas", "pallas_exact"):
        v = float(pricing.pathwise_vega(CFG, KEY, market, engine=engine))
        assert abs(v - ref) < 0.02, (engine, v, ref)


def test_fused_delta_vs_xla(market):
    ref = float(pricing.pathwise_delta(CFG, KEY, market, engine="exact"))
    d = float(pricing.pathwise_delta(CFG, KEY, market,
                                     engine="pallas_exact"))
    assert abs(d - ref) < 0.05 * abs(ref), (d, ref)
    # gamma rides on delta and must now accept the fused tier
    g = float(greeks.gamma_zbc(CFG, KEY, market, engine="pallas_exact"))
    g_ref = float(greeks.gamma_zbc(CFG, KEY, market, engine="exact"))
    assert abs(g - g_ref) < 0.05 * abs(g_ref), (g, g_ref)


def test_fused_deterministic(market):
    a = pricing.price_zbc(CFG, KEY, market, engine="pallas_exact")
    b = pricing.price_zbc(CFG, KEY, market, engine="pallas_exact")
    assert float(a.price) == float(b.price)


def test_fused_under_mesh_matches_single(market):
    """shard_map + fused kernel: the 8-device run consumes exactly the same
    Gaussian tiles as the single-device run (randomness keyed on the global
    tile index); results agree to fp32 reduction-order noise (the psum
    combines per-device partials in a different order than the sequential
    block loop)."""
    mesh = pmesh.path_mesh()
    assert mesh.devices.size == 8
    cfg = CFG.replace(n_paths=8 * CFG.path_block)
    m8 = pricing.bootstrap_curve(cfg, KEY, engine="pallas_exact", mesh=mesh)
    m1 = pricing.bootstrap_curve(cfg, KEY, engine="pallas_exact")
    np.testing.assert_allclose(np.asarray(m8.P), np.asarray(m1.P),
                               rtol=0, atol=1e-6)
    e8 = pricing.price_zbc(cfg, KEY, m1, engine="pallas_exact", mesh=mesh)
    e1 = pricing.price_zbc(cfg, KEY, m1, engine="pallas_exact")
    assert abs(float(e8.price) - float(e1.price)) < 1e-6


def test_deterministic_cross_engine_gate(market):
    """The XLA exact engine consuming the fused kernel's own Gaussians
    reproduces the fused price deterministically — the hardware analogue
    (run here in interpret mode) of the reference's <1e-6 cross-kernel
    agreement gate (benchmark_reductions.cu:158-169)."""
    import jax.numpy as jnp

    from hullwhite_tpu.models import hull_white as hw
    from hullwhite_tpu.ops import engine_exact, payoffs
    from hullwhite_tpu.pallas import fused

    cfg1 = CFG.replace(n_paths=CFG.path_block)  # one block = one tile
    n_tiles = cfg1.path_block // (fused.TILE_OPT * fused.PAD)
    x1, x2 = fused.dump_option_normals(cfg1, KEY, n_tiles=n_tiles)
    X = jnp.stack([x1.reshape(-1), x2.reshape(-1)], axis=1)
    tables = hw.step_tables(cfg1, cfg1.sigma, cfg1.sigma)
    zw = engine_exact.zbc_weights(cfg1, tables)
    m = payoffs.zbc_moments(cfg1, cfg1.sigma, market,
                            engine_exact.antithetic_state(cfg1, zw, X))
    ref = payoffs.cv_estimate(m, market.P[-1])

    est = pricing.price_zbc(cfg1, KEY, market, engine="pallas_exact")
    assert abs(float(est.price) - float(ref.price)) < 1e-6
    assert abs(float(est.beta) - float(ref.beta)) < 1e-4


def test_fused_grid_matches_xla(market):
    """Fused option-surface kernel vs the XLA exact grid, cell by cell."""
    from hullwhite_tpu import grid as grid_mod

    Ks = [CFG.strike * (1 + s) for s in (-0.02, 0.0, 0.02)]
    S2s = [8.0, 9.0, 10.0]
    g_p = grid_mod.price_zbc_grid(CFG, KEY, market, Ks, S2s,
                                  engine="pallas_exact")
    g_x = grid_mod.price_zbc_grid(CFG, KEY, market, Ks, S2s,
                                  engine="exact")
    se = np.asarray(g_x.std_error_raw)
    assert np.all(np.abs(np.asarray(g_p.price) - np.asarray(g_x.price))
                  < 6 * se + 1e-4)
    assert np.all(np.abs(np.asarray(g_p.beta) - np.asarray(g_x.beta)) < 0.05)


def test_peak_microbenches_run_in_interpret_mode():
    """The unit-wall microbench kernels (fullstep PRNG/ALU + round-5
    exact-tier BM/exp/recip) execute under interpret mode and return
    finite checksums with positive op totals."""
    import jax

    from hullwhite_tpu.pallas import fused

    for fn_of in (fused.raw_peak_fn, fused.draw_peak_fn,
                  fused.bitops_peak_fn, fused.bm_peak_fn,
                  fused.exp_peak_fn, fused.recip_peak_fn):
        fn, total = fn_of(CFG)
        assert total > 0, fn_of
        v = float(jax.jit(fn)(jax.random.key(3)))
        assert v == v, fn_of   # finite (not NaN)


def test_exact_tier_accounting_consistency():
    """Analytic per-path counts: q1 uses PAD/2 normals+exps+recips per
    path and PAD^2 x passes matmul flops; the option tiers use O(1)."""
    from hullwhite_tpu.pallas import fused

    acct = fused.exact_tier_accounting(CFG)
    q1 = acct["q1_exact"]
    assert q1["normals_per_path"] == fused.PAD / 2
    passes = 6 if CFG.matmul_precision == "highest" else 1
    assert q1["mxu_flops_per_path"] == fused.PAD * fused.PAD * passes
    assert acct["zbc_exact"]["normals_per_path"] == 1.0
    assert acct["zbc_exact"]["mxu_flops_per_path"] == 0.0
    assert acct["vega_exact"]["normals_per_path"] == 2.0
