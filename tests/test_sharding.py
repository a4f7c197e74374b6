"""Multi-device tests on the 8-way virtual CPU mesh: sharded runs must
reproduce single-device results (same global block indices => same
Gaussians; only the reduction order differs)."""

import jax
import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu import pricing, greeks
from hullwhite_tpu.parallel import mesh as pmesh

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 11)  # 8 blocks / device
KEY = jax.random.key(3)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return pmesh.path_mesh()


def test_sharded_curve_matches_single(mesh):
    m1 = pricing.bootstrap_curve(CFG, KEY)
    m8 = pricing.bootstrap_curve(CFG, KEY, mesh=mesh)
    np.testing.assert_allclose(np.asarray(m1.P), np.asarray(m8.P), rtol=1e-5)


def test_sharded_zbc_matches_single(mesh):
    market = pricing.bootstrap_curve(CFG, KEY)
    e1 = pricing.price_zbc(CFG, KEY, market)
    e8 = pricing.price_zbc(CFG, KEY, market, mesh=mesh)
    assert abs(float(e1.price) - float(e8.price)) < 1e-6
    assert abs(float(e1.beta) - float(e8.beta)) < 1e-4


def test_sharded_vega_matches_single(mesh):
    market = pricing.bootstrap_curve(CFG, KEY)
    v1 = float(pricing.pathwise_vega(CFG, KEY, market))
    v8 = float(pricing.pathwise_vega(CFG, KEY, market, mesh=mesh))
    assert abs(v1 - v8) < 1e-6


def test_sharded_scan_engine(mesh):
    m8 = pricing.bootstrap_curve(CFG, KEY, engine="scan", mesh=mesh)
    m1 = pricing.bootstrap_curve(CFG, KEY, engine="scan")
    np.testing.assert_allclose(np.asarray(m1.P), np.asarray(m8.P), rtol=1e-5)


def test_uneven_blocks_rejected(mesh):
    bad = tiny_config(n_paths=1 << 12, path_block=1 << 10)  # 4 blocks, 8 dev
    with pytest.raises(ValueError):
        pricing.bootstrap_curve(bad, KEY, mesh=mesh)


def test_jvp_vega_under_mesh(mesh):
    """Forward-mode AD must differentiate through shard_map + psum."""
    from hullwhite_tpu import greeks

    market = pricing.bootstrap_curve(CFG, KEY)
    _, v1 = greeks.jvp_vega(CFG, KEY, market)
    _, v8 = greeks.jvp_vega(CFG, KEY, market, mesh=mesh)
    assert abs(float(v1) - float(v8)) < 1e-6


@pytest.mark.slow
def test_sharded_bermudan_matches_single(mesh):
    """The Bermudan evaluation pass shards its block axis over the mesh:
    identical global block ids => identical per-block values, so the
    bracket must reproduce the single-device run (both iid and RQMC/
    shift-replicate SEs)."""
    from hullwhite_tpu import bermudan, instruments
    from hullwhite_tpu.models import oracles
    import jax.numpy as jnp

    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    market = __import__("hullwhite_tpu.models.hull_white",
                        fromlist=["MarketCurve"]).MarketCurve(
        P=jnp.asarray(P, jnp.float32),
        f=jnp.asarray(oracles.forward_rate(CFG, Ts), jnp.float32))
    sched = instruments.CouponSchedule(times=(6.0, 7.0, 8.0, 9.0),
                                       coupons=(0.025, 0.025, 0.025, 1.025))
    for rqmc in (False, True):
        r1 = bermudan.price_bermudan(CFG, KEY, market, sched, [5.0, 6.0],
                                     n_paths=1 << 12, n_blocks=8,
                                     rqmc=rqmc)
        r8 = bermudan.price_bermudan(CFG, KEY, market, sched, [5.0, 6.0],
                                     n_paths=1 << 12, n_blocks=8,
                                     rqmc=rqmc, mesh=mesh)
        np.testing.assert_allclose(float(r8.price), float(r1.price),
                                   rtol=2e-6)
        np.testing.assert_allclose(float(r8.upper), float(r1.upper),
                                   rtol=2e-6)
        np.testing.assert_allclose(float(r8.std_error),
                                   float(r1.std_error), rtol=1e-3)


@pytest.mark.slow
def test_sharded_g2_bermudan_matches_single(mesh):
    from hullwhite_tpu import instruments
    from hullwhite_tpu.models import g2pp, oracles
    import jax.numpy as jnp

    g = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    market = __import__("hullwhite_tpu.models.hull_white",
                        fromlist=["MarketCurve"]).MarketCurve(
        P=jnp.asarray(P, jnp.float32),
        f=jnp.asarray(oracles.forward_rate(CFG, Ts), jnp.float32))
    sched = instruments.CouponSchedule(times=(6.0, 7.0, 8.0, 9.0),
                                       coupons=(0.025, 0.025, 0.025, 1.025))
    r1 = g2pp.price_bermudan_g2(CFG, g, KEY, market, sched, [5.0, 6.0],
                                n_paths=1 << 12, n_blocks=8)
    r8 = g2pp.price_bermudan_g2(CFG, g, KEY, market, sched, [5.0, 6.0],
                                n_paths=1 << 12, n_blocks=8, mesh=mesh)
    # atol = one fp32 ulp at this price level: the round-4 57-column
    # proxy fit lands the sharded reduction order 1 ulp away
    np.testing.assert_allclose(float(r8.price), float(r1.price),
                               rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(float(r8.upper), float(r1.upper),
                               rtol=2e-6, atol=2e-7)


@pytest.mark.slow
def test_sharded_g2_and_cap_match_single(mesh):
    """Block-keyed G2++ ZBC/swaption/curve and HW cap pricers reproduce
    their single-device results under the 8-way mesh (same global block
    ids => same normals; only reduction order differs)."""
    from hullwhite_tpu import instruments
    from hullwhite_tpu.instruments import swap_fixed_leg
    from hullwhite_tpu.models import g2pp, hull_white as hw2, oracles
    import jax.numpy as jnp

    g = g2pp.G2Params(a=1.0, b=0.1, sigma=0.08, eta=0.02, rho=-0.6)
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    market = hw2.MarketCurve(
        P=jnp.asarray(P, jnp.float32),
        f=jnp.asarray(oracles.forward_rate(CFG, Ts), jnp.float32))

    z1 = g2pp.price_zbc_g2(CFG, g, KEY, market, n_paths=1 << 12,
                           n_blocks=8)
    z8 = g2pp.price_zbc_g2(CFG, g, KEY, market, n_paths=1 << 12,
                           n_blocks=8, mesh=mesh)
    np.testing.assert_allclose(float(z8.price), float(z1.price), rtol=1e-6)
    np.testing.assert_allclose(float(z8.beta), float(z1.beta), rtol=1e-5)

    sched = swap_fixed_leg(CFG, 0.025, 5.0)
    s1 = g2pp.price_swaption_g2(CFG, g, KEY, market, sched,
                                n_paths=1 << 12, n_blocks=8)
    s8 = g2pp.price_swaption_g2(CFG, g, KEY, market, sched,
                                n_paths=1 << 12, n_blocks=8, mesh=mesh)
    np.testing.assert_allclose(float(s8.price), float(s1.price), rtol=1e-6)

    c1 = g2pp.bootstrap_curve_g2(CFG, g, KEY, market, n_paths=1 << 12,
                                 n_blocks=8)
    c8 = g2pp.bootstrap_curve_g2(CFG, g, KEY, market, n_paths=1 << 12,
                                 n_blocks=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c8.P), np.asarray(c1.P),
                               rtol=1e-6)

    k1 = instruments.price_cap(CFG, KEY, market, rate=0.02, tenor=4.0,
                               n_paths=1 << 12, n_blocks=8)
    k8 = instruments.price_cap(CFG, KEY, market, rate=0.02, tenor=4.0,
                               n_paths=1 << 12, n_blocks=8, mesh=mesh)
    np.testing.assert_allclose(float(k8.price), float(k1.price), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k8.caplets),
                               np.asarray(k1.caplets), rtol=1e-5)


@pytest.mark.slow
def test_sharded_exotics_match_single(mesh):
    """CMS spread, range accrual and the puttable note: mesh == single
    (blocks key on the global index)."""
    import math

    from hullwhite_tpu import instruments, range_note
    from hullwhite_tpu.models import hull_white as hw
    from hullwhite_tpu.models import oracles
    import jax.numpy as jnp

    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    market = hw.MarketCurve(
        P=jnp.asarray([oracles.bond_price(CFG, T) for T in Ts], jnp.float32),
        f=jnp.asarray(oracles.forward_rate(CFG, Ts), jnp.float32))
    kw = dict(n_paths=512, n_blocks=8)
    s1 = instruments.price_cms_spread(CFG, KEY, market, strike=0.002,
                                      tenor=2.0, long_tenor=4.0,
                                      short_tenor=1.0, **kw)
    s8 = instruments.price_cms_spread(CFG, KEY, market, strike=0.002,
                                      tenor=2.0, long_tenor=4.0,
                                      short_tenor=1.0, mesh=mesh, **kw)
    assert abs(float(s1.price) - float(s8.price)) < 1e-6
    r1 = instruments.price_range_accrual(CFG, KEY, market, coupon=0.03,
                                         lo=0.01, hi=0.022, tenor=3.0, **kw)
    r8 = instruments.price_range_accrual(CFG, KEY, market, coupon=0.03,
                                         lo=0.01, hi=0.022, tenor=3.0,
                                         mesh=mesh, **kw)
    assert abs(float(r1.price) - float(r8.price)) < 1e-6
    # fixed boundaries: skip the fp64 DP here, the policy is arbitrary
    b = (0.018, -math.inf)
    n1 = range_note.price_range_note(CFG, KEY, market, coupon=0.03,
                                     lo=0.01, hi=0.022, tenor=3.0,
                                     boundaries=b, **kw)
    n8 = range_note.price_range_note(CFG, KEY, market, coupon=0.03,
                                     lo=0.01, hi=0.022, tenor=3.0,
                                     boundaries=b, mesh=mesh, **kw)
    assert abs(float(n1.price) - float(n8.price)) < 1e-6


def test_16_device_mesh_in_subprocess():
    """Core trio certified sharded==single on a 16-device virtual mesh
    (round-5, VERDICT r4 #8): flushes shape/divisibility assumptions
    beyond the recorded 8-device default.  Runs in a subprocess because
    the device count is fixed at backend init in this process."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 16)
import numpy as np
from hullwhite_tpu import tiny_config, pricing
from hullwhite_tpu.parallel import mesh as pmesh
assert len(jax.devices()) == 16
mesh = pmesh.path_mesh()
cfg = tiny_config(n_paths=2 * 16 * 256, path_block=256, n_steps=100,
                  n_mat=11)
key = jax.random.key(3)
m1 = pricing.bootstrap_curve(cfg, key)
m16 = pricing.bootstrap_curve(cfg, key, mesh=mesh)
d = float(np.max(np.abs(np.asarray(m16.P, np.float64)
                        - np.asarray(m1.P, np.float64))))
assert d < 1e-6, d
e1 = pricing.price_zbc(cfg, key, m1)
e16 = pricing.price_zbc(cfg, key, m1, mesh=mesh)
assert abs(float(e16.price) - float(e1.price)) < 1e-6
v1 = pricing.pathwise_vega(cfg, key, m1)
v16 = pricing.pathwise_vega(cfg, key, m1, mesh=mesh)
assert abs(float(v16) - float(v1)) < 1e-6
bad = tiny_config(n_paths=24 * 256, path_block=256, n_steps=100,
                  n_mat=11)  # 24 blocks over 16 devices: uneven
try:
    pricing.bootstrap_curve(bad, key, mesh=mesh)
    raise SystemExit("uneven blocks not rejected at 16 devices")
except ValueError:
    pass
print("16-device certification OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # use jax_num_cpu_devices, not flags
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", script], cwd=repo,
                         env=env, capture_output=True, text=True,
                         timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "16-device certification OK" in out.stdout
