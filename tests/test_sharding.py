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
