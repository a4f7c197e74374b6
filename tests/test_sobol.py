"""General n-dim Sobol generator: net properties, primitivity of the
generated polynomials, and the fp32 endpoint-rounding regression."""

import numpy as np
import jax
import jax.numpy as jnp

from hullwhite_tpu.ops import sobol, qmc


def test_primitive_polys_are_primitive():
    """Every generated polynomial must be primitive: x has full order."""
    for d, poly in sobol._primitive_polys(40):
        n = (1 << d) - 1
        factors = sobol._prime_factors(n)
        if d > 1:
            assert sobol._poly_order_is_primitive(poly, d, factors), (d, poly)
        assert poly & 1, "constant term required"
        assert poly >> d == 1, "leading term required"


def test_one_dim_stratification_all_dims():
    n = 1 << 10
    pts = np.asarray(sobol.sobol(n, 24, np.zeros(24, np.uint32)))
    for d in range(24):
        b = np.bincount((pts[:, d] * n).astype(int), minlength=n)
        assert b.max() == 1, d


def test_matches_sobol2_dims_12():
    p2 = np.asarray(qmc.sobol2(512, jnp.zeros(2, jnp.uint32)))
    pn = np.asarray(sobol.sobol(512, 2, np.zeros(2, np.uint32)))
    np.testing.assert_array_equal(p2, pn)


def test_uniform_endpoints_ndtri_finite():
    """Regression: 24-bit uniforms rounded 1-2^-25 to exactly 1.0 in fp32
    (round-to-even), sending ndtri to +inf ~once per 2^25 draws.  The
    all-ones digit word must map strictly inside (0,1)."""
    shift = jnp.asarray([0xFFFFFFFF, 0xFFFFFFFF], jnp.uint32)
    u = sobol.sobol(4, 2, shift)  # point 0 becomes all-ones digits
    assert float(jnp.max(u)) < 1.0
    assert float(jnp.min(u)) > 0.0
    assert bool(jnp.isfinite(jax.scipy.special.ndtri(u)).all())
    u2 = qmc.sobol2(4, shift)
    assert float(jnp.max(u2)) < 1.0
    assert bool(jnp.isfinite(jax.scipy.special.ndtri(u2)).all())


def test_digital_shift_preserves_stratification():
    n = 1 << 8
    shift = jax.random.bits(jax.random.key(3), (8,), jnp.uint32)
    pts = np.asarray(sobol.sobol(n, 8, shift))
    for d in range(8):
        b = np.bincount((pts[:, d] * n).astype(int), minlength=n)
        assert b.max() == 1
