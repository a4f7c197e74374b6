"""n-dimensional Sobol sequence, self-contained.

Direction numbers are built from first principles rather than shipped
tables: primitive polynomials over GF(2) are enumerated programmatically
(a degree-d polynomial is primitive iff x has multiplicative order
2^d - 1 in GF(2)[x]/(p)), and the free initial direction integers m_i are
drawn as random odd integers < 2^i from a fixed seed — any such choice
yields a valid digital (t, s)-net in base 2; optimized tables (Joe-Kuo)
only lower the quality parameter t.  A per-replicate random digital shift
(XOR) makes every estimator unbiased with a valid standard error.

Dimension 1 is the bit-reversed van der Corput sequence; dimension 2
matches the classic x+1 recurrence used by ops/qmc.sobol2.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

N_BITS = 32
_INIT_SEED = 0x5EED  # fixed: direction numbers are part of the spec


def _poly_order_is_primitive(poly: int, d: int, factors) -> bool:
    """Is ``poly`` (bitmask, degree d, implicit x^d term included) primitive?
    Checks x^(2^d-1) == 1 and x^((2^d-1)/q) != 1 for every prime q."""
    n = (1 << d) - 1

    def mulmod(a, b):
        # multiply in GF(2)[x] mod poly (both < 2^d after reduction)
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a >> d & 1:
                a ^= poly
        return r

    def powx(e):
        base, r = 2, 1  # x, 1
        while e:
            if e & 1:
                r = mulmod(r, base)
            base = mulmod(base, base)
            e >>= 1
        return r

    if powx(n) != 1:
        return False
    return all(powx(n // q) != 1 for q in factors)


def _prime_factors(n: int):
    out = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.add(d)
            n //= d
        d += 1
    if n > 1:
        out.add(n)
    return sorted(out)


@lru_cache(maxsize=None)
def _primitive_polys(count: int):
    """First ``count`` primitive polynomials over GF(2) by (degree, value).
    Returned as (degree, coeff_bits) with coeff_bits including x^d and 1."""
    polys = []
    d = 1
    while len(polys) < count:
        factors = _prime_factors((1 << d) - 1)
        # candidates: x^d + ... + 1 (constant term required)
        for mid in range(1 << max(d - 1, 0)):
            poly = (1 << d) | (mid << 1) | 1
            if d == 1 or _poly_order_is_primitive(poly, d, factors):
                polys.append((d, poly))
                if len(polys) >= count:
                    break
        d += 1
    return tuple(polys)


@lru_cache(maxsize=None)
def direction_numbers(dims: int):
    """(dims, N_BITS) uint32 MSB-aligned direction integers.

    dim 0: van der Corput (v_k = 2^(31-k)); dims >= 1 use the Sobol
    recurrence for the (dim)-th primitive polynomial with random odd
    initial values from the fixed seed.
    """
    rng = np.random.default_rng(_INIT_SEED)
    V = np.zeros((dims, N_BITS), np.uint32)
    V[0] = [np.uint32(1) << (N_BITS - 1 - k) for k in range(N_BITS)]
    polys = _primitive_polys(dims - 1) if dims > 1 else ()
    for j, (d, poly) in enumerate(polys, start=1):
        a = [(poly >> (d - t)) & 1 for t in range(1, d)]  # a_1..a_{d-1}
        m = [1] + [int(rng.integers(0, 1 << (i - 1)) * 2 + 1)
                   for i in range(2, d + 1)]
        # ensure m_i odd and < 2^i (m_1 = 1)
        mlist = list(m)
        for k in range(d, N_BITS):
            new = mlist[k - d] ^ (mlist[k - d] << d)
            for t in range(1, d):
                if a[t - 1]:
                    new ^= mlist[k - t] << t
            mlist.append(new & 0xFFFFFFFF)
        V[j] = [np.uint32(mlist[k] << (N_BITS - 1 - k)) & np.uint32(0xFFFFFFFF)
                for k in range(N_BITS)]
    return V


def sobol(n: int, dims: int, shift):
    """First n Sobol points in ``dims`` dimensions with a digital shift.

    shift: (dims,) uint32.  Returns (n, dims) float32 in (0, 1).
    """
    V = jnp.asarray(direction_numbers(dims))  # (dims, 32)
    i = jnp.arange(n, dtype=jnp.uint32)
    out = jnp.zeros((n, dims), jnp.uint32)
    for k in range(max(int(n - 1).bit_length(), 1)):
        bit = ((i >> k) & jnp.uint32(1)).astype(bool)
        out = out ^ jnp.where(bit[:, None], V[:, k][None, :], jnp.uint32(0))
    out = out ^ jnp.asarray(shift, jnp.uint32)[None, :]
    # top 23 bits -> (0,1): u = (d >> 9) * 2^-23 + 2^-24, whose extremes
    # 2^-24 and 1 - 2^-24 are exactly representable in fp32.  (A 24-bit
    # variant rounds its max 1 - 2^-25 to exactly 1.0 under round-to-even,
    # which ndtri maps to +inf — observed ~once per 2^25 draws.)
    return (out >> 9).astype(jnp.float32) * jnp.float32(2.0 ** -23) + \
        jnp.float32(2.0 ** -24)
