"""Randomized quasi-Monte Carlo (2-d scrambled Sobol) for the option leg.

A capability beyond the CUDA reference, enabled by the exact functional
engine: since (r(S1), int r ds) is exactly a 2-d Gaussian (engine_exact),
the ZBC price and its vega are 2-dimensional integrals — the ideal QMC
regime (cf. "Quasi-Monte Carlo methods for calculating derivatives
sensitivities on the GPU", PAPERS.md).  We use the first two Sobol
dimensions with a random digital shift (XOR scrambling) per replicate:

* dim 1: van der Corput base 2 = bit-reversal of the index;
* dim 2: direction numbers from the degree-1 primitive polynomial x+1 via
  the Sobol recurrence m_k = (2 m_{k-1}) XOR m_{k-1}  ->  1,3,5,15,17,51,...

Each random shift gives an unbiased estimator; averaging ``n_shifts``
replicates yields both the price and a valid standard error.  Convergence
is ~O(N^-1) on the smooth part of the payoff vs O(N^-1/2) for MC.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HWConfig
from ..models import hull_white as hw
from ..models.hull_white import MarketCurve
from ..ops import engine_exact, engine_linear

N_BITS = 32


@lru_cache(maxsize=1)
def _dim2_directions():
    """V2[k] = direction integers (as uint32, MSB-aligned) for Sobol dim 2."""
    m = [1]
    for _ in range(1, N_BITS):
        prev = m[-1]
        m.append((prev << 1) ^ prev)
    # v_k = m_k * 2^{32-k}  (m_k has k bits)
    v = np.array([mk << (N_BITS - 1 - k) for k, mk in enumerate(m)],
                 dtype=np.uint32)
    return v


def _bit_reverse32(x):
    """Vectorized 32-bit reversal (van der Corput / Sobol dim 1)."""
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return (x << 16) | (x >> 16)


def sobol2(n: int, shift: jax.Array):
    """First-n 2-d Sobol points with digital shift; uniforms in (0,1).

    shift: (2,) uint32 random digital shift (XORed into the digits).
    Returns (n, 2) float32.
    """
    i = jnp.arange(n, dtype=jnp.uint32)
    d1 = _bit_reverse32(i)
    v2 = jnp.asarray(_dim2_directions())
    d2 = jnp.zeros_like(i)
    for k in range(int(n - 1).bit_length()):
        bit = (i >> k) & jnp.uint32(1)
        d2 = d2 ^ jnp.where(bit.astype(bool), v2[k], jnp.uint32(0))
    pts = jnp.stack([d1 ^ shift[0], d2 ^ shift[1]], axis=1)
    # top 24 bits -> (0,1), centered to avoid exact 0/1
    return (pts >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24) + \
        jnp.float32(2.0 ** -25)


class QMCResult(NamedTuple):
    value: jax.Array       # mean over shifts
    std_error: jax.Array   # SE over shift replicates
    n_points: int
    n_shifts: int
    per_shift: jax.Array   # (n_shifts,)


@lru_cache(maxsize=None)
def _qmc_fn(cfg: HWConfig, n_points: int, n_shifts: int, what: str):
    dtype = jnp.dtype(cfg.dtype)

    def one_shift(shift, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, dtype)
        zw = engine_exact.zbc_weights(cfg, tables)
        u = sobol2(n_points, shift)
        x = jax.scipy.special.ndtri(u)             # (n, 2) std normals
        if what == "price":
            st = engine_exact.antithetic_state(cfg, zw, x)
            # QMC points are balanced; use the +/- pair anyway (free, and
            # keeps the estimator identical in law to the MC one)
            P_p = hw.p_bond(cfg, sigma, market, cfg.s1, cfg.s2, st.r_p)
            P_m = hw.p_bond(cfg, sigma, market, cfg.s1, cfg.s2, st.r_m)
            x_p = jnp.exp(-st.i_p) * jnp.maximum(P_p - cfg.strike, 0.0)
            x_m = jnp.exp(-st.i_m) * jnp.maximum(P_m - cfg.strike, 0.0)
            return 0.5 * (jnp.mean(x_p) + jnp.mean(x_m))
        elif what == "vega":
            from ..ops import payoffs

            st = engine_exact.dual_state(cfg, zw, x)
            sums = payoffs.vega_sum(cfg, sigma, market, st)
            return sums[0] / sums[1]
        raise ValueError(what)

    def compute(key, sigma, market):
        shifts = jax.random.bits(key, (n_shifts, 2), jnp.uint32)
        vals = jax.lax.map(lambda s: one_shift(s, sigma, market), shifts)
        mean = jnp.mean(vals)
        se = jnp.std(vals, ddof=1) / jnp.sqrt(1.0 * n_shifts)
        return mean, se, vals

    return jax.jit(compute)


def price_zbc_qmc(cfg: HWConfig, key, market: MarketCurve, *, sigma=None,
                  n_points: int = 1 << 16, n_shifts: int = 8) -> QMCResult:
    """RQMC ZBC price with a valid SE from shift replicates."""
    if sigma is None:
        sigma = cfg.sigma
    mean, se, vals = _qmc_fn(cfg, n_points, n_shifts, "price")(
        key, jnp.asarray(sigma, jnp.float32), market)
    return QMCResult(mean, se, n_points, n_shifts, vals)


def vega_zbc_qmc(cfg: HWConfig, key, market: MarketCurve, *, sigma=None,
                 n_points: int = 1 << 16, n_shifts: int = 8) -> QMCResult:
    """RQMC pathwise vega (dual-process integrand on the Sobol points)."""
    if sigma is None:
        sigma = cfg.sigma
    mean, se, vals = _qmc_fn(cfg, n_points, n_shifts, "vega")(
        key, jnp.asarray(sigma, jnp.float32), market)
    return QMCResult(mean, se, n_points, n_shifts, vals)
