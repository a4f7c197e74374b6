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
    # top 23 bits -> (0,1): u = (d >> 9) * 2^-23 + 2^-24, whose extremes
    # 2^-24 and 1 - 2^-24 are exactly representable in fp32.  (A 24-bit
    # variant rounds its max 1 - 2^-25 to exactly 1.0 under round-to-even,
    # which ndtri maps to +inf — observed ~once per 2^25 draws.)
    return (pts >> 9).astype(jnp.float32) * jnp.float32(2.0 ** -23) + \
        jnp.float32(2.0 ** -24)


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
    if n_shifts < 2:
        raise ValueError("n_shifts must be >= 2 for a valid standard error")
    if sigma is None:
        sigma = cfg.sigma
    mean, se, vals = _qmc_fn(cfg, n_points, n_shifts, "price")(
        key, jnp.asarray(sigma, jnp.float32), market)
    return QMCResult(mean, se, n_points, n_shifts, vals)


def vega_zbc_qmc(cfg: HWConfig, key, market: MarketCurve, *, sigma=None,
                 n_points: int = 1 << 16, n_shifts: int = 8) -> QMCResult:
    """RQMC pathwise vega (dual-process integrand on the Sobol points)."""
    if n_shifts < 2:
        raise ValueError("n_shifts must be >= 2 for a valid standard error")
    if sigma is None:
        sigma = cfg.sigma
    mean, se, vals = _qmc_fn(cfg, n_points, n_shifts, "vega")(
        key, jnp.asarray(sigma, jnp.float32), market)
    return QMCResult(mean, se, n_points, n_shifts, vals)


# ---------------------------------------------------------------------------
# Q1 curve via PCA-ordered RQMC
# ---------------------------------------------------------------------------
# The 100-d checkpoint Gaussian concentrates in its leading principal
# components (PC1+PC2 = 95.8%, PC1..8 = 99.8% of variance for the standard
# config), so a PCA construction assigns the low-discrepancy coordinates of
# an n_qmc-dimensional scrambled Sobol sequence (ops/sobol.py, direction
# numbers from first principles) to the highest-variance directions and
# fills the tail dimensions with plain MC normals.  Every randomization
# keeps the estimator unbiased with a valid shift-replicate SE.
# Measured per-maturity SE reduction vs plain MC at 2^12 points:
# n_qmc=8 -> 10x, n_qmc=32 -> 31x (default).


@lru_cache(maxsize=None)
def _curve_pca(cfg: HWConfig):
    """B with B B^T = Ws^T Ws, columns ordered by descending eigenvalue.
    Returns fp32 B^T for z = x @ B^T."""
    Ws = np.asarray(engine_linear._curve_shape(cfg), np.float64)[:, 1:]
    C = Ws.T @ Ws
    lam, U = np.linalg.eigh(C)
    order = np.argsort(lam)[::-1]
    B = U[:, order] * np.sqrt(np.maximum(lam[order], 0.0))[None, :]
    return np.asarray(B.T, np.float32)  # (k, k): row j = PC j direction


@lru_cache(maxsize=None)
def _curve_qmc_fn(cfg: HWConfig, n_points: int, n_shifts: int, n_qmc: int):
    from . import sobol as sobol_mod

    dtype = jnp.dtype(cfg.dtype)
    k = cfg.n_mat - 1

    def one_shift(key, sigma):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, dtype)
        BT = tables.sig_st * jnp.asarray(_curve_pca(cfg))
        cw = engine_exact.curve_weights(cfg, tables)   # for c only
        k_s, k_mc = jax.random.split(key)
        shift = jax.random.bits(k_s, (n_qmc,), jnp.uint32)
        u = sobol_mod.sobol(n_points, n_qmc, shift)
        x_q = jax.scipy.special.ndtri(u)               # (n, n_qmc)
        if n_qmc < k:
            x_mc = jax.random.normal(k_mc, (n_points, k - n_qmc), dtype)
            x = jnp.concatenate([x_q, x_mc], axis=1)
        else:
            x = x_q[:, :k]
        z = jnp.dot(x, BT, preferred_element_type=jnp.float32,
                    precision=cfg.matmul_precision)
        c = cw.c[1:][None, :]
        contrib = jnp.exp(-(c + z)) + jnp.exp(-(c - z))
        return jnp.sum(contrib, axis=0) / (2.0 * n_points)

    def compute(key, sigma):
        keys = jax.random.split(key, n_shifts)
        Ps = jax.lax.map(lambda kk: one_shift(kk, sigma), keys)  # (s, k)
        mean = jnp.mean(Ps, axis=0)
        se = jnp.std(Ps, axis=0, ddof=1) / jnp.sqrt(1.0 * n_shifts)
        one = jnp.ones((n_shifts, 1), jnp.float32)
        return (jnp.concatenate([jnp.ones((1,)), mean]),
                jnp.concatenate([jnp.zeros((1,)), se]),
                jnp.concatenate([one, Ps], axis=1))

    return jax.jit(compute)


class CurveQMC(NamedTuple):
    market: MarketCurve
    std_error: jax.Array   # (n_mat,) per-maturity SE over shifts
    n_points: int
    n_shifts: int


def bootstrap_curve_qmc(cfg: HWConfig, key, *, sigma=None,
                        n_points: int = 1 << 16, n_shifts: int = 8,
                        n_qmc: int = 32) -> CurveQMC:
    """Q1 curve bootstrap with PCA-ordered RQMC (antithetic).

    ``n_qmc`` leading principal components get Sobol coordinates; the rest
    are plain MC (clamped to the state dimension n_mat - 1)."""
    if n_shifts < 2:
        raise ValueError("n_shifts must be >= 2 for a valid standard error")
    n_qmc = max(1, min(n_qmc, cfg.n_mat - 1))
    if sigma is None:
        sigma = cfg.sigma
    P, se, _ = _curve_qmc_fn(cfg, n_points, n_shifts, n_qmc)(
        key, jnp.asarray(sigma, jnp.float32))
    market = MarketCurve(P=P, f=hw.forward_from_p(cfg, P))
    return CurveQMC(market=market, std_error=se, n_points=n_points,
                    n_shifts=n_shifts)
