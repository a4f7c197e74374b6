"""Fused Pallas TPU kernels: on-chip RNG -> Box-Muller -> (matmul) -> payoff
-> on-chip reduction, with zero HBM traffic for the Gaussian field.

This tier replaces the reference's hand-tuned CUDA reduction kernels
(warp shuffle -> shared memory -> atomicAdd hierarchy, common.cuh:260-408,
SURVEY C14-C19): each grid step generates its path tile's randomness with
the core PRNG (``pltpu.prng_random_bits``), transforms it in VMEM, reduces
over the tile with VPU tree sums, and accumulates into a VMEM output block
that persists across the sequential TPU grid — the moral equivalent of
"one atomicAdd per block", except the grid is sequential so there is no
atomicity to worry about at all.

Why fused matters on TPU: materializing G = (2^20, 1000) Gaussians in HBM
costs ~8.4 GB of traffic (measured ~40-55 ms on v5e); generating them
in-kernel drops the whole Q1 simulation to ~24 ms — and the Box-Muller
transcendentals then dominate, which is what the ``*_exact`` kernel
variants attack (Cholesky functional sampling, see ops/engine_exact.py:
10x-250x fewer normals for identical estimator law).

Each product exposes a ``*_local_fn(cfg, ...) -> local_fn(key, base_block,
n_blocks)`` factory with the same contract as the XLA block loop in
``pricing._block_loop``, so ``parallel.mesh.shard_blocks`` can shard the
grid over a device mesh with psum combines unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HWConfig
from ..models import hull_white as hw
from ..ops import engine_exact, engine_linear

PAD = 128          # lane padding for maturity/functional axes
SEED_STRIDE = 1000003  # odd stride decorrelating per-tile PRNG seeds

# Path-tile sizes (paths per grid step). Fullstep kernels hold a
# (TILE, n_steps) Gaussian tile in VMEM; exact kernels hold (TILE, 128).
TILE_FULL = 512
TILE_EXACT = 1024  # curve kernels: paths per BM half-tile
TILE_OPT = 256     # option exact kernels: (TILE_OPT, 128) paths per step


def _seed_tile(seed_ref):
    """Seed the core PRNG uniquely per (key, global tile)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + (seed_ref[2] + i) * SEED_STRIDE, seed_ref[1])


def _uniform(shape):
    """U[1, 2) from raw bits via the mantissa trick (cast-free)."""
    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast((b >> 9) | jnp.uint32(0x3F800000), jnp.float32)


# Taylor coefficients of cos(pi x) / sin(pi x) on |x| <= 1 (Horner order).
# Mosaic's general-range sin/cos dominate Box-Muller cost (measured: 2.6x
# whole-kernel speedup from this bounded-range polynomial: 56 -> 149 G
# normals/s on v5e).  Truncation error (verified numerically on |x| <= 1):
# cos 1.4e-7, sin 7.7e-7 — below fp32 evaluation noise.
_PI = np.pi
_COS_K = [1.0, -_PI**2 / 2, _PI**4 / 24, -_PI**6 / 720, _PI**8 / 40320,
          -_PI**10 / 3628800, _PI**12 / 479001600, -_PI**14 / 87178291200,
          _PI**16 / 20922789888000]
_SIN_K = [_PI, -_PI**3 / 6, _PI**5 / 120, -_PI**7 / 5040, _PI**9 / 362880,
          -_PI**11 / 39916800, _PI**13 / 6227020800,
          -_PI**15 / 1307674368000]


def _cospi_sinpi(x):
    """(cos(pi x), sin(pi x)) for x in [-1, 1)."""
    x2 = x * x
    c = _COS_K[8]
    for k in range(7, -1, -1):
        c = c * x2 + _COS_K[k]
    s = _SIN_K[7]
    for k in range(6, -1, -1):
        s = s * x2 + _SIN_K[k]
    return c, s * x


def _box_muller(shape):
    """Two independent N(0,1) fields of ``shape``.

    Radius from the builtin log (fast on Mosaic); angle trig from the
    bounded-range polynomial above.  24-bit uniforms truncate the tails at
    |z| <= sqrt(-2 ln 2^-24) ~ 5.8 (P ~ 1e-8/draw — same granularity class
    as cuRAND's fp32 normal).  Device-verified moments: mean 0 +/- SE,
    std 0.9997, kurtosis 2.992 on 2^20 samples.
    """
    u1 = 2.0 - _uniform(shape)       # (0, 1] — safe for log
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = _cospi_sinpi(2.0 * _uniform(shape) - 3.0)   # x in [-1, 1)
    return rad * c, rad * s


def _key_seed(key, base_block: jax.Array, salt: int):
    """(3,) int32 [seed0, seed1, base_tile] derived from a JAX PRNG key."""
    kd = jax.random.key_data(jax.random.fold_in(key, salt)).reshape(-1)[:2]
    s = jax.lax.bitcast_convert_type(kd, jnp.int32)
    base = jnp.asarray(base_block, jnp.int32).reshape(1)
    return jnp.concatenate([s, base])


def _dot(a, b, prec="highest"):
    """Mosaic supports only DEFAULT (one bf16 MXU pass) and HIGHEST (six
    passes = true fp32).  DEFAULT's bf16 rounding of the Gaussians is
    mean-zero and adds O(1e-6) relative bias to exp(-I) — far below MC
    noise — at ~20% less Q1 wall time; "highest" stays the default."""
    precision = (jax.lax.Precision.HIGHEST if prec == "highest"
                 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _pallas_sum(cfg: HWConfig, kernel, grid, args, out_rows):
    """Common pallas_call shape: SMEM seeds + VMEM operands -> accumulated
    (out_rows, PAD) float32 output."""
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args[1:]
    ]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, PAD), jnp.float32),
        interpret=(pltpu.InterpretParams()
                   if cfg.pallas_interpret else False),
    )(*args)


# ---------------------------------------------------------------------------
# Q1: curve discount sums
# ---------------------------------------------------------------------------

def _curve_kernel(seed_ref, w_ref, c_ref, out_ref, *, n_steps, prec):
    """Fullstep: G (TILE, n_steps) ~ BM; I = c +/- G @ W; accumulate
    sum exp(-I) per maturity column."""
    _seed_tile(seed_ref)
    z0, z1 = _box_muller((TILE_FULL, n_steps // 2))
    G = jnp.concatenate([z0, z1], axis=1)
    z = _dot(G, w_ref[:], prec)
    # antithetic pair via one exp + one reciprocal:
    #   exp(-(c+z)) + exp(-(c-z)) = exp(-c) * (t + 1/t),  t = exp(-z)
    t = jnp.exp(-z)
    contrib = jnp.sum(t + pl.reciprocal(t, approx=False), axis=0)
    contrib = contrib * jnp.exp(-c_ref[0, :])

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += contrib


def _curve_exact_kernel(seed_ref, w_ref, c_ref, out_ref, *, prec):
    """Exact: two tiles of paths per step, each row = 128 std normals,
    z = X @ (sig_st L^T) (zero-padded), I = c +/- z."""
    _seed_tile(seed_ref)
    z0, z1 = _box_muller((TILE_EXACT, PAD))
    X = jnp.concatenate([z0, z1], axis=0)          # (2*TILE, PAD)
    z = _dot(X, w_ref[:], prec)
    t = jnp.exp(-z)
    contrib = jnp.sum(t + pl.reciprocal(t, approx=False), axis=0)
    contrib = contrib * jnp.exp(-c_ref[0, :])

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += contrib


def curve_local_fn(cfg: HWConfig, tables, exact: bool):
    nm = cfg.n_mat
    if nm - 1 > PAD:
        raise ValueError("n_mat - 1 must be <= 128 for the fused kernels")
    dtype = jnp.float32

    if exact:
        LT = np.zeros((PAD, PAD), np.float32)
        LT[: nm - 1, : nm - 1] = engine_exact.curve_chol(cfg)
        W = tables.sig_st * jnp.asarray(LT)
        cw = engine_exact.curve_weights(cfg, tables)
        c_pad = jnp.zeros((1, PAD), dtype).at[0, : nm - 1].set(cw.c[1:])
        from functools import partial

        paths_per_tile = 2 * TILE_EXACT
        kernel = partial(_curve_exact_kernel, prec=cfg.matmul_precision)
    else:
        if cfg.n_steps % 2 != 0:
            raise ValueError("n_steps must be even for Box-Muller pairing")
        Wsh = np.zeros((cfg.n_steps, PAD), np.float32)
        Wsh[:, :nm] = engine_linear._curve_shape(cfg)
        W = tables.sig_st * jnp.asarray(Wsh)
        cw = engine_linear.curve_weights(cfg, tables)
        c_pad = jnp.zeros((1, PAD), dtype).at[0, :nm].set(cw.c)
        paths_per_tile = TILE_FULL
        from functools import partial

        kernel = partial(_curve_kernel, n_steps=cfg.n_steps,
                         prec=cfg.matmul_precision)

    def local_fn(key, base_block, n_blocks):
        local_paths = n_blocks * cfg.path_block
        if cfg.path_block % paths_per_tile != 0:
            raise ValueError(
                f"path_block must be a multiple of {paths_per_tile}")
        tiles_per_block = cfg.path_block // paths_per_tile
        seeds = _key_seed(key, base_block * tiles_per_block, salt=101)
        out = _pallas_sum(cfg, kernel, local_paths // paths_per_tile,
                          (seeds, W, c_pad), out_rows=1)[0]
        if exact:
            return jnp.concatenate(
                [jnp.full((1,), 2.0 * local_paths, dtype), out[: nm - 1]])
        return out[:nm].at[0].set(2.0 * local_paths)

    return local_fn


# ---------------------------------------------------------------------------
# Q2b: ZBC control-variate moments;  Q3: pathwise vega
# ---------------------------------------------------------------------------
# consts layout (SMEM): [c_r, c_I, A, B, K, P0S2, c_dr, c_dI, sigma, q]
#   P(S1,S2) = A exp(-B r);  dP/dsigma = -P B (q + dr)  with
#   q = sigma/(2a)(1 - e^{-2 a S1}) B  (models/hull_white.dp_bond_dsigma).

def _zbc_consts(cfg: HWConfig, tables, market, sigma):
    A = hw.a_hw(cfg, sigma, market, cfg.s1, cfg.s2)
    B = hw.b_func(cfg.s1, cfg.s2, cfg.a)
    q = sigma / (2.0 * cfg.a) * (1.0 - jnp.exp(-2.0 * cfg.a * cfg.s1)) * B
    zw = engine_linear.zbc_weights(cfg, tables)
    return jnp.stack([
        zw.det[0], zw.det[1], A, jnp.asarray(B, jnp.float32),
        jnp.asarray(cfg.strike, jnp.float32), market.P[-1],
        zw.det[2], zw.det[3], jnp.asarray(sigma, jnp.float32), q,
    ]).astype(jnp.float32)


def _legs_pair(consts_ref, z_r, z_i):
    """Payoff X and centered control Yc for BOTH antithetic legs, sharing
    one exp per process:  P(+/-) = A e^{-B c_r} t_r^{+/-1},
    disc(+/-) = e^{-c_I} t_i^{+/-1}."""
    c_r, c_i = consts_ref[0], consts_ref[1]
    A, B, K, P0S2 = (consts_ref[2], consts_ref[3], consts_ref[4],
                     consts_ref[5])
    t_r = jnp.exp(-B * z_r)
    t_i = jnp.exp(-z_i)
    P_base = A * jnp.exp(-B * c_r)
    d_base = jnp.exp(-c_i)
    out = []
    for tr, ti in ((t_r, t_i),
                   (pl.reciprocal(t_r, approx=False),
                    pl.reciprocal(t_i, approx=False))):
        P = P_base * tr
        disc = d_base * ti
        out.append((disc * jnp.maximum(P - K, 0.0), disc * P - P0S2))
    (xa, ya), (xb, yb) = out
    return xa, ya, xb, yb


def _moment_accum(out_ref, x1, y1, x2, y2, count):
    rows = [
        x1 + x2, y1 + y2,
        x1 * x1 + x2 * x2, y1 * y1 + y2 * y2,
        x1 * y1 + x2 * y2,
    ]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for j, v in enumerate(rows):
        out_ref[j, :] += jnp.sum(v, axis=0)
    # count spread across the lane row (scalar VMEM stores are unsupported)
    out_ref[5, :] += jnp.full((PAD,), count / PAD, jnp.float32)


def _moment_accum_scalar(out_ref, x1, y1, x2, y2, count):
    """Variant for kernels whose leg values are (TILE, 1): reduce to scalars
    and spread across the lane row so the caller's lane-sum recovers them."""
    rows = [
        x1 + x2, y1 + y2,
        x1 * x1 + x2 * x2, y1 * y1 + y2 * y2,
        x1 * y1 + x2 * y2,
    ]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for j, v in enumerate(rows):
        out_ref[j, :] += jnp.full((PAD,), jnp.sum(v) / PAD, jnp.float32)
    out_ref[5, :] += jnp.full((PAD,), count / PAD, jnp.float32)



def _zbc_exact_kernel(seed_ref, consts_ref, out_ref):
    _seed_tile(seed_ref)
    x1, x2 = _box_muller((TILE_OPT, PAD))
    l11, l21, l22 = consts_ref[10], consts_ref[11], consts_ref[12]
    z_r = l11 * x1
    z_i = l21 * x1 + l22 * x2
    xa, ya, xb, yb = _legs_pair(consts_ref, z_r, z_i)
    _moment_accum(out_ref, xa, ya, xb, yb, 2.0 * TILE_OPT * PAD)


def _zbc_full_kernel(seed_ref, u_ref, consts_ref, out_ref, *, n1, prec):
    _seed_tile(seed_ref)
    z0, z1 = _box_muller((TILE_FULL, (n1 + 1) // 2))
    G = jnp.concatenate([z0, z1], axis=1)[:, :n1]
    z = _dot(G, u_ref[:], prec)
    z_r, z_i = z[:, 0:1], z[:, 1:2]
    xa, ya, xb, yb = _legs_pair(consts_ref, z_r, z_i)
    _moment_accum_scalar(out_ref, xa, ya, xb, yb, 2.0 * TILE_FULL)


def _vega_terms(consts_ref, r, i_r, dr, di):
    A, B, K = consts_ref[2], consts_ref[3], consts_ref[4]
    q = consts_ref[9]
    P = A * jnp.exp(-B * r)
    disc = jnp.exp(-i_r)
    dP = -P * B * (q + dr)
    term1 = jnp.where(P > K, dP * disc, 0.0)
    term2 = di * disc * jnp.maximum(P - K, 0.0)
    return term1 - term2


def _vega_exact_kernel(seed_ref, consts_ref, out_ref):
    _seed_tile(seed_ref)
    x1, x2 = _box_muller((TILE_OPT, PAD))
    l11, l21, l22 = consts_ref[10], consts_ref[11], consts_ref[12]
    z_r = l11 * x1
    z_i = l21 * x1 + l22 * x2
    sigma = consts_ref[8]
    v = _vega_terms(consts_ref,
                    consts_ref[0] + z_r, consts_ref[1] + z_i,
                    consts_ref[6] + z_r / sigma, consts_ref[7] + z_i / sigma)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(v, axis=0)
    out_ref[1, :] += jnp.full((PAD,), TILE_OPT * PAD / PAD, jnp.float32)


def _vega_full_kernel(seed_ref, u_ref, consts_ref, out_ref, *, n1, prec):
    _seed_tile(seed_ref)
    z0, z1 = _box_muller((TILE_FULL, (n1 + 1) // 2))
    G = jnp.concatenate([z0, z1], axis=1)[:, :n1]
    z = _dot(G, u_ref[:], prec)
    z_r, z_i = z[:, 0:1], z[:, 1:2]
    sigma = consts_ref[8]
    v = _vega_terms(consts_ref,
                    consts_ref[0] + z_r, consts_ref[1] + z_i,
                    consts_ref[6] + z_r / sigma, consts_ref[7] + z_i / sigma)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.full((PAD,), jnp.sum(v) / PAD, jnp.float32)
    out_ref[1, :] += jnp.full((PAD,), TILE_FULL / PAD, jnp.float32)


def _option_local_fn(cfg: HWConfig, tables, market, sigma, exact: bool,
                     vega: bool):
    from functools import partial

    n1 = cfg.n_steps_s1
    consts = _zbc_consts(cfg, tables, market, sigma)
    if exact:
        l11, l21, l22 = engine_exact.zbc_chol(cfg)
        lvec = tables.sig_st * jnp.asarray([l11, l21, l22], jnp.float32)
        consts = jnp.concatenate([consts, lvec])
        paths_per_tile = TILE_OPT * PAD
        kernel = _vega_exact_kernel if vega else _zbc_exact_kernel
        args_tail = (consts,)
    else:
        u_shape, w_shape = engine_linear._shock_shapes(cfg, n1)
        Up = np.zeros((n1, PAD), np.float32)
        Up[:, 0] = u_shape
        Up[:, 1] = w_shape
        U = tables.sig_st * jnp.asarray(Up)
        paths_per_tile = TILE_FULL
        kernel = partial(_vega_full_kernel if vega else _zbc_full_kernel,
                         n1=n1, prec=cfg.matmul_precision)
        args_tail = (U, consts)

    # vega kernels are single-leg (like reference simulate_sensitivity);
    # the count they record already reflects that.
    salt = 303 if vega else 202

    def local_fn(key, base_block, n_blocks):
        local_paths = n_blocks * cfg.path_block
        if cfg.path_block % paths_per_tile != 0:
            raise ValueError(
                f"path_block must be a multiple of {paths_per_tile}")
        tiles_per_block = cfg.path_block // paths_per_tile
        seeds = _key_seed(key, base_block * tiles_per_block, salt=salt)
        out = _pallas_sum(cfg, kernel, local_paths // paths_per_tile,
                          (seeds,) + args_tail, out_rows=8)
        if vega:
            return jnp.sum(out[:2, :], axis=1)
        return jnp.sum(out[:6, :], axis=1)

    return local_fn


def zbc_local_fn(cfg, tables, market, sigma, exact: bool):
    """(6,) CV moments accumulated by the fused kernel."""
    return _option_local_fn(cfg, tables, market, sigma, exact, vega=False)


def vega_local_fn(cfg, tables, market, sigma, exact: bool):
    """(2,) [vega sum, count] accumulated by the fused kernel."""
    return _option_local_fn(cfg, tables, market, sigma, exact, vega=True)
