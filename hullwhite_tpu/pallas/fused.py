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

import math
from contextlib import contextmanager

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

# Path-tile sizes (paths per grid step). The fullstep curve kernel holds
# (TILE, 128)-block shock tiles in VMEM (path-major); exact kernels hold
# (TILE, 128); the transposed fullstep option kernels hold (128, TILE)
# blocks with paths on lanes — bigger tiles amortize per-grid-step
# overhead (measured 782 -> 999 M paths/s from 512 -> 4096 on the ZBC
# fullstep kernel; 4096 exceeded the 16 MB scoped VMEM limit for the
# curve kernel, hence 2048 there).
TILE_FULL = 2048
TILE_FULL_OPT = 4096  # option fullstep kernels: paths per tile (lane axis)
TILE_EXACT = 4096  # curve kernels: paths per BM half-tile
TILE_OPT = 256     # option exact kernels: (TILE_OPT, 128) paths per step


def _mix(x):
    """murmur3 finalizer — a bijective 32-bit avalanche mix."""
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def _tile_rng(seed_ref, interpret: bool):
    """Per-tile random-bits source: ``draw(shape, salt) -> uint32``.

    Hardware: seeds the core PRNG uniquely per (key, global tile) and
    ignores ``salt`` (the stateful generator advances between draws).

    Interpret mode: ``pltpu.prng_random_bits`` returns all zeros under
    ``InterpretParams`` (so the fused kernels were untestable on CPU);
    fall back to a stateless counter hash of (seeds, tile, salt, index) —
    two murmur3 finalizer rounds with seed injection in between.  Distinct
    draws must pass distinct ``salt`` values in this mode.
    """
    i = pl.program_id(0)
    if not interpret:
        pltpu.prng_seed(seed_ref[0] + (seed_ref[2] + i) * SEED_STRIDE,
                        seed_ref[1])

        def draw(shape, salt):
            return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

        return draw

    s0 = (seed_ref[0] + (seed_ref[2] + i) * SEED_STRIDE).astype(jnp.uint32)
    s1 = seed_ref[1].astype(jnp.uint32)

    def draw(shape, salt):
        idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
               * jnp.uint32(shape[-1])
               + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        x = _mix(idx ^ (jnp.uint32(salt) * jnp.uint32(0x9E3779B9)) ^ s0)
        x = _mix(x + s1)
        x = _mix(x ^ s0)
        return x

    return draw


def _bits_float12(b):
    """[1, 2) float from the top 23 of 32 random bits (mantissa trick)."""
    return pltpu.bitcast((b >> 9) | jnp.uint32(0x3F800000), jnp.float32)


# Chebyshev-fitted even polynomials in y = x^2 on [0, 1]:
#   cos(pi x) ~ sum COS*[k] y^k,   sin(pi x)/x ~ sum SIN*[k] y^k.
# Mosaic's general-range sin/cos dominate Box-Muller cost (measured: 2.6x
# whole-kernel speedup from bounded-range polynomials: 56 -> 149 G
# normals/s on v5e).  Degree-5 fits (quality tier) have max error
# 7.9e-7 / 1.9e-7 — better than the former degree-8 Taylor forms at 2/3 the
# terms; degree-4 (fast tier) 4.1e-5 / 1.2e-5, which perturbs the sampled
# angle by <1e-4 rad — validated against the quality tier at the 20-run CI
# level (RESULTS.md).
_COS5 = [0.9999992108812327, -4.934745090535487, 4.0580410955948345,
         -1.3323690970594237, 0.22965036551851092, -0.020577251866763305]
_SIN5 = [3.1415924582721866, -5.167698654480206, 2.5499982307289915,
         -0.5985505692547316, 0.08074781848280516, -0.006089474441873218]
def _cospi_sinpi(x, cos_k=_COS5, sin_k=_SIN5):
    """(cos(pi x), sin(pi x)) for x in [-1, 1)."""
    y = x * x
    c = cos_k[-1]
    for k in range(len(cos_k) - 2, -1, -1):
        c = c * y + cos_k[k]
    s = sin_k[-1]
    for k in range(len(sin_k) - 2, -1, -1):
        s = s * y + sin_k[k]
    return c, s * x


def _box_muller(draw, shape, salt=0):
    """Two independent N(0,1) fields of ``shape`` (quality tier).

    Radius from the builtin log (fast on Mosaic; a polynomial fastlog
    measured slower); angle trig from the bounded-range polynomials above.
    23-bit uniforms truncate the tails at |z| <= sqrt(-2 ln 2^-23) ~ 5.65
    (P ~ 1e-8/draw — same granularity class as cuRAND's fp32 normal).
    Device-verified moments: mean 0 +/- SE, std 0.9997, kurtosis 2.992 on
    2^20 samples.
    """
    u1 = 2.0 - _bits_float12(draw(shape, salt))    # (0, 1] — safe for log
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    x = 2.0 * _bits_float12(draw(shape, salt + 1)) - 3.0   # [-1, 1)
    c, s = _cospi_sinpi(x)
    return rad * c, rad * s


# --- MXU-mixed shock generator (full-step tier) -----------------------------
#
# The honest brute-force kernels burn one fresh random value per path per
# time step; with Box-Muller the VPU transcendentals bound the whole tier
# at ~250 G normals/s (measured at VPU peak — reducing the polynomial
# degree or sharing the log across chi^2(4) pairs moved nothing).  The TPU
# answer is to move normal SYNTHESIS onto the idle MXU:
#
#   1. unpack each 32-bit word into TWO bf16 raw values
#      v = +/- (1 + m/128) * 16^c  with m a 7-bit mantissa and
#      c ~ Bernoulli(3/8) from three spare bits (c = b8 & (b9 | b10)).
#      The 3/8-octave spread is chosen so the raw kurtosis is 2.9994 —
#      i.e. the raw 4th cumulant is already ~zero, so the leading CLT
#      kurtosis error of the mix CANCELS instead of decaying like 1/128
#      (a plain +/-[1,2) bimodal costs kurt 2.985 after mixing AND biases
#      smooth functionals, see the D-scramble note below).  ~4 VPU ops
#      per word, no transcendentals at all;
#   2. mix 128 of them with a scaled Hadamard matrix on the MXU:
#      G = H_q v,  |H_q| = q0 (bf16-exact), H orthogonal.
#
# Each shock is a CLT sum of 128 bounded symmetric iid near-zero-kurtosis
# terms: mean 0 exactly, unit variance EXACTLY (the 128 q0^2 E[v^2]
# residual is folded into the downstream weights via _MIX_W_SCALE), all
# odd moments 0, 4th cumulant ~6e-4/128.  Shocks within a block are
# exactly uncorrelated (H orthogonal).
#
# THE D-SCRAMBLE (essential): downstream linear functionals z = sum w_s G_s
# with SMOOTH step weights w are nearly aligned with the Hadamard's
# all-ones row, so H^T w concentrates on few raw values and z degenerates
# to a handful of raws (measured kurt(z_r) = 1.97 on hardware — a +5%
# option-price bias).  Folding a fixed pseudorandom sign vector D into the
# weights (z = (Dw) G == w (DG)) scrambles w's Walsh spectrum flat, so
# every functional mixes ~n_steps raw values.  Combined with the zero-
# kurtosis raw population, the measured price/vega bias vs the exact-
# Gaussian tier is below 1e-5 at 2^24 paths (RESULTS.md A/B).
#
# One fresh 16-bit value per step per path is consumed and the per-step
# shock field G is materialized in VMEM — the stepwise simulation
# semantics of the reference kernel are kept.

_MIX_BLOCK = 128
# E[v^2] = mean((1+k/128)^2) * (0.625 + 0.375*256) over the 7-bit grid
_MIX_E2 = 224.3269920349121
_MIX_Q0 = float(np.float32(0.005889892578125))  # bf16(1/sqrt(128 E[v^2]))
_MIX_W_SCALE = 1.0 / math.sqrt(128 * _MIX_Q0 * _MIX_Q0 * _MIX_E2)
_MIX_D_SEED = 12345


def _mix_d(n: int):
    """Fixed pseudorandom +/-1 spectrum scrambler for n step rows."""
    return np.random.default_rng(_MIX_D_SEED).choice([-1.0, 1.0], n)


def _hadamard_np():
    """(128, 128) fp64 Sylvester-Hadamard scaled by the bf16-exact q0."""
    H = np.array([[1.0]], np.float64)
    while H.shape[0] < _MIX_BLOCK:
        H = np.block([[H, H], [H, -H]])
    return H * _MIX_Q0


def _premix_curve(Wsh: np.ndarray) -> np.ndarray:
    """Fold the Hadamard mix into path-major curve weights per 128-step
    block: rows q*128:(q+1)*128 become (H q0) @ W_q, so the kernel's
    z = sum_q U_q (H W_q) equals the mixed-generator z exactly (fp64
    premix; associativity of the CLT mix)."""
    H = _hadamard_np()
    out = np.empty_like(Wsh, dtype=np.float64)
    for q in range(Wsh.shape[0] // _MIX_BLOCK):
        s = slice(q * _MIX_BLOCK, (q + 1) * _MIX_BLOCK)
        out[s] = H @ Wsh[s]
    return out


def _premix_opt(Up: np.ndarray) -> np.ndarray:
    """Transposed-layout premix: columns q*128:(q+1)*128 of the (8, nb*128)
    weight rows become W_q @ (H q0) (H symmetric)."""
    H = _hadamard_np()
    out = np.empty_like(Up, dtype=np.float64)
    for q in range(Up.shape[1] // _MIX_BLOCK):
        s = slice(q * _MIX_BLOCK, (q + 1) * _MIX_BLOCK)
        out[:, s] = Up[:, s] @ H
    return out


def _raw_block(draw, half_shape, salt):
    """One block of octave-spread bf16 raw atoms from ``half_shape`` u32
    draws (each word yields two bf16 raws, doubling the sublane dim on
    bitcast; exponent += 4 w.p. 3/8 spreads the octaves so the 512-term
    CLT mix matches Gaussian kurtosis, see RESULTS.md)."""
    b = draw(half_shape, salt)
    base = (b & jnp.uint32(0x807F807F)) | jnp.uint32(0x3F803F80)
    c = ((b >> 8) & ((b >> 9) | (b >> 10))) & jnp.uint32(0x00010001)
    return pltpu.bitcast(base + (c << 9), jnp.bfloat16)


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


# Probe hook for Mosaic-level VMEM introspection (utils/profile +
# tpu_tests/test_vmem_datasheet): when set, every fused kernel compiles
# under this cap and Mosaic rejects the kernel if its true allocation
# exceeds it.  Read at TRACE time — only ever set it via the
# ``vmem_limit`` context manager, and only around fresh
# jit(...).lower(...).compile() probes, never around cached callables
# (a cap read while a production lru-cached kernel first traces would be
# baked into the cached callable permanently).
VMEM_LIMIT_BYTES: int | None = None


@contextmanager
def vmem_limit(limit_bytes: int | None):
    """Scoped VMEM-cap probe: sets VMEM_LIMIT_BYTES for the duration of
    the block and guarantees the reset (advisor round-2 finding: a bare
    global set could leak into a cached kernel on an exception path)."""
    global VMEM_LIMIT_BYTES
    prev = VMEM_LIMIT_BYTES
    VMEM_LIMIT_BYTES = limit_bytes
    try:
        yield
    finally:
        VMEM_LIMIT_BYTES = prev


def _pallas_sum(cfg: HWConfig, kernel, grid, args, out_rows, out_cols=PAD):
    """Common pallas_call shape: SMEM seeds + VMEM operands -> accumulated
    (out_rows, out_cols) float32 output.  (Consts vectors deliberately stay
    in VMEM: an SMEM-consts A/B made the short exact kernels ~30% slower —
    per-use scalar load + broadcast beats one vector load.)"""
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args[1:]
    ]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32),
        interpret=(pltpu.InterpretParams()
                   if cfg.pallas_interpret else False),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES)
            if VMEM_LIMIT_BYTES else None),
    )(*args)


# ---------------------------------------------------------------------------
# Q1: curve discount sums
# ---------------------------------------------------------------------------

def _curve_kernel(seed_ref, w_ref, out_ref, *, prec, interpret):
    """Fullstep: MXU-mixed shocks per path per step, with the Hadamard
    mix PRE-FOLDED into the weights (round 3): mathematically
    z = sum_q (U_q H) W_q = sum_q U_q (H W_q), and H W_q is a prep-time
    constant — so the kernel runs ONE matmul per 128-step block on the
    raw bf16 atoms instead of mix + weights (halves the MXU flops; the
    tier was measured 86% MXU-bound).  The generator's law is unchanged:
    z is the same weighted CLT sum of the same octave-spread raws.

    Path-major layout (paths in sublanes): with 128 maturity columns the
    payoff tile (TILE, PAD) is fully lane-utilized, and the path-major
    matmul measured ~1.3x faster than the transposed form (the option
    kernels, whose payoff is 2 columns wide, use the transposed layout).
    The deterministic exp(-c) scaling happens outside."""
    draw = _tile_rng(seed_ref, interpret)
    nb = w_ref.shape[0] // _MIX_BLOCK
    z = jnp.zeros((TILE_FULL, PAD), jnp.float32)
    for q in range(nb):
        U = _raw_block(draw, (TILE_FULL // 2, _MIX_BLOCK), q)
        if prec == "highest":
            # Mosaic's fp32-precision matmul rejects mixed bf16/f32
            # operands; the accuracy tier upcasts the raw atoms
            U = U.astype(jnp.float32)
        z += _dot(U, w_ref[q * _MIX_BLOCK:(q + 1) * _MIX_BLOCK], prec)
    # antithetic pair via one exp + one reciprocal:
    #   exp(-(c+z)) + exp(-(c-z)) = exp(-c) * (t + 1/t),  t = exp(-z)
    t = jnp.exp(-z)
    contrib = jnp.sum(t + pl.reciprocal(t, approx=False), axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += contrib


def _curve_exact_kernel(seed_ref, w_ref, c_ref, out_ref, *, prec, interpret):
    """Exact: two tiles of paths per step, each row = 128 std normals,
    z = X @ (sig_st L^T) (zero-padded), I = c +/- z."""
    draw = _tile_rng(seed_ref, interpret)
    z0, z1 = _box_muller(draw, (TILE_EXACT, PAD))
    contrib = jnp.zeros((PAD,), jnp.float32)
    for zi in (z0, z1):
        t = jnp.exp(-_dot(zi, w_ref[:], prec))
        contrib += jnp.sum(t + pl.reciprocal(t, approx=False), axis=0)
    contrib = contrib * jnp.exp(-c_ref[0, :])

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += contrib


def curve_prepared(cfg: HWConfig, tables, exact: bool):
    """Sigma-dependent weight pytree for the curve kernels.

    Building these costs ~0.85 ms of small-op dispatch per call on the
    axon tunnel — half the Q1 wall time — so drivers jit it ONCE per
    sigma and time the run function only, exactly like the reference
    (compute_constants runs before its cudaEvent window,
    1_bond_pricing.cu:49 vs :60)."""
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
        return (W, c_pad)
    nb = -(-cfg.n_steps // _MIX_BLOCK)
    Wsh = np.zeros((nb * _MIX_BLOCK, PAD), np.float64)
    Wsh[: cfg.n_steps, :nm] = engine_linear._curve_shape(cfg)
    Wsh *= _mix_d(nb * _MIX_BLOCK)[:, None]  # spectrum scrambler
    # Hadamard premix (round 3): z = sum_q U_q (H W_q) — one kernel
    # matmul per block instead of mix + weights
    W = (tables.sig_st * _MIX_W_SCALE) * jnp.asarray(
        _premix_curve(Wsh), jnp.float32)
    cw = engine_linear.curve_weights(cfg, tables)
    exp_c = jnp.exp(-jnp.zeros((PAD,), dtype).at[:nm].set(cw.c))
    return (W, exp_c)


def curve_local_fn_from(cfg: HWConfig, exact: bool, prepared):
    from functools import partial

    nm = cfg.n_mat
    dtype = jnp.float32
    if exact:
        W, c_pad = prepared
        paths_per_tile = 2 * TILE_EXACT
        kernel = partial(_curve_exact_kernel, prec=cfg.matmul_precision,
                         interpret=cfg.pallas_interpret)
        w_args = (W, c_pad)
    else:
        W, exp_c = prepared
        paths_per_tile = TILE_FULL
        kernel = partial(_curve_kernel, prec=cfg.matmul_precision,
                         interpret=cfg.pallas_interpret)
        w_args = (W,)

    def local_fn(key, base_block, n_blocks):
        local_paths = n_blocks * cfg.path_block
        if cfg.path_block % paths_per_tile != 0:
            raise ValueError(
                f"path_block must be a multiple of {paths_per_tile}")
        tiles_per_block = cfg.path_block // paths_per_tile
        seeds = _key_seed(key, base_block * tiles_per_block, salt=101)
        out = _pallas_sum(cfg, kernel, local_paths // paths_per_tile,
                          (seeds,) + w_args, out_rows=1)[0]
        if exact:
            return jnp.concatenate(
                [jnp.full((1,), 2.0 * local_paths, dtype), out[: nm - 1]])
        sums = out * exp_c
        return sums[:nm].at[0].set(2.0 * local_paths)

    return local_fn


def curve_local_fn(cfg: HWConfig, tables, exact: bool):
    return curve_local_fn_from(cfg, exact, curve_prepared(cfg, tables,
                                                          exact))


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
    """Accumulate the 5 CV moment rows + count into (6+, width) VMEM.

    Leg values may be (TILE, width) (exact kernels: paths on both axes —
    reduced over sublanes here) or (1, width) (transposed fullstep kernels:
    paths on lanes only — the axis-0 sum is a squeeze).  The caller
    lane-sums the output once; the count is spread across the lane row
    (scalar VMEM stores are unsupported)."""
    width = out_ref.shape[1]
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
    out_ref[5, :] += jnp.full((width,), count / width, jnp.float32)


def _zbc_exact_kernel(seed_ref, consts_ref, out_ref, *, interpret):
    draw = _tile_rng(seed_ref, interpret)
    x1, x2 = _box_muller(draw, (TILE_OPT, PAD))
    l11, l21, l22 = consts_ref[10], consts_ref[11], consts_ref[12]
    z_r = l11 * x1
    z_i = l21 * x1 + l22 * x2
    xa, ya, xb, yb = _legs_pair(consts_ref, z_r, z_i)
    _moment_accum(out_ref, xa, ya, xb, yb, 2.0 * TILE_OPT * PAD)


def _zbc_full_kernel(seed_ref, w_ref, consts_ref, out_ref, *, prec,
                     interpret):
    """Transposed fullstep ZBC: steps in sublanes, paths in lanes; the
    Hadamard mix is PRE-FOLDED into the weight rows (round 3:
    z = sum_q W_q (H U_q) = sum_q (W_q H) U_q), so each 128-step block
    is ONE (8, 128) @ (128, TILE) matmul on the raw bf16 atoms — 17x
    fewer MXU flops than mix + weights, same generator law.  Rows 0/1 of
    z = z_r/z_i, so the payoff/moment math runs on fully lane-utilized
    (1, TILE) rows."""
    draw = _tile_rng(seed_ref, interpret)
    nb = w_ref.shape[1] // _MIX_BLOCK
    z = jnp.zeros((8, TILE_FULL_OPT), jnp.float32)
    for q in range(nb):
        U = _raw_block(draw, (_MIX_BLOCK // 2, TILE_FULL_OPT), q)
        if prec == "highest":
            U = U.astype(jnp.float32)   # see _curve_kernel note
        z += _dot(w_ref[:, q * _MIX_BLOCK:(q + 1) * _MIX_BLOCK], U, prec)
    z_r, z_i = z[0:1, :], z[1:2, :]
    xa, ya, xb, yb = _legs_pair(consts_ref, z_r, z_i)
    _moment_accum(out_ref, xa, ya, xb, yb, 2.0 * TILE_FULL_OPT)


def _vega_terms(consts_ref, r, i_r, dr, di):
    A, B, K = consts_ref[2], consts_ref[3], consts_ref[4]
    q = consts_ref[9]
    P = A * jnp.exp(-B * r)
    disc = jnp.exp(-i_r)
    dP = -P * B * (q + dr)
    term1 = jnp.where(P > K, dP * disc, 0.0)
    term2 = di * disc * jnp.maximum(P - K, 0.0)
    return term1 - term2


def _vega_exact_kernel(seed_ref, consts_ref, out_ref, *, interpret):
    draw = _tile_rng(seed_ref, interpret)
    x1, x2 = _box_muller(draw, (TILE_OPT, PAD))
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


def _delta_exact_kernel(seed_ref, consts_ref, out_ref, *, interpret):
    """Pathwise delta (d price / d r0), both antithetic legs, fused tier.

    Same exact-sampling state as _zbc_exact_kernel; the deterministic
    sensitivities dr(S1)/dr0, dI(S1)/dr0 arrive as consts[13:15]
    (pricing._r0_sensitivities).  Mirrors payoffs.delta_sum; generalizes
    the reference's fused sensitivity-kernel pattern
    (3_sensitivity_analysis.cu:22-96) to a greek it does not compute."""
    draw = _tile_rng(seed_ref, interpret)
    x1, x2 = _box_muller(draw, (TILE_OPT, PAD))
    l11, l21, l22 = consts_ref[10], consts_ref[11], consts_ref[12]
    dr_dr0, di_dr0 = consts_ref[13], consts_ref[14]
    z_r = l11 * x1
    z_i = l21 * x1 + l22 * x2
    A, B, K = consts_ref[2], consts_ref[3], consts_ref[4]
    c_r, c_i = consts_ref[0], consts_ref[1]
    t_r = jnp.exp(-B * z_r)
    t_i = jnp.exp(-z_i)
    P_base = A * jnp.exp(-B * c_r)
    d_base = jnp.exp(-c_i)
    total = jnp.zeros((PAD,), jnp.float32)
    for tr, ti in ((t_r, t_i),
                   (pl.reciprocal(t_r, approx=False),
                    pl.reciprocal(t_i, approx=False))):
        P = P_base * tr
        disc = d_base * ti
        term1 = jnp.where(P > K, -P * B * dr_dr0 * disc, 0.0)
        term2 = di_dr0 * disc * jnp.maximum(P - K, 0.0)
        total += jnp.sum(term1 - term2, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += total
    out_ref[1, :] += jnp.full((PAD,), 2.0 * TILE_OPT * PAD / PAD, jnp.float32)


def _vega_full_kernel(seed_ref, w_ref, consts_ref, out_ref, *, prec,
                      interpret):
    """Transposed fullstep vega (see _zbc_full_kernel for the layout and
    the round-3 Hadamard premix)."""
    draw = _tile_rng(seed_ref, interpret)
    nb = w_ref.shape[1] // _MIX_BLOCK
    z = jnp.zeros((8, TILE_FULL_OPT), jnp.float32)
    for q in range(nb):
        U = _raw_block(draw, (_MIX_BLOCK // 2, TILE_FULL_OPT), q)
        if prec == "highest":
            U = U.astype(jnp.float32)   # see _curve_kernel note
        z += _dot(w_ref[:, q * _MIX_BLOCK:(q + 1) * _MIX_BLOCK], U, prec)
    z_r, z_i = z[0:1, :], z[1:2, :]
    sigma = consts_ref[8]
    v = _vega_terms(consts_ref,
                    consts_ref[0] + z_r, consts_ref[1] + z_i,
                    consts_ref[6] + z_r / sigma, consts_ref[7] + z_i / sigma)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(v, axis=0)
    out_ref[1, :] += jnp.full((TILE_FULL_OPT,), 1.0, jnp.float32)


def option_prepared(cfg: HWConfig, tables, market, sigma, exact: bool,
                    kind: str, extra_consts=()):
    """Sigma/market-dependent consts + weights pytree for the fused option
    kernels (see curve_prepared for why drivers prepare once)."""
    n1 = cfg.n_steps_s1
    consts = _zbc_consts(cfg, tables, market, sigma)
    if exact:
        l11, l21, l22 = engine_exact.zbc_chol(cfg)
        lvec = tables.sig_st * jnp.asarray([l11, l21, l22], jnp.float32)
        parts = [consts, lvec]
        if extra_consts:
            parts.append(jnp.asarray(extra_consts, jnp.float32))
        return (jnp.concatenate(parts),)
    if kind == "delta":
        raise ValueError("fused delta requires the exact tier")
    u_shape, w_shape = engine_linear._shock_shapes(cfg, n1)
    nb = -(-n1 // _MIX_BLOCK)
    # transposed: (8, nb*128) with rows 0/1 = the r/I shock shapes
    Up = np.zeros((8, nb * _MIX_BLOCK), np.float64)
    Up[0, :n1] = u_shape
    Up[1, :n1] = w_shape
    Up *= _mix_d(nb * _MIX_BLOCK)[None, :]  # spectrum scrambler
    # Hadamard premix (round 3): z = sum_q (W_q H) U_q
    U = (tables.sig_st * _MIX_W_SCALE) * jnp.asarray(
        _premix_opt(Up), jnp.float32)
    return (U, consts)


def option_local_fn_from(cfg: HWConfig, exact: bool, kind: str, prepared):
    from functools import partial

    if exact:
        paths_per_tile = TILE_OPT * PAD
        kernel = partial({"vega": _vega_exact_kernel,
                          "zbc": _zbc_exact_kernel,
                          "delta": _delta_exact_kernel}[kind],
                         interpret=cfg.pallas_interpret)
    else:
        paths_per_tile = TILE_FULL_OPT
        kernel = partial(_vega_full_kernel if kind == "vega"
                         else _zbc_full_kernel,
                         prec=cfg.matmul_precision,
                         interpret=cfg.pallas_interpret)
    args_tail = tuple(prepared)

    # vega kernels are single-leg (like reference simulate_sensitivity);
    # the count they record already reflects that.
    salt = {"zbc": 202, "vega": 303, "delta": 404}[kind]
    out_cols = PAD if exact else TILE_FULL_OPT

    def local_fn(key, base_block, n_blocks):
        local_paths = n_blocks * cfg.path_block
        if cfg.path_block % paths_per_tile != 0:
            raise ValueError(
                f"path_block must be a multiple of {paths_per_tile}")
        tiles_per_block = cfg.path_block // paths_per_tile
        seeds = _key_seed(key, base_block * tiles_per_block, salt=salt)
        out = _pallas_sum(cfg, kernel, local_paths // paths_per_tile,
                          (seeds,) + args_tail, out_rows=8,
                          out_cols=out_cols)
        if kind == "zbc":
            return jnp.sum(out[:6, :], axis=1)
        return jnp.sum(out[:2, :], axis=1)

    return local_fn


def _option_local_fn(cfg: HWConfig, tables, market, sigma, exact: bool,
                     kind: str, extra_consts=()):
    return option_local_fn_from(
        cfg, exact, kind,
        option_prepared(cfg, tables, market, sigma, exact, kind,
                        extra_consts))


def zbc_local_fn(cfg, tables, market, sigma, exact: bool):
    """(6,) CV moments accumulated by the fused kernel."""
    return _option_local_fn(cfg, tables, market, sigma, exact, kind="zbc")


def vega_local_fn(cfg, tables, market, sigma, exact: bool):
    """(2,) [vega sum, count] accumulated by the fused kernel."""
    return _option_local_fn(cfg, tables, market, sigma, exact, kind="vega")


def delta_local_fn(cfg, tables, market, sigma, dr_dr0: float, di_dr0: float):
    """(2,) [delta sum, count] accumulated by the fused exact kernel."""
    return _option_local_fn(cfg, tables, market, sigma, exact=True,
                            kind="delta", extra_consts=(dr_dr0, di_dr0))


def dump_option_normals(cfg: HWConfig, key, n_tiles: int = 1,
                        kind: str = "zbc"):
    """Materialize the exact Gaussians the fused option kernel consumes.

    Same per-tile seeding and Box-Muller pipeline as ``_zbc_exact_kernel``
    for ``key`` at base block 0 — feeding these into the XLA exact engine
    reproduces the fused kernel's estimate deterministically, restoring the
    reference's <1e-6-style cross-kernel agreement gate on hardware
    (benchmark_reductions.cu:158-169) instead of a statistical one.

    Returns (x1, x2), each (n_tiles * TILE_OPT, PAD) float32.
    """
    salt = {"zbc": 202, "vega": 303, "delta": 404}[kind]

    def kernel(seed_ref, x1_ref, x2_ref):
        draw = _tile_rng(seed_ref, cfg.pallas_interpret)
        x1, x2 = _box_muller(draw, (TILE_OPT, PAD))
        x1_ref[...] = x1
        x2_ref[...] = x2

    seeds = _key_seed(key, jnp.int32(0), salt=salt)
    out_spec = pl.BlockSpec((TILE_OPT, PAD), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n_tiles * TILE_OPT, PAD), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(out_spec, out_spec),
        out_shape=(shape, shape),
        interpret=(pltpu.InterpretParams()
                   if cfg.pallas_interpret else False),
    )(seeds)


# ---------------------------------------------------------------------------
# Option surface (strikes x maturities), fused exact tier
# ---------------------------------------------------------------------------

def _grid_exact_kernel(seed_ref, consts_ref, out_ref, *, Bs, Ks, n_s2,
                       interpret):
    """CV moment surface over a static (strikes x maturities) grid from
    one exact-sampled path tile (grid.py's _grid_moments, fused).

    consts layout: [c_r, c_i, l11, l21, l22, A_1..A_ns2, P0_1..P0_ns2].
    Output rows: [count | sy_j | syy_j | sx_ij | sxx_ij | sxy_ij] with the
    (i, j) blocks flattened row-major; the caller lane-sums and reshapes.
    """
    draw = _tile_rng(seed_ref, interpret)
    x1, x2 = _box_muller(draw, (TILE_OPT, PAD))
    c_r, c_i = consts_ref[0], consts_ref[1]
    l11, l21, l22 = consts_ref[2], consts_ref[3], consts_ref[4]
    z_r = l11 * x1
    z_i = l21 * x1 + l22 * x2
    t_i = jnp.exp(-z_i)
    d_base = jnp.exp(-c_i)
    disc_p = d_base * t_i
    disc_m = d_base * pl.reciprocal(t_i, approx=False)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    n_k = len(Ks)
    count = 2.0 * TILE_OPT * PAD
    out_ref[0, :] += jnp.full((PAD,), count / PAD, jnp.float32)
    for j in range(n_s2):
        A_j = consts_ref[5 + j]
        P0_j = consts_ref[5 + n_s2 + j]
        B_j = jnp.float32(Bs[j])
        t_r = jnp.exp(-B_j * z_r)
        P_base = A_j * jnp.exp(-B_j * c_r)
        P_p = P_base * t_r
        P_m = P_base * pl.reciprocal(t_r, approx=False)
        y_p = disc_p * P_p - P0_j
        y_m = disc_m * P_m - P0_j
        out_ref[1 + j, :] += jnp.sum(y_p + y_m, axis=0)
        out_ref[1 + n_s2 + j, :] += jnp.sum(y_p * y_p + y_m * y_m, axis=0)
        for i in range(n_k):
            K_i = jnp.float32(Ks[i])
            x_p = disc_p * jnp.maximum(P_p - K_i, 0.0)
            x_m = disc_m * jnp.maximum(P_m - K_i, 0.0)
            cell = i * n_s2 + j
            base = 1 + 2 * n_s2
            out_ref[base + cell, :] += jnp.sum(x_p + x_m, axis=0)
            out_ref[base + n_k * n_s2 + cell, :] += jnp.sum(
                x_p * x_p + x_m * x_m, axis=0)
            out_ref[base + 2 * n_k * n_s2 + cell, :] += jnp.sum(
                x_p * y_p + x_m * y_m, axis=0)


def grid_local_fn(cfg: HWConfig, tables, market, sigma, Ks: tuple,
                  S2s: tuple):
    """Fused option-surface moments with the same dict contract as
    grid._grid_moments (sx/sxx/sxy (nK, nS2); sy/syy (nS2,); n scalar)."""
    from functools import partial

    n_k, n_s2 = len(Ks), len(S2s)
    l11, l21, l22 = engine_exact.zbc_chol(cfg)
    lvec = tables.sig_st * jnp.asarray([l11, l21, l22], jnp.float32)
    zw = engine_linear.zbc_weights(cfg, tables)
    Bs = tuple((1.0 - math.exp(-cfg.a * (t - cfg.s1))) / cfg.a
               for t in S2s)
    A = hw.a_hw(cfg, sigma, market, cfg.s1,
                jnp.asarray(S2s, jnp.float32))
    P0 = hw.interp_curve(market.P, jnp.asarray(S2s, jnp.float32), cfg)
    consts = jnp.concatenate([
        jnp.stack([zw.det[0], zw.det[1]]).astype(jnp.float32), lvec,
        A.astype(jnp.float32), P0.astype(jnp.float32)])
    kernel = partial(_grid_exact_kernel, Bs=Bs, Ks=tuple(float(k) for k in Ks),
                     n_s2=n_s2, interpret=cfg.pallas_interpret)
    paths_per_tile = TILE_OPT * PAD
    out_rows = 1 + 2 * n_s2 + 3 * n_k * n_s2

    def local_fn(key, base_block, n_blocks):
        local_paths = n_blocks * cfg.path_block
        if cfg.path_block % paths_per_tile != 0:
            raise ValueError(
                f"path_block must be a multiple of {paths_per_tile}")
        tiles_per_block = cfg.path_block // paths_per_tile
        seeds = _key_seed(key, base_block * tiles_per_block, salt=505)
        out = _pallas_sum(cfg, kernel, local_paths // paths_per_tile,
                          (seeds, consts), out_rows=out_rows)
        s = jnp.sum(out, axis=1)
        base = 1 + 2 * n_s2
        nk_ns2 = n_k * n_s2
        return {
            "n": s[0],
            "sy": s[1:1 + n_s2],
            "syy": s[1 + n_s2:1 + 2 * n_s2],
            "sx": s[base:base + nk_ns2].reshape(n_k, n_s2),
            "sxx": s[base + nk_ns2:base + 2 * nk_ns2].reshape(n_k, n_s2),
            "sxy": s[base + 2 * nk_ns2:base + 3 * nk_ns2].reshape(n_k,
                                                                  n_s2),
        }

    return local_fn


# ---------------------------------------------------------------------------
# Static VMEM datasheet (Mosaic-level introspection, C34 extension)
# ---------------------------------------------------------------------------

def vmem_datasheet(cfg: HWConfig) -> dict:
    """Declared per-tile VMEM working set of every fused kernel, computed
    from the live tile constants — the TPU analogue of the reference's
    static occupancy report (registers/shared/const per thread block,
    3_sensitivity_analysis.cu:183-239), which is likewise a declared-
    resource accounting, not a liveness analysis.

    Sums the operand blocks, the RNG/shock temporaries, and the output
    accumulator that each kernel materializes by construction.  Mosaic
    adds scheduling copies on top, so the true allocation sits between
    ``declared_bytes`` and a small multiple of it;
    ``tpu_tests/test_vmem_datasheet.py`` brackets it on hardware with
    ``VMEM_LIMIT_BYTES`` (compiles under 4x, rejected under 1/8x).
    """
    f32, bf16, u32 = 4, 2, 4
    nb_curve = -(-cfg.n_steps // _MIX_BLOCK)
    nb_opt = -(-cfg.n_steps_s1 // _MIX_BLOCK)
    sheet = {}

    def entry(name, paths_per_tile, **buffers):
        total = sum(buffers.values())
        sheet[name] = {
            "paths_per_tile": paths_per_tile,
            "grid_tiles": cfg.n_paths // paths_per_tile,
            "buffers": buffers,
            "declared_bytes": total,
        }

    entry("curve_full", TILE_FULL,
          weights=nb_curve * _MIX_BLOCK * PAD * f32,
          z_accum=TILE_FULL * PAD * f32,
          raw_bf16=TILE_FULL * _MIX_BLOCK * bf16,
          draw_u32=(TILE_FULL // 2) * _MIX_BLOCK * u32,
          out=1 * PAD * f32)
    entry("curve_exact", 2 * TILE_EXACT,
          weights=PAD * PAD * f32,
          consts=PAD * f32,
          normals=2 * TILE_EXACT * PAD * f32,
          bm_temps=3 * TILE_EXACT * PAD * f32,
          payoff=TILE_EXACT * PAD * f32,
          out=1 * PAD * f32)
    opt_exact = dict(
        normals=2 * TILE_OPT * PAD * f32,
        bm_temps=3 * TILE_OPT * PAD * f32,
        legs=4 * TILE_OPT * PAD * f32,
        consts=PAD * f32,
        out=8 * PAD * f32)
    for k in ("zbc_exact", "vega_exact", "delta_exact"):
        entry(k, TILE_OPT * PAD, **opt_exact)
    opt_full = dict(
        weights=8 * nb_opt * _MIX_BLOCK * f32,
        z_accum=8 * TILE_FULL_OPT * f32,
        raw_bf16=_MIX_BLOCK * TILE_FULL_OPT * bf16,
        draw_u32=(_MIX_BLOCK // 2) * TILE_FULL_OPT * u32,
        legs=4 * TILE_FULL_OPT * f32,
        out=8 * TILE_FULL_OPT * f32)
    for k in ("zbc_full", "vega_full"):
        entry(k, TILE_FULL_OPT, **opt_full)
    return sheet


def _raw_peak_kernel(seed_ref, out_ref, *, nb, interpret):
    """Raw-generator wall microbench: the same u32 draw + octave-spread
    bitcast volume as one option fullstep tile, with a single bf16
    accumulate per block as the minimal not-dead-code consumer (the
    measured 'peak' therefore includes one VPU add per raw — a
    conservative wall: the true generator-only peak is slightly
    higher)."""
    draw = _tile_rng(seed_ref, interpret)
    acc = jnp.zeros((8, TILE_FULL_OPT), jnp.bfloat16)
    for q in range(nb):
        acc += _raw_block(draw, (_MIX_BLOCK // 2, TILE_FULL_OPT), q)[:8]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(acc.astype(jnp.float32), axis=0)


def raw_peak_fn(cfg: HWConfig):
    """jit-able (key -> checksum) running the raw-generator microbench
    over the same tile/grid geometry as the option fullstep tiers."""
    from functools import partial

    nb = -(-cfg.n_steps_s1 // _MIX_BLOCK)
    kernel = partial(_raw_peak_kernel, nb=nb,
                     interpret=cfg.pallas_interpret)

    def fn(key):
        seeds = _key_seed(key, 0, salt=505)
        grid = cfg.n_paths // TILE_FULL_OPT
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=8,
                          out_cols=TILE_FULL_OPT)
        return jnp.sum(out[0])

    return fn, nb * _MIX_BLOCK  # raws per path lane


def _draw_peak_kernel(seed_ref, out_ref, *, nb, interpret):
    """PRNG-unit wall microbench: the same u32 draw volume as one option
    fullstep tile with the cheapest possible not-dead-code consumer (one
    xor-accumulate per word) — isolates the hardware generator's
    throughput from the octave-spread ALU work that _raw_peak_kernel
    includes."""
    draw = _tile_rng(seed_ref, interpret)
    acc = jnp.zeros((_MIX_BLOCK // 2, TILE_FULL_OPT), jnp.uint32)
    for q in range(nb):
        acc ^= draw((_MIX_BLOCK // 2, TILE_FULL_OPT), q)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Mosaic has no u32 -> f32 cast; bitcast through i32 (checksum only)
    out_ref[0, :] += jnp.sum(pltpu.bitcast(acc, jnp.int32)
                             .astype(jnp.float32) * jnp.float32(2 ** -32),
                             axis=0)


def draw_peak_fn(cfg: HWConfig):
    """jit-able (key -> checksum) measuring the PRNG draw ceiling over the
    option-tier geometry; returns (fn, u32_words_per_path_lane)."""
    from functools import partial

    nb = -(-cfg.n_steps_s1 // _MIX_BLOCK)
    kernel = partial(_draw_peak_kernel, nb=nb,
                     interpret=cfg.pallas_interpret)

    def fn(key):
        seeds = _key_seed(key, 0, salt=606)
        grid = cfg.n_paths // TILE_FULL_OPT
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=8,
                          out_cols=TILE_FULL_OPT)
        return jnp.sum(out[0])

    return fn, nb * (_MIX_BLOCK // 2)


# VPU op accounting constants (vpu_ops_accounting):
#   _OCTAVE_OPS_PER_WORD — the _raw_block sequence on one u32 word
#   (2 bf16 raws): and, or, 3 shifts, or, 2 ands, shift, add = 10 vector
#   ALU ops.  Bitcasts are register reinterpretations (free).
#   _TRANSC_OP_WEIGHT — one Mosaic exp/log/reciprocal(exact) expands to a
#   range reduction + degree-7/8 polynomial ~ 8 ALU-op equivalents; the
#   option tiers have only ~4 transcendentals per pair so the weight
#   barely moves their totals (q1's 256/pair are 24% of its count).
_OCTAVE_OPS_PER_WORD = 10
_TRANSC_OP_WEIGHT = 8
_BITOPS_ROUNDS = 16
_BITOPS_OPS_PER_WORD_ROUND = 13  # 10 octave + 1 accumulate + 2 state fold


def _bitops_peak_kernel(seed_ref, out_ref, *, rounds, interpret):
    """VPU ALU wall microbench: _BITOPS_ROUNDS rounds of exactly the
    octave-spread op mix (plus 1 accumulate + 2 state-fold ops) on
    register-resident u32 words — no PRNG draws after the first, so the
    measured ops/s is the sustained vector-ALU ceiling for this op class.
    Every lane/sublane word is an independent chain, so the pipeline
    stays full despite the per-word dependency."""
    draw = _tile_rng(seed_ref, interpret)
    x = draw((_MIX_BLOCK // 2, TILE_FULL_OPT), 0)
    acc = jnp.zeros_like(x)
    for _ in range(rounds):
        base = (x & jnp.uint32(0x807F807F)) | jnp.uint32(0x3F803F80)
        c = ((x >> 8) & ((x >> 9) | (x >> 10))) & jnp.uint32(0x00010001)
        v = base + (c << 9)
        acc ^= v
        x = v ^ (x >> 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(pltpu.bitcast(acc, jnp.int32)
                             .astype(jnp.float32) * jnp.float32(2 ** -32),
                             axis=0)


def bitops_peak_fn(cfg: HWConfig):
    """jit-able (key -> checksum) for the ALU microbench; returns
    (fn, counted_ops_per_path_lane)."""
    from functools import partial

    kernel = partial(_bitops_peak_kernel, rounds=_BITOPS_ROUNDS,
                     interpret=cfg.pallas_interpret)

    def fn(key):
        seeds = _key_seed(key, 0, salt=707)
        grid = cfg.n_paths // TILE_FULL_OPT
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=8,
                          out_cols=TILE_FULL_OPT)
        return jnp.sum(out[0])

    ops = _BITOPS_ROUNDS * (_MIX_BLOCK // 2) * _BITOPS_OPS_PER_WORD_ROUND
    return fn, ops


# --- exact-tier unit walls (round-5, VERDICT r4 #7) -------------------------
# The flagship pallas_exact tiers have no Hadamard premix: their units are
# the Box-Muller transcendental pipeline (sqrt+log+trig polys), the payoff
# exp/reciprocal pipeline, and (q1 only) the Cholesky weight matmul.  Each
# wall is microbenched at the tier's own tile geometry with a minimal
# not-dead-code consumer, and exact_tier_accounting counts each tier's
# per-path usage so run_roofline can report fraction-of-limiting-unit for
# the headline tiers exactly like the fullstep table.

def _bm_peak_kernel(seed_ref, out_ref, *, interpret):
    """Box-Muller wall at the exact-curve geometry: the full normal
    volume of one _curve_exact_kernel tile with a single add as the
    consumer."""
    draw = _tile_rng(seed_ref, interpret)
    z0, z1 = _box_muller(draw, (TILE_EXACT, PAD))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(z0 + z1, axis=0)


def bm_peak_fn(cfg: HWConfig):
    """jit-able (key -> checksum); returns (fn, normals_per_call)."""
    from functools import partial

    kernel = partial(_bm_peak_kernel, interpret=cfg.pallas_interpret)
    grid = cfg.n_paths // (2 * TILE_EXACT)

    def fn(key):
        seeds = _key_seed(key, 0, salt=808)
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=1)
        return jnp.sum(out[0])

    return fn, grid * 2 * TILE_EXACT * PAD


_EXP_ROUNDS = 32


def _exp_peak_kernel(seed_ref, out_ref, *, rounds, interpret):
    """Sustained exp ceiling: register-resident chains x <- e^{-x}
    (stable fixed point ~0.567, every lane an independent chain)."""
    draw = _tile_rng(seed_ref, interpret)
    x = _bits_float12(draw((TILE_OPT, PAD), 0)) - 1.0   # [0, 1)
    for _ in range(rounds):
        x = jnp.exp(-x)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(x, axis=0)


def exp_peak_fn(cfg: HWConfig):
    """jit-able (key -> checksum); returns (fn, exps_per_call)."""
    from functools import partial

    kernel = partial(_exp_peak_kernel, rounds=_EXP_ROUNDS,
                     interpret=cfg.pallas_interpret)
    grid = cfg.n_paths // (2 * TILE_OPT * PAD)

    def fn(key):
        seeds = _key_seed(key, 0, salt=909)
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=1)
        return jnp.sum(out[0])

    return fn, grid * _EXP_ROUNDS * TILE_OPT * PAD


def _recip_peak_kernel(seed_ref, out_ref, *, rounds, interpret):
    """Sustained exact-reciprocal ceiling: chains x <- 1/(x + 1)
    (fixed point 1/phi ~ 0.618)."""
    draw = _tile_rng(seed_ref, interpret)
    x = _bits_float12(draw((TILE_OPT, PAD), 0)) - 1.0
    for _ in range(rounds):
        x = pl.reciprocal(x + 1.0, approx=False)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0, :] += jnp.sum(x, axis=0)


def recip_peak_fn(cfg: HWConfig):
    from functools import partial

    kernel = partial(_recip_peak_kernel, rounds=_EXP_ROUNDS,
                     interpret=cfg.pallas_interpret)
    grid = cfg.n_paths // (2 * TILE_OPT * PAD)

    def fn(key):
        seeds = _key_seed(key, 0, salt=1010)
        out = _pallas_sum(cfg, kernel, grid, (seeds,), out_rows=1)
        return jnp.sum(out[0])

    return fn, grid * _EXP_ROUNDS * TILE_OPT * PAD


def exact_tier_accounting(cfg: HWConfig) -> dict:
    """Analytic per-PATH unit usage of the pallas_exact tiers from the
    live tile constants.

    q1 (_curve_exact_kernel): each tile draws 2 x (TILE_EXACT, PAD)
    normals and serves 2*TILE_EXACT antithetic paths, so PAD/2 normals,
    PAD/2 payoff exps and PAD/2 exact reciprocals per path, plus the
    (TILE_EXACT, PAD) @ (PAD, PAD) Cholesky matmul x2 = PAD^2 flops/path
    (times the precision pass count).  zbc (_zbc_exact_kernel): each
    (TILE_OPT, PAD) element is an antithetic PAIR -> 1 normal and 1
    exact reciprocal per path, and ONE per-element exp per path
    (_legs_pair's t_r and t_i are per-element; its P_base/d_base exps
    take per-tile scalar arguments and hoist out of the element loop).
    vega (_vega_exact_kernel): one path per element -> 2 normals, 2
    per-element exps (P and disc both depend on the path state)."""
    passes = 6 if cfg.matmul_precision == "highest" else 1
    return {
        "q1_exact": {"normals_per_path": PAD / 2.0,
                     "exps_per_path": PAD / 2.0,
                     "recips_per_path": PAD / 2.0,
                     "mxu_flops_per_path": float(PAD * PAD * passes),
                     "alu_tail_per_path": 2.0 * PAD},
        "zbc_exact": {"normals_per_path": 1.0, "exps_per_path": 1.0,
                      "recips_per_path": 1.0, "mxu_flops_per_path": 0.0,
                      "alu_tail_per_path": 14.0},
        "vega_exact": {"normals_per_path": 2.0, "exps_per_path": 2.0,
                       "recips_per_path": 0.0, "mxu_flops_per_path": 0.0,
                       "alu_tail_per_path": 20.0},
    }


def vpu_ops_accounting(cfg: HWConfig) -> dict:
    """Analytic VPU-op counts per antithetic pair for the full-step tiers,
    from the live tile constants — the VPU half of the speed-of-light
    story (fullstep_roofline is the MXU half).

    Counts vector ALU ops per path lane: the octave-spread bit ops
    (_OCTAVE_OPS_PER_WORD per u32 word), the fp32 z accumulates after each
    premixed-weight matmul, the payoff/moment tail, and transcendentals at
    _TRANSC_OP_WEIGHT ALU-equivalents each.  ``benchmarks.run_roofline``
    divides measured wall time into these counts and reports each tier's
    achieved fraction of the microbenched ALU ceiling (bitops_peak_fn) and
    PRNG ceiling (draw_peak_fn) next to its MXU fraction — naming the
    limiting unit the way the reference's occupancy table names its cap
    (/root/reference/README.md:148-156)."""
    nb_curve = -(-cfg.n_steps // _MIX_BLOCK)
    nb_opt = -(-cfg.n_steps_s1 // _MIX_BLOCK)
    wpb = _MIX_BLOCK // 2  # u32 words per path lane per 128-step block

    def entry(nb, z_rows, tail_simple, tail_transc):
        spread = nb * wpb * _OCTAVE_OPS_PER_WORD
        z_accum = nb * z_rows
        transc = tail_transc * _TRANSC_OP_WEIGHT
        return {
            "raw_words_per_pair": nb * wpb,
            "vpu_ops_per_pair": spread + z_accum + tail_simple + transc,
            "breakdown": {"octave_spread": spread, "z_accum": z_accum,
                          "payoff_tail": tail_simple,
                          "transcendental_equiv": transc,
                          "transcendentals": tail_transc},
        }

    return {
        # q1: z is (TILE, PAD) so each block's accumulate costs PAD adds
        # per pair; payoff = exp + recip per maturity (2*PAD transc),
        # t + 1/t add + sublane-tree sum (~2*PAD simple)
        "q1_fullstep": entry(nb_curve, PAD, 2 * PAD, 2 * PAD),
        # options: z is (8, TILE) — 8 adds per pair per block;
        # zbc tail: _legs_pair 17 simple + 2 exp + 2 recip,
        # _moment_accum 11 row ops + 6 accumulates
        "zbc_fullstep": entry(nb_opt, 8, 17 + 17, 4),
        # vega tail: _vega_terms ~20 simple + 2 exp, 2 accumulates
        # (single leg per drawn path — throughput counts paths, not pairs)
        "vega_fullstep": entry(nb_opt, 8, 22, 2),
    }


def fullstep_roofline(cfg: HWConfig) -> dict:
    """Analytic MXU flop accounting of the full-step tiers from the live
    tile constants — the speed-of-light half of the occupancy story (the
    exact tiers' wall is the VPU Box-Muller transcendental throughput,
    RESULTS.md; the full-step tiers' wall is the MXU: every shock is
    produced by the 128-wide Hadamard mix matmul and consumed by the
    weight matmul).

    Per antithetic pair (shocks are shared by the +/- legs), with the
    round-3 Hadamard premix the only matmul left is the premixed-weight
    product on the raw bf16 atoms, multiplied by the MXU pass count of
    ``cfg.matmul_precision`` ("highest" = 6 bf16 passes, "default" = 1 —
    the benchmark config's choice, bias measured in RESULTS.md).

    ``benchmarks.run_roofline`` divides the measured wall time into these
    counts and names the achieved fraction of the bf16 peak."""
    passes = 6 if cfg.matmul_precision == "highest" else 1
    nb_curve = -(-cfg.n_steps // _MIX_BLOCK)
    nb_opt = -(-cfg.n_steps_s1 // _MIX_BLOCK)

    def tier(pairs_per_tile, weight_flops, nb):
        return {
            "pairs_per_tile": pairs_per_tile,
            "weight_flops_per_pair": weight_flops / pairs_per_tile,
            "mxu_flops_per_pair": weight_flops / pairs_per_tile,
            "normals_per_pair": nb * _MIX_BLOCK,
            "matmul_passes": passes,
        }

    # curve: path-major (TILE_FULL, 128) @ (128, PAD) per block
    return {
        "q1_fullstep": tier(
            TILE_FULL,
            2.0 * TILE_FULL * _MIX_BLOCK * PAD * nb_curve * passes,
            nb_curve),
        # options: transposed (8, 128) @ (128, TILE_FULL_OPT) per block
        "zbc_fullstep": tier(
            TILE_FULL_OPT,
            2.0 * 8 * _MIX_BLOCK * TILE_FULL_OPT * nb_opt * passes,
            nb_opt),
        "vega_fullstep": tier(
            TILE_FULL_OPT,
            2.0 * 8 * _MIX_BLOCK * TILE_FULL_OPT * nb_opt * passes,
            nb_opt),
    }
