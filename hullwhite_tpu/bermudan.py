"""Bermudan swaptions / coupon-bond options via two-pass Longstaff-Schwartz.

A multi-date extension of the exact functional engine: the state the policy
needs — (r(e_1), I(e_1), ..., r(e_k), I(e_k)) at the exercise dates — is
jointly Gaussian with covariance computable from the same shock shapes as
everything else, so Bermudan paths are sampled EXACTLY with 2k normals per
path (no time stepping, no discretization of the policy dates).

Pricing follows the standard regression method (cf. the regression-based
variance-reduction literature in PAPERS.md):

* backward induction over exercise dates, regressing the realized
  discounted continuation value on a polynomial basis in r(e_j) over
  in-the-money paths (ridge-regularized normal equations on device);
* TWO-PASS to remove foresight bias: the policy (regression coefficients)
  is estimated on one set of paths and the price evaluated on an
  independent set — the out-of-sample price is a true lower bound in
  expectation.

Sanity identities tested: one exercise date == European (Jamshidian);
more dates never cheapen the option; out-of-sample <= in-sample.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import HWConfig
from .models import hull_white as hw
from .models.hull_white import MarketCurve
from .instruments import CouponSchedule, _bond_value_terms
from .ops.engine_linear import _shock_shapes, det_trajectory
from . import pricing

BASIS_DEGREE = 3   # regression basis: [1, r, r^2, r^3]
RIDGE = 1e-9


def _step_index(cfg: HWConfig, t: float) -> int:
    n = int(round(t / cfg.dt))
    if abs(n * cfg.dt - t) > 1e-9 or not (0 < n <= cfg.n_steps):
        raise ValueError(f"exercise date {t} must sit on the step grid")
    return n


@lru_cache(maxsize=None)
def _joint_chol(cfg: HWConfig, ex_dates: tuple):
    """fp64 Cholesky^T of the (2k, 2k) covariance of
    (r(e_1), I(e_1), ..., r(e_k), I(e_k)) / sig_st, plus the deterministic
    means /1 (r_det, I_det) at each date."""
    k = len(ex_dates)
    U = np.zeros((cfg.n_steps, 2 * k))
    for j, t in enumerate(ex_dates):
        n = _step_index(cfg, t)
        u, w = _shock_shapes(cfg, n)
        U[:n, 2 * j] = np.asarray(u, np.float64)
        U[:n, 2 * j + 1] = np.asarray(w, np.float64)
    C = U.T @ U + RIDGE * np.eye(2 * k)
    L = np.linalg.cholesky(C)
    return np.asarray(L.T, np.float32)  # z = x @ L^T


def _det_states(cfg: HWConfig, tables, ex_dates: tuple):
    """(k,) deterministic r and I at the exercise dates (G = 0 scan)."""
    rs, Is = det_trajectory(cfg, tables)
    idx = jnp.asarray([_step_index(cfg, t) - 1 for t in ex_dates])
    return rs[idx], Is[idx]


def _basis(r, mu, sd):
    """(n, BASIS_DEGREE+1) polynomial design matrix.  ``mu``/``sd`` are the
    MODEL's mean and sd of r at the date (not batch statistics): the policy
    must be a fixed function of r, or the out-of-sample pass would apply a
    different, evaluation-set-dependent policy and lose the lower-bound
    guarantee."""
    r = (r - mu) / sd
    return jnp.stack([r ** p for p in range(BASIS_DEGREE + 1)], axis=1)


def _wls(X, y, w, prec):
    """Ridge-regularized weighted least squares on device (explicit matmul
    precision: the platform default is bf16-level)."""
    Xw = X * w[:, None]
    A = jnp.dot(X.T, Xw, precision=prec) + RIDGE * jnp.eye(
        X.shape[1], dtype=X.dtype)
    b = jnp.dot(Xw.T, y, precision=prec)
    return jnp.linalg.solve(A, b)


class BermudanResult(NamedTuple):
    price: jax.Array            # out-of-sample (policy-independent paths)
    price_in_sample: jax.Array  # in-sample (upward-biased)
    std_error: jax.Array        # out-of-sample SE
    n_paths: int
    exercise_dates: tuple


@lru_cache(maxsize=None)
def _bermudan_fn(cfg: HWConfig, ex_dates: tuple, sched: CouponSchedule,
                 strike: float, payer: bool, n_paths: int):
    k = len(ex_dates)
    LT = jnp.asarray(_joint_chol(cfg, ex_dates))

    def states(key, sigma, tables):
        """(r, I) at all exercise dates for n_paths paths: (n, k) each."""
        x = jax.random.normal(key, (n_paths, 2 * k), jnp.float32)
        z = tables.sig_st * jnp.dot(x, LT, preferred_element_type=jnp.float32,
                                    precision=cfg.matmul_precision)
        r_det, i_det = _det_states(cfg, tables, ex_dates)
        r = r_det[None, :] + z[:, 0::2]
        integral = i_det[None, :] + z[:, 1::2]
        return r, integral

    def payoff_at(j, r, sigma, market):
        """Exercise value at date e_j: option on the remaining cashflows
        (valuation shared with instruments._bond_value_terms)."""
        cA, B = _bond_value_terms(cfg, sigma, market, sched, t=ex_dates[j])
        V = jnp.sum(cA[None, :] * jnp.exp(-B[None, :] * r[:, None]), axis=1)
        intrinsic = (strike - V) if payer else (V - strike)
        return jnp.maximum(intrinsic, 0.0)

    def backward(r, integral, sigma, market, stats, betas=None):
        """LSMC backward induction.  betas=None: estimate the policy and
        return (price, betas); else apply the given frozen policy.
        ``stats`` are the model's (mu_j, sd_j) of r at each date."""
        prec = cfg.matmul_precision
        D = jnp.exp(-integral)                       # (n, k) discounts to 0
        cf = payoff_at(k - 1, r[:, k - 1], sigma, market) * D[:, k - 1]
        est = betas is None
        out_betas = [None] * max(k - 1, 0)
        for j in range(k - 2, -1, -1):
            pj = payoff_at(j, r[:, j], sigma, market)
            X = _basis(r[:, j], stats[0][j], stats[1][j])
            y = cf / D[:, j]                         # continuation at e_j
            itm = (pj > 0.0).astype(jnp.float32)
            if est:
                beta = _wls(X, y, itm, prec)
                out_betas[j] = beta
            else:
                beta = betas[j]
            cont = jnp.dot(X, beta, precision=prec)
            exercise = (pj > cont) & (pj > 0.0)
            cf = jnp.where(exercise, pj * D[:, j], cf)
        price = jnp.mean(cf)
        se = jnp.std(cf, ddof=1) / jnp.sqrt(1.0 * n_paths)
        return price, se, out_betas

    def compute(key, sigma, market):
        tables = hw.step_tables(cfg, sigma, cfg.sigma, jnp.float32)
        # model mean/sd of r(e_j): deterministic part + sig_st * ||u_j||
        r_det, _ = _det_states(cfg, tables, ex_dates)
        sds = tables.sig_st * jnp.asarray(
            [float(np.linalg.norm(_shock_shapes(cfg, _step_index(cfg, t))[0],
                                  ord=2)) for t in ex_dates], jnp.float32)
        stats = (r_det, sds)
        k_est, k_val = jax.random.split(key)
        r_a, i_a = states(k_est, sigma, tables)
        p_in, _, betas = backward(r_a, i_a, sigma, market, stats)
        r_b, i_b = states(k_val, sigma, tables)
        p_out, se, _ = backward(r_b, i_b, sigma, market, stats, betas=betas)
        return p_out, p_in, se

    return jax.jit(compute)


def price_bermudan(cfg: HWConfig, key, market: MarketCurve,
                   sched: CouponSchedule, exercise_dates: Sequence[float],
                   *, strike: float = 1.0, payer: bool = False, sigma=None,
                   n_paths: int | None = None) -> BermudanResult:
    """Two-pass LSMC Bermudan coupon-bond option / swaption price."""
    if sigma is None:
        sigma = cfg.sigma
    if n_paths is None:
        n_paths = cfg.n_paths
    ex = tuple(sorted(float(t) for t in exercise_dates))
    if not ex:
        raise ValueError("need at least one exercise date")
    if ex[-1] >= max(sched.times):
        raise ValueError("exercise dates must precede the last cashflow")
    # convention: exercising exactly on a payment date forfeits that
    # payment (the `alive` mask in payoff_at is strict), i.e. exercise
    # happens immediately after the coupon.
    p_out, p_in, se = _bermudan_fn(cfg, ex, sched, float(strike),
                                   bool(payer), int(n_paths))(
        key, jnp.asarray(sigma, jnp.float32), market)
    return BermudanResult(price=p_out, price_in_sample=p_in, std_error=se,
                          n_paths=int(n_paths), exercise_dates=ex)
